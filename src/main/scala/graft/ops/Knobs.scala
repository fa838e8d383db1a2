package graft.ops

/** Measurement-only env knob parsing, shared by the gate defaults
  * ([[GraphOps.BroadcastGateNodesDefault]],
  * [[PipelineOps.DriverGateEdgesDefault]]).
  *
  * Parsed per CALL (the gate defaults are `def`s), never in an object
  * initializer: a malformed value (`1e6`, `1_000_000`, the empty string
  * a shell typo like `SPARK_GRAFT_PR_GATE= sbt ...` exports) must fail
  * the touching query with a message naming the variable — parsed in a
  * `val`, the NumberFormatException surfaced as an
  * ExceptionInInitializerError and every later graph-family query in
  * the JVM died with a root-cause-free NoClassDefFoundError (a full
  * bench run recorded 20+ cryptic errors for one typo). */
private[ops] object Knobs {
  def envLong(name: String, default: Long): Long =
    sys.env.get(name) match {
      case None => default
      case Some(s) =>
        try s.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$name must be a whole number (base-10 Long), got '$s' — " +
              "it is a measurement-only gate override; unset it for " +
              "production posture")
        }
    }
}
