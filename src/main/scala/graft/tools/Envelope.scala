package graft.tools

import java.nio.file.{Files, Paths}
import com.fasterxml.jackson.databind.ObjectMapper

/** Per-query noise-envelope builder (round 18, VERDICT r17 #4).
  *
  * Two rounds running, a single elevated per-query reading on an
  * otherwise-clean driver run (q133 in r16, q22 in r17) cost a full
  * manual triage item because "host envelope" was prose — the judge had
  * to decide from narrative whether 1.6-2.0× on one untouched query was
  * host variance or a regression. This tool makes the envelope DATA:
  *
  *   runMain graft.tools.Envelope BENCH_DETAIL.json [more-details...]
  *
  * merges the per-query timings of every RECORDING-ELIGIBLE
  * BENCH_DETAIL-format file given (ineligible runs are skipped with a
  * note — a contended run's readings must not widen the envelope) into
  * the committed `ENVELOPE.json`, extending any existing envelope
  * min/max per query. [[graft.Bench]] reads the artifact at the end of
  * every run and emits `outside_envelope` flags mechanically: a reading
  * above `max × 1.3 + 0.3 s` of its own envelope (the multiplicative
  * band absorbs proportional host jitter, the absolute term keeps
  * sub-second queries from flagging on scheduler noise). The round
  * report then triages exactly the flagged set instead of eyeballing
  * 230 numbers against prose.
  *
  * The envelope is a HOST artifact, not an engine one: re-derive from
  * scratch if the host changes (same protocol as the Bench calibration
  * floors).
  */
object Envelope {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: Envelope <BENCH_DETAIL-format json> [more...]")
    val m = new ObjectMapper()
    val out = Paths.get("ENVELOPE.json")
    // (query -> (min, max, n_readings)) accumulated across sources
    val acc = scala.collection.mutable.Map.empty[String, (Double, Double, Int)]
    var sources = List.empty[String]
    if (Files.exists(out)) {
      val prev = m.readTree(Files.readString(out))
      prev.get("queries").properties().forEach { e =>
        acc(e.getKey) = (e.getValue.get("min").asDouble(),
          e.getValue.get("max").asDouble(), e.getValue.get("n").asInt())
      }
      prev.get("sources").forEach(s => sources ::= s.asText())
      println(s"extending existing envelope (${acc.size} queries, " +
        s"${sources.size} sources)")
    }
    args.foreach { path =>
      val root = m.readTree(Files.readString(Paths.get(path)))
      val eligible = Option(root.get("recording_eligible"))
        .exists(_.asBoolean(false))
      if (!eligible)
        println(s"SKIP $path: not recording_eligible — a contended run's " +
          "readings must not widen the envelope")
      else if (root.get("sf").asText() != "/root/testdata/sf0.1")
        println(s"SKIP $path: sf ${root.get("sf").asText()} — the envelope " +
          "is per-SF data and covers the driver's sf0.1 config only")
      // idempotent merge identity = BASENAME@total (round 18 review:
      // keying on the verbatim argument path let `./BENCH_DETAIL.json`
      // re-merge a file recorded as `BENCH_DETAIL.json`; the basename
      // matches the entries already committed, and the ns-precision
      // total disambiguates distinct runs sharing a filename)
      else if (sources.contains(
          s"${Paths.get(path).getFileName}@${root.get("value").asDouble()}s"))
        // re-running the tool on an unchanged detail file must not
        // double-count n or duplicate the source entry — the per-query
        // reading counts are the evidence the adjudication protocol
        // cites for how many independent runs back the envelope
        println(s"SKIP $path: already merged " +
          s"(source ${root.get("value").asDouble()}s on record)")
      else {
        root.get("queries").properties().forEach { e =>
          val t = e.getValue.asDouble()
          if (t >= 0) acc.get(e.getKey) match {
            case Some((lo, hi, n)) =>
              acc(e.getKey) = (math.min(lo, t), math.max(hi, t), n + 1)
            case None => acc(e.getKey) = (t, t, 1)
          }
        }
        sources ::=
          s"${Paths.get(path).getFileName}@${root.get("value").asDouble()}s"
        println(s"merged $path (${root.get("n_queries").asInt()} queries, " +
          s"total ${root.get("value").asDouble()}s)")
      }
    }
    val qjson = acc.toSeq.sortBy(_._1).map { case (k, (lo, hi, n)) =>
      s""""$k":{"min":$lo,"max":$hi,"n":$n}"""
    }.mkString("{", ",\n ", "}")
    val srcJson = sources.reverse.map(s => "\"" + s + "\"")
      .mkString("[", ",", "]")
    Files.writeString(out,
      s"""{"note":"per-query eligible-run envelope; flag bar = max*1.3+0.3s (see graft.tools.Envelope)","sf":"/root/testdata/sf0.1","sources":$srcJson,\n"queries":$qjson}\n""")
    println(s"ENVELOPE.json written: ${acc.size} queries, " +
      s"${sources.size} sources")
  }
}
