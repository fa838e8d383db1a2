package graft.ops

/** Per-run scratch directories for queries that demonstrate a WRITTEN
  * artifact (roundtrip stores, z-order layouts, MV stores, version
  * stores). Two requirements meet here (ADVICE r10 #1 + r11 #3):
  *  - per-run UNIQUE paths — fixed java.io.tmpdir names let two
  *    concurrent sessions (bench + verify) clobber each other's stores;
  *  - JVM-exit deletion — uniqueness without cleanup trades the clobber
  *    hazard for unbounded /tmp growth on a long-lived host: every
  *    bench/correctness repetition would otherwise leak a full
  *    partitioned table copy per query run (the hazard
  *    StreamingOps.cleanedAtExit already guards its state dirs against;
  *    this is the batch-side twin).
  * Deletion cannot be eager: the query functions RETURN lazy DataFrames
  * that re-read the scratch store at action time, so the dir must
  * outlive the function call — JVM exit is the earliest safe point a
  * library-level helper can know.
  */
object TempDirs {
  def scratch(prefix: String): String = {
    val p = java.nio.file.Files.createTempDirectory(prefix)
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      try org.apache.commons.io.FileUtils.deleteDirectory(p.toFile)
      catch { case _: Throwable => () }))
    p.toString
  }
}
