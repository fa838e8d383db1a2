package graft

import java.nio.file.{Files, Paths}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

import graft.jobs.OpsRunner
import org.scalatest.funsuite.AnyFunSuite

/** The ops shell's three behaviors (SURVEY §2.10 O6, reference
  * `run_ingestion_with_metrics.sh`): daily log capture, mkdir-mutex run
  * exclusion, and run-id/duration/status metric lines. Pure JVM — no
  * Spark session needed.
  */
class OpsRunnerSpec extends AnyFunSuite {

  private def readLog(base: java.nio.file.Path): String =
    new String(Files.readAllBytes(OpsRunner.logFile(base)))

  test("a successful run logs the banner, run metrics and SUCCESS status") {
    val base = Files.createTempDirectory("graft_ops")
    val rc = OpsRunner.withRun(base, "ingestion.job")(() => 0)
    assert(rc === 0)
    val log = readLog(base)
    assert(log.contains("==== RUN START "))
    assert(log.contains("Run_id="))
    assert(log.contains("Job=ingestion.job"))
    assert(log.contains("Host="))
    assert(log.contains("Status=SUCCESS"))
    assert(log.contains("Duration_sec="))
    assert(log.contains("==== RUN END   "))
    assert(!log.contains("Exit_code=")) // success path omits it (shell :118)
  }

  test("a failing job logs FAILURE + Exit_code; a throwing job exits 1") {
    val base = Files.createTempDirectory("graft_ops")
    assert(OpsRunner.withRun(base, "j")(() => 3) === 3)
    val log1 = readLog(base)
    assert(log1.contains("Status=FAILURE") && log1.contains("Exit_code=3"))

    assert(OpsRunner.withRun(base, "j")(
      () => throw new RuntimeException("boom")) === 1)
    val log2 = readLog(base)
    assert(log2.contains("Error=boom") && log2.contains("Exit_code=1"))
    // both runs appended to the SAME daily log
    assert(log2.indexOf("==== RUN END") < log2.lastIndexOf("==== RUN END"))
  }

  test("the mkdir mutex skips an overlapping run (exit 0) and releases") {
    val base = Files.createTempDirectory("graft_ops")
    val inJob = new CountDownLatch(1)
    val release = new CountDownLatch(1)
    val pool = Executors.newSingleThreadExecutor()
    val first = pool.submit(new java.util.concurrent.Callable[Int] {
      def call(): Int = OpsRunner.withRun(base, "j") { () =>
        inJob.countDown()
        release.await(30, TimeUnit.SECONDS)
        0
      }
    })
    assert(inJob.await(30, TimeUnit.SECONDS))
    // lock is held by the in-flight run: second instance exits 0, runs nothing
    var secondRan = false
    assert(OpsRunner.withRun(base, "j") { () => secondRan = true; 0 } === 0)
    assert(!secondRan)
    assert(!readLog(base).contains("Status=")) // first run still in flight
    release.countDown()
    assert(first.get(30, TimeUnit.SECONDS) === 0)
    pool.shutdown()
    // lock released on exit (trap EXIT): a new run proceeds
    assert(!Files.exists(base.resolve(".run_lock")))
    var thirdRan = false
    assert(OpsRunner.withRun(base, "j") { () => thirdRan = true; 0 } === 0)
    assert(thirdRan)
  }

  test("the lock is released even when the job throws") {
    val base = Files.createTempDirectory("graft_ops")
    OpsRunner.withRun(base, "j")(() => throw new RuntimeException("x"))
    assert(!Files.exists(base.resolve(".run_lock")))
  }
}
