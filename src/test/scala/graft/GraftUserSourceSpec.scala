package graft

import graft.jobs.IngestionJob
import graft.ops.Flatten
import org.apache.spark.sql.functions._

class GraftUserSourceSpec extends SparkSpec {

  private def users(n: Int, parts: Int) =
    spark.read.format("graft-users")
      .option("numUsers", n).option("numPartitions", parts).load()

  test("generates exactly numUsers rows across numPartitions partitions") {
    val df = users(1000, 8)
    assert(df.count() == 1000)
    assert(df.rdd.getNumPartitions == 8)
  }

  test("rows are deterministic and keys unique") {
    val a = users(500, 4).select("login.uuid")
    val b = users(500, 4).select("login.uuid")
    assert(a.distinct().count() == 500)
    assert(a.except(b).count() == 0)
  }

  test("column pruning reaches the source (only email materialized)") {
    val df = users(100, 2).select("email")
    // V2 BatchScan prints its (pruned) output attribute list inline
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("BatchScan graft_users(100)[email#"), scan)
    assert(df.head().getString(0) == "user0@example.com")
  }

  test("generated users flow through the full secure-ingestion transform") {
    val secured = IngestionJob.secureTransform(
      users(200, 4), "pepper", "0123456789abcdef", "bidx-key")
    assert(secured.count() == 200)
    val row = secured.filter(col("login_uuid")
      .endsWith("000000000042")).head()
    assert(row.getAs[String]("email_bidx").length == 64)
    // plaintext columns are gone
    assert(!secured.columns.contains("email") &&
      !secured.columns.contains("login_password"))
  }

  test("nested flatten of generated rows matches the generator's formulas") {
    val flat = Flatten.flatten(users(10, 1))
      .select("login_uuid", "name_first", "location_country")
    val r = flat.orderBy("login_uuid").head()
    assert(r.getString(0) == "00000000-0000-4000-8000-000000000000")
    assert(r.getString(1) == "ada")
    assert(r.getString(2) == "United Kingdom")
  }
}
