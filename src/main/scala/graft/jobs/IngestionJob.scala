package graft.jobs

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

import graft.expr.Crypto
import graft.ops.{Flatten, Upsert}
import graft.schema.Schemas

/** Per-run metrics — same-named fields as the reference's metrics dict
  * (`/root/reference/ingestion/job.py:73-79`).
  */
final case class IngestMetrics(
    httpStatus: Int,
    retriesUsed: Int,
    rowsFetched: Long,
    rowsAfterDedup: Long,
    storePath: String)

/** The reference's one end-to-end "query", re-expressed Spark-first:
  * acquire → flatten → secure-transform → keep-first upsert → metrics
  * (`/root/reference/ingestion/job.py:18-97`).
  *
  * Source: the reference fetches 10 users/run from an HTTP API on the driver
  * (`api_client.py:15-27`). Zero-egress here, and 10 rows/run makes a
  * DataSource V2 pointless (SURVEY.md §2.1 S1) — the engine reads the canned
  * API-response fixture with the same pinned schema; a live deployment would
  * fetch on the driver and `spark.createDataset(json :: Nil)` through the
  * identical path.
  *
  * Store: parquet (typed, columnar, splittable) instead of the reference's
  * single CSV; written to a temp dir then swapped so a failed write never
  * truncates the store (the reference's full-file rewrite has the same
  * failure window, `io_utils.py:37`). At 100 TB the store is key-partitioned
  * and this becomes dynamic partition overwrite of touched partitions.
  */
object IngestionJob {

  /** `{"results": [user...]}` — the API response envelope (`api_client.py:25-26`). */
  private val responseSchema = StructType(Seq(
    StructField("results", ArrayType(Schemas.userSchema))))

  /** Read the canned API response, one row per user. `_fetch_pos` is the
    * position in the response array — the explicit stand-in for pandas'
    * positional row order, which keep-first dedup depends on (Spark rows
    * have no implicit order).
    */
  def readUsers(spark: SparkSession, fixturePath: String): DataFrame =
    spark.read.schema(responseSchema)
      .option("multiLine", true).json(fixturePath)
      .select(posexplode(col("results")).as(Seq("_fetch_pos", "user")))
      .select(col("_fetch_pos"), col("user.*"))

  /** Flatten + project + secure — mirrors `transformations.py:20-78`:
    * 11-column projection, 5 derived secure columns, 4 plaintext drops.
    * Timestamps parsed to TIMESTAMP (UTC) instead of carried as strings.
    */
  def secureTransform(users: DataFrame, pepper: String, aesKey: String,
      bidxKey: String, kdfIterations: Int = 25000): DataFrame = {
    val flat = Flatten.flatten(users)
    val passthrough =
      if (flat.columns.contains("_fetch_pos")) Seq(col("_fetch_pos")) else Nil
    flat.select(passthrough ++ Seq(
        col("login_uuid"),
        col("login_username"),
        col("name_first"),
        col("name_last"),
        to_timestamp(col("dob_date")).as("dob_date"),
        col("dob_age"),
        to_timestamp(col("registered_date")).as("registered_date"),
        col("location_country"),
        // derived secure columns (transformations.py:59-63); nondeterministic
        // ones are materialized before any dedup boundary (SURVEY.md §4.3)
        Crypto.hashPassword(col("login_password"), pepper, kdfIterations)
          .as("password_hash"),
        Crypto.encrypt(col("email"), aesKey).as("email_enc"),
        Crypto.encrypt(col("phone"), aesKey).as("phone_enc"),
        Crypto.encrypt(col("location_street_name"), aesKey).as("street_name_enc"),
        Crypto.blindIndex(col("email"), bidxKey).as("email_bidx")): _*)
      // plaintext PII never persisted (transformations.py:72-75): the
      // projection above simply omits login_password/email/phone/street_name
  }

  /** One ingestion run. Returns the reference's metrics. */
  def run(spark: SparkSession, fixturePath: String, storePath: String,
      pepper: String = "test-pepper",
      aesKey: String = "0123456789abcdef",
      bidxKey: String = "test-blind-index-key"): IngestMetrics = {

    val fetched = readUsers(spark, fixturePath)
    val secured = secureTransform(fetched, pepper, aesKey, bidxKey)
    val rowsFetched = fetched.count()

    val fs = new Path(storePath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val store = new Path(storePath)

    val persistedSchema = secured.drop("_fetch_pos").schema
    val existing =
      if (fs.exists(store)) spark.read.parquet(storePath)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], persistedSchema)

    // Keep-first semantics (io_utils.py:25,34): existing rows win (priority
    // tag inside keepFirst); within the new batch, first fetch position wins.
    val finalDf = Upsert.keepFirst(
      existing.withColumn("_fetch_pos", lit(-1)), secured,
      keys = Seq("login_uuid"), order = Seq(col("_fetch_pos")))
      .drop("_fetch_pos")

    val tmp = new Path(storePath + ".tmp")
    // batch-of-10-per-run regime (reference's workload): one output file
    // beats shuffle.partitions near-empty files. The partitioned store at
    // scale is Upsert.partitionedUpsert, not this path.
    finalDf.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val rowsAfterDedup = spark.read.parquet(tmp.toString).count()
    if (fs.exists(store)) fs.delete(store, true)
    fs.rename(tmp, store)

    IngestMetrics(httpStatus = 200, retriesUsed = 0,
      rowsFetched = rowsFetched, rowsAfterDedup = rowsAfterDedup,
      storePath = storePath)
  }
}
