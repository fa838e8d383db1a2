package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import graft.Q
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Structured Streaming pillars (SURVEY.md §2.8): the reference's
  * cron-triggered batch-of-10 ingestion IS manual micro-batching
  * (`/root/reference/api_server.py:18-26`,
  * `run_ingestion_with_metrics.sh:100`), and its cross-run dedup by key
  * (`io_utils.py:34`) is stateful `dropDuplicates`. Re-expressed natively:
  * file source → `Trigger.AvailableNow` (process everything, then stop —
  * batch-verifiable) → stateful operators with watermarks bounding state.
  *
  * State contract at 100 TB (SURVEY.md §7.4.6): unbounded dedup state is a
  * leak — `withWatermark` + event-time key retention caps it; the watermark
  * also finalizes windows for append-mode sinks. Checkpoint dir = the
  * single-writer lock (the reference's mkdir mutex, shell script `:59-63`).
  */
object StreamingOps {

  private val runSeq = new AtomicInteger(0)

  /** Run a streaming transform of the events table to completion
    * (AvailableNow) into a memory sink and return the result table. */
  private def runToMemory(s: SparkSession, d: String,
      outputMode: String)(transform: DataFrame => DataFrame): DataFrame = {
    val name = s"graft_stream_${runSeq.incrementAndGet()}"
    val ckpt = java.nio.file.Files
      .createTempDirectory(s"graft_ckpt_$name").toString
    // ts is parquet TIMESTAMP(NANOS): stream the raw INT64 nanos and
    // convert via integer division (see Schemas.Tables.events)
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The file stream source requires a directory path: stream the sf dir
    // with a glob filter selecting only the events table.
    val schema = s.read.parquet(s"$d/events.parquet").schema
    val stream = s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val q = transform(stream).writeStream
      .format("memory").queryName(name)
      .outputMode(outputMode)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name)
  }

  val catalog: Seq[Q] = Seq(

    // ---- stateful streaming dedup with watermark: distinct (user_id,
    // event_type) pairs; oracle = batch DISTINCT count (AvailableNow
    // processes all data before the watermark advances, so no row is
    // dropped as late and stream ≡ batch)
    Q("q60_stream_dedup",
      (s, d) => {
        val deduped = runToMemory(s, d, "append")(df =>
          df.withWatermark("ts", "1 hour")
            .dropDuplicates("user_id", "event_type"))
        deduped.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_distinct_users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
              FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- streaming event-time tumbling window aggregation (complete mode
    // emits every window); oracle = the equivalent batch day-grain agg
    Q("q61_stream_window_agg",
      (s, d) => {
        val agg = runToMemory(s, d, "complete")(df =>
          df.withWatermark("ts", "1 hour")
            .groupBy(window(col("ts"), "1 day").as("w"), col("event_type"))
            .agg(count(lit(1)).as("n_events"),
              round(sum(col("value")), 2).as("sum_value")))
        agg.select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
          col("event_type"), col("n_events"), col("sum_value"))
          .orderBy(col("day"), col("event_type"))
      },
      Some("""SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
              event_type,
              count(*) AS n_events, round(sum(value), 2) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY day, event_type""")),

    // ---- arbitrary stateful processing (mapGroupsWithState): per-user
    // running profile kept as explicit state — the custom-state primitive
    // the reference's cross-run metrics accumulation would map onto.
    // AvailableNow processes everything, so final state ≡ batch aggregate,
    // which the oracle states directly.
    Q("q62_stream_stateful",
      (s, d) => {
        import s.implicits._
        val out = runToMemory(s, d, "update") { df =>
          df.select(col("user_id").as[Long], col("value").as[Double])
            .as[(Long, Double)]
            .groupByKey(_._1)
            .mapGroupsWithState[UserState, (Long, Long, Double)](
              org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
              case (uid, rows, state) =>
                val prev = state.getOption.getOrElse(UserState(0L, 0.0))
                var n = prev.n; var sum = prev.sum
                rows.foreach { r => n += 1; sum += r._2 }
                state.update(UserState(n, sum))
                (uid, n, sum)
            }.toDF("user_id", "n_events", "sum_value")
        }
        // update mode emits one row per user per batch; AvailableNow may
        // split the input into several batches — keep the LAST emitted
        // state per user (n_events is monotone)
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("n_events").desc)
        out.withColumn("_rn", row_number().over(w))
          .filter(col("_rn") === 1)
          .select(col("user_id"), col("n_events"),
            round(col("sum_value"), 2).as("sum_value"))
          .orderBy(col("user_id"))
      },
      Some("""SELECT user_id, count(*) AS n_events,
              round(sum(value), 2) AS sum_value
              FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- streaming upsert into a parquet store via foreachBatch: each
    // micro-batch dedups itself, anti-joins the store, APPENDS only novel
    // keys — the streaming twin of Upsert.insertIfAbsent (append-only, so
    // no read-while-overwrite window; idempotent against replays because
    // replayed keys anti-join away). Store afterwards holds exactly the
    // distinct (user_id, event_type) pairs — the oracle states that count.
    Q("q63_stream_upsert",
      (s, d) => {
        val store = s"${System.getProperty("java.io.tmpdir")}/graft_stream_store"
        val storePath = new org.apache.hadoop.fs.Path(store)
        val fs = storePath.getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.delete(storePath, true)
        val ckpt = java.nio.file.Files
          .createTempDirectory("graft_ckpt_upsert").toString
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        val schema = s.read.parquet(s"$d/events.parquet").schema
        val q = s.readStream.schema(schema)
          .option("pathGlobFilter", "events.parquet").parquet(d)
          .select(col("user_id"), col("event_type"))
          .writeStream
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val incoming = batch.dropDuplicates("user_id", "event_type")
            val novel =
              if (!fs.exists(storePath)) incoming
              else incoming.join(batch.sparkSession.read.parquet(store),
                Seq("user_id", "event_type"), "left_anti")
            novel.coalesce(1).write.mode("append").parquet(store)
            ()
          }
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.awaitTermination()
        s.read.parquet(store)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_distinct_users"))
          .orderBy(col("event_type"))
      },
      Some("""SELECT event_type, count(DISTINCT user_id) AS n_distinct_users
              FROM events GROUP BY event_type ORDER BY event_type"""))
  )
}

/** Explicit per-user state carried across micro-batches. */
final case class UserState(n: Long, sum: Double)
