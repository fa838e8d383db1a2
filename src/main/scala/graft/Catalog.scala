package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine operator exercised as a query over the driver testdata.
  *
  * @param name   key in `SparkEntry.queries` (and `BENCH_r{N}.json`)
  * @param fn     Spark-side implementation, (session, sfDir) => result
  * @param oracle equivalent ANSI SQL for DuckDB over the same parquet tables;
  *               None for non-SQL-expressible ops (driver falls back to a
  *               rows-only check)
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Catalog {
  /** Column/row hash-compare requires identical names on both sides; every
    * computed column is aliased identically in the Spark code and the SQL.
    */
  def toQueries(qs: Seq[Q]): Map[String, (SparkSession, String) => DataFrame] =
    qs.map(q => q.name -> q.fn).toMap

  def toOracle(qs: Seq[Q]): Map[String, String] =
    qs.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
