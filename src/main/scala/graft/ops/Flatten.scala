package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StructField, StructType}

/** Recursive nested-struct flatten — the engine generalization of the
  * reference's `pd.json_normalize`
  * (`/root/reference/ingestion/transformations.py:25`), which produces
  * dot-joined flat column names from arbitrarily nested JSON.
  *
  * Differences by design (SURVEY.md §1.4, §7.4.3): we keep data nested
  * through the plan and flatten only at the edge via a single `select`
  * (one Project node — Catalyst prunes unused nested fields into the parquet
  * scan), and canonical names join with underscores, not literal dots
  * (dot-named columns need backtick quoting everywhere downstream).
  *
  * Arrays are left as-is (flattening them is `explode`'s job and changes
  * cardinality; json_normalize does the same — it leaves lists embedded).
  */
object Flatten {

  /** Flatten every nested struct column into `parent_child_leaf` columns;
    * non-struct columns keep their name. One Project node total.
    */
  def flatten(df: DataFrame): DataFrame =
    df.select(flattenCols(df.schema): _*)

  private def flattenCols(schema: StructType, sep: String): Seq[Column] = {
    def walk(field: StructField, path: Seq[String]): Seq[Column] =
      field.dataType match {
        case st: StructType =>
          st.fields.toSeq.flatMap(f => walk(f, path :+ f.name))
        case _ =>
          // Path segments backtick-quoted so a literal dot in a source
          // column name (reference-CSV compat) does not parse as a path.
          Seq(col(path.map(p => s"`$p`").mkString("."))
            .as(path.mkString(sep)))
      }
    schema.fields.toSeq.flatMap(f => walk(f, Seq(f.name)))
  }

  private def flattenCols(schema: StructType): Seq[Column] =
    flattenCols(schema, "_")

  /** Compat view (SURVEY.md §1.4): the reference's EXACT `json_normalize`
    * column names — dot-joined, the dots LITERAL characters in the name
    * (`name.first`, `location.street.number`). For byte-compatible exports
    * to consumers of the reference's CSV; downstream references need
    * backtick quoting, which is why [[flatten]]'s underscore canon is the
    * engine default.
    */
  def flattenDotNamed(df: DataFrame): DataFrame =
    df.select(flattenCols(df.schema, "."): _*)
}
