package graft

import graft.ops.Flatten
import org.apache.spark.sql.functions._

class FlattenSpec extends SparkSpec {
  import spark.implicits._

  test("depth-3 struct flattens to underscore-joined leaf columns") {
    val df = Seq((1, ("ada", (100.0, "A")))).toDF("id", "p")
      .select(col("id"), struct(
        col("p._1").as("name"),
        struct(col("p._2._1").as("bal"),
          col("p._2._2").as("seg")).as("acct")).as("profile"))
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq ==
      Seq("id", "profile_name", "profile_acct_bal", "profile_acct_seg"))
    assert(flat.head() == org.apache.spark.sql.Row(1, "ada", 100.0, "A"))
  }

  test("non-struct columns (incl. arrays) pass through untouched") {
    val df = Seq((1, Seq(1, 2), ("x", 2L))).toDF("id", "arr", "s")
    val flat = Flatten.flatten(df)
    assert(flat.columns.toSeq == Seq("id", "arr", "s__1", "s__2"))
    assert(flat.select("arr").head().getSeq[Int](0) == Seq(1, 2))
  }

  test("dot-named compat view reproduces json_normalize's literal-dot " +
      "column names (SURVEY §1.4)") {
    val df = Seq((1, ("ada", (100.0, "A")))).toDF("id", "p")
      .select(col("id"), struct(
        col("p._1").as("name"),
        struct(col("p._2._1").as("bal"),
          col("p._2._2").as("seg")).as("acct")).as("profile"))
    val flat = Flatten.flattenDotNamed(df)
    assert(flat.columns.toSeq ==
      Seq("id", "profile.name", "profile.acct.bal", "profile.acct.seg"))
    // the dots are literal name characters: backtick-quoted access works
    assert(flat.select(col("`profile.acct.bal`")).head().getDouble(0) == 100.0)
  }

  test("flatten is a single Project over the scan (no extra nodes)") {
    val df = Seq((1, ("a", "b"))).toDF("id", "s")
    val plan = Flatten.flatten(df).queryExecution.optimizedPlan
    // optimized plan: Project over LocalRelation only
    assert(plan.collect { case p => p }.length <= 2)
  }
}
