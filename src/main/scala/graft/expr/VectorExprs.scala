package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.sqrt
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Vector math as native codegen'd Catalyst expressions.
  *
  * Why not higher-order functions: `aggregate(zip_with(a, b, *), …)` runs
  * an interpreted lambda per ELEMENT and allocates an intermediate array
  * per ROW — ~6 µs/pair for dim-64 at sf0.1. The generated tight loop below
  * reads primitive slots off ArrayData directly (no allocation, no lambda
  * dispatch) — the difference is the whole budget of an O(n²) similarity
  * scan. Semantics match `aggregate(zip_with(transform(a, cast double),
  * transform(b, cast double), *), 0D, +)` bit-for-bit: each element is
  * widened to double BEFORE multiply, accumulation in array order.
  */
case class ArrayDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_array_dot"

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> inputs, got " +
        s"${left.dataType.sql} / ${right.dataType.sql}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.$lGet($i) * (double) $b.$rGet($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Product-quantization encoder: one embedding → `m` codebook-entry ids in
  * a single tight loop. Per subspace `mm`, code = argmin_j |x_mm − c_mmj|²
  * = argmax_j (2·x_mm·c_mmj − |c_mmj|²); ties break to the LARGER j (the
  * contract of the struct-max formulation this replaces).
  *
  * Why an expression and not composed column math: the m·k per-entry
  * scores as flat projection columns get re-collapsed by CollapseProject
  * into one giant projection that overflows the codegen thresholds and
  * falls back interpreted (measured 2× slower than even interpreted
  * zip_with lambdas). Here the codebooks ride along as a reference object
  * and the whole encode is one generated loop nest — no intermediate
  * arrays, no lambda dispatch, never leaves whole-stage codegen.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  private val m = codebooks.size
  private val k = codebooks.head.size
  private val subDim = codebooks.head.head.size
  // [mm][j][i] flattened at (mm·k + j)·subDim + i
  private lazy val flat: Array[Double] =
    codebooks.flatten.flatten.toArray
  private lazy val norms2: Array[Double] =
    codebooks.flatMap(_.map(_.map(x => x * x).sum)).toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_pq_encode"

  private def elemIsFloat: Boolean = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      if (codebooks.nonEmpty && codebooks.forall(cb =>
        cb.size == k && cb.forall(_.size == subDim)))
        TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(s"$prettyName: ragged codebooks")
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<float|double> input, got ${t.sql}")
  }

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val isF = elemIsFloat
    val codes = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestS = Double.NegativeInfinity
      var j = 0
      while (j < k) {
        var s = 0.0
        val base = (mm * k + j) * subDim
        var i = 0
        while (i < subDim) {
          val xv = if (isF) x.getFloat(mm * subDim + i).toDouble
                   else x.getDouble(mm * subDim + i)
          s += xv * flat(base + i)
          i += 1
        }
        val score = 2.0 * s - norms2(mm * k + j)
        if (score >= bestS) { bestS = score; best = j }
        j += 1
      }
      codes(mm) = best
      mm += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (elemIsFloat) "getFloat" else "getDouble"
    val flatRef = ctx.addReferenceObj("pqFlat", flat, "double[]")
    val normRef = ctx.addReferenceObj("pqNorms", norms2, "double[]")
    nullSafeCodeGen(ctx, ev, x => {
      val codes = ctx.freshName("codes")
      val mm = ctx.freshName("mm")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val best = ctx.freshName("best")
      val bestS = ctx.freshName("bestS")
      val s = ctx.freshName("s")
      val base = ctx.freshName("base")
      val score = ctx.freshName("score")
      s"""
         |int[] $codes = new int[$m];
         |for (int $mm = 0; $mm < $m; $mm++) {
         |  int $best = 0;
         |  double $bestS = Double.NEGATIVE_INFINITY;
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $s = 0.0;
         |    int $base = ($mm * $k + $j) * $subDim;
         |    for (int $i = 0; $i < $subDim; $i++) {
         |      $s += (double) $x.$get($mm * $subDim + $i) * $flatRef[$base + $i];
         |    }
         |    double $score = 2.0 * $s - $normRef[$mm * $k + $j];
         |    if ($score >= $bestS) { $bestS = $score; $best = $j; }
         |  }
         |  $codes[$mm] = $best;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object VectorExprs {
  /** dot(a, b) over array<float|double>, computed in double. */
  def dotFast(a: Column, b: Column): Column =
    ColumnShim.column(
      ArrayDotProduct(ColumnShim.expression(a), ColumnShim.expression(b)))

  def l2Norm(a: Column): Column = sqrt(dotFast(a, a))

  /** PQ-encode an embedding into its m codebook-entry ids. */
  def pqEncode(emb: Column, codebooks: Seq[Seq[Seq[Double]]]): Column =
    ColumnShim.column(PqEncode(ColumnShim.expression(emb), codebooks))
}
