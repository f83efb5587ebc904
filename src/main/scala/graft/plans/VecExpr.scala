package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Shared element-getter / fold loop generation for the vector
  * expressions: a single whole-stage-codegen'd primitive loop over the two
  * `ArrayData` operands — no per-element virtual dispatch, no boxing, and
  * the expression stays inside the enclosing WholeStageCodegen span (a
  * `CodegenFallback` here costs ~10 ns/element in the 10⁸-pair candidate
  * stages of the k-NN join).
  */
private[plans] trait VecBinaryOp extends BinaryExpression {
  override def dataType: DataType = DoubleType

  protected def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float|double> columns, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  protected def isFloat(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  protected lazy val lf: Boolean = isFloat(left.dataType)
  protected lazy val rf: Boolean = isFloat(right.dataType)

  protected def getJava(arr: String, idx: String, float: Boolean): String =
    if (float) s"(double) $arr.getFloat($idx)" else s"$arr.getDouble($idx)"
}

/** Cosine similarity of two float/double vectors in ONE native pass (dot +
  * both norms accumulated together) instead of three interpreted
  * higher-order folds. Each accumulator is a sequential left fold in index
  * order over doubles — bit-identical to `functions.cosineSim`
  * (aggregate∘zip_with) and to the DuckDB oracle's
  * `list_sum(list_transform(...)) / (sqrt(..)*sqrt(..))`, so swapping it
  * into an oracle-gated query cannot move a single ulp. Fully codegen'd:
  * the generated loop reads primitives straight off `ArrayData`.
  */
case class VecCosine(left: Expression, right: Expression) extends VecBinaryOp {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y; aa += x * x; bb += y * y
      }
      i += 1
    }
    java.lang.Double.valueOf(dot / (math.sqrt(aa) * math.sqrt(bb)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val aa = ctx.freshName("aa")
      val bb = ctx.freshName("bb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0; double $aa = 0.0; double $bb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
        |    final double $x = ${getJava(a, i, lf)};
        |    final double $y = ${getJava(b, i, rf)};
        |    $dot += $x * $y; $aa += $x * $x; $bb += $y * $y;
        |  }
        |}
        |${ev.value} = $dot / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecCosine =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_cosine"
}

object VecCosine {
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_cosine", a, b)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_cosine", exprs => VecCosine(exprs.head, exprs(1)), "built-in")
}

/** Dot product of two float/double vectors — the building block for the
  * norm-precomputed cosine decomposition: `cos = vec_dot(a,b) /
  * (sqrt(vec_dot(a,a)) * sqrt(vec_dot(b,b)))` is bit-identical to
  * [[VecCosine]] on equal-length null-free vectors (every accumulator is
  * the same sequential index-order double fold), but lets a join pay ONE
  * multiply-add per element per PAIR while the norms are computed once per
  * ROW. At Q·n candidate pairs that is a 3× FLOP cut on the hot stage.
  * (On ragged or null-holed vectors the decomposition differs from the
  * one-pass form, which skips BOTH sides' norm terms at a hole — keep
  * [[VecCosine]] there.)
  */
case class VecDot(left: Expression, right: Expression) extends VecBinaryOp {

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i)) {
        val x = if (lf) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rf) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
      }
      i += 1
    }
    java.lang.Double.valueOf(dot)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      s"""
        |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
        |    $dot += ${getJava(a, i, lf)} * ${getJava(b, i, rf)};
        |  }
        |}
        |${ev.value} = $dot;
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "vec_dot"
}

object VecDot {
  def dot(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("vec_dot", a, b)

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs.head, exprs(1)), "built-in")
}
