package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity of two float/double vectors in ONE native pass (dot +
  * both norms accumulated together) instead of three interpreted
  * higher-order folds. Each accumulator is a sequential left fold in index
  * order over doubles — bit-identical to `functions.cosineSim`
  * (aggregate∘zip_with) and to the DuckDB oracle's
  * `list_sum(list_transform(...)) / (sqrt(..)*sqrt(..))`, so swapping it
  * into an oracle-gated query cannot move a single ulp.
  */
case class VecCosine(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = DoubleType
  private def ok(dt: DataType) = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_cosine requires two array<float|double> columns, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  private def isFloat(dt: DataType) = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private lazy val lf = isFloat(left.dataType)
  private lazy val rf = isFloat(right.dataType)

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
