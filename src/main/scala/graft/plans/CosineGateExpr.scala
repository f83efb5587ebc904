package graft.plans

import java.math.BigInteger

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, DecimalType, LongType}

/** Exact sqrt-free cosine threshold gate: true iff
  * `dot / sqrt(na * nb) >= tNum / tDen`, evaluated as
  * `dot² · tDen² >= na · nb · tNum²` in ARBITRARY-PRECISION integer
  * arithmetic. The column-DSL twin (`dot*dot*25 >= na*nb*16` on
  * DECIMAL(38,0)) silently yields NULL — dropping the pair — once dot
  * exceeds ~10^18 and the product leaves 38-digit precision, a latent
  * cross-engine divergence on 100 TB-scale corpora where TF·IDF dot
  * products grow with corpus size. BigInteger products cannot overflow,
  * so the gate is exact at ANY magnitude; inputs stay DECIMAL(38,0)
  * (they are sums, not products, and overflow far later — norm overflow
  * still surfaces as NULL≠silent-false via the null gate below).
  *
  * Assumes dot >= 0 (callers filter `dot > 0` first); na, nb are sums of
  * squares so they are non-negative by construction.
  */
case class CosineGate(dot: Expression, na: Expression, nb: Expression,
    tNum: Int, tDen: Int)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = dot
  override def second: Expression = na
  override def third: Expression = nb
  override def dataType: DataType = BooleanType

  private def ok(dt: DataType) = dt match {
    case _: DecimalType | LongType => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(dot, na, nb).forall(e => ok(e.dataType)))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_gate requires decimal or bigint inputs, got " +
        s"${dot.dataType.catalogString}, ${na.dataType.catalogString}, " +
        s"${nb.dataType.catalogString}")

  private def big(v: Any): BigInteger = v match {
    case d: org.apache.spark.sql.types.Decimal =>
      d.toJavaBigDecimal.toBigIntegerExact
    case l: java.lang.Long => BigInteger.valueOf(l.longValue)
    case l: Long => BigInteger.valueOf(l)
  }

  private lazy val num2 = BigInteger.valueOf(tNum.toLong * tNum)
  private lazy val den2 = BigInteger.valueOf(tDen.toLong * tDen)

  override def nullSafeEval(d: Any, a: Any, b: Any): Any = {
    val dd = big(d)
    java.lang.Boolean.valueOf(
      dd.multiply(dd).multiply(den2)
        .compareTo(big(a).multiply(big(b)).multiply(num2)) >= 0)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): CosineGate =
    copy(dot = newFirst, na = newSecond, nb = newThird)
  override def prettyName: String = "cosine_gate"
}

object CosineGate {
  /** Register `cosine_gate_{tNum}_{tDen}(dot, na, nb)`; the name carries
    * the threshold so registrations never clobber each other.
    */
  def register(spark: SparkSession, tNum: Int, tDen: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"cosine_gate_${tNum}_$tDen",
      exprs => CosineGate(exprs.head, exprs(1), exprs(2), tNum, tDen),
      "built-in")

  def gate(tNum: Int, tDen: Int, dot: Column, na: Column, nb: Column): Column =
    org.apache.spark.sql.functions.call_function(
      s"cosine_gate_${tNum}_$tDen", dot, na, nb)
}
