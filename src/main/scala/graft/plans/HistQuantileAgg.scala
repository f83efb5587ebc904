package graft.plans

import java.nio.ByteBuffer
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Mergeable bounded-range histogram quantile sketch: `bins` equi-width
  * counters over [lo, hi) (values clamped to the edge bins), merge =
  * elementwise add — so partial sketches combine map-side and the
  * estimate is IDENTICAL under any partitioning. The quantile estimate
  * interpolates within the holding bin; absolute error is bounded by one
  * bin width, which is the contract the oracle gates (vs the exact
  * quantile). The complement to [[HllSketchAgg]] on the mergeable-sketch
  * shelf: distinct-count there, rank statistics here.
  */
case class HistQuantileAgg(child: Expression, q: Double, lo: Double,
    hi: Double, bins: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(bins >= 1 && hi > lo && q >= 0.0 && q <= 1.0,
    "need bins>=1, hi>lo, q in [0,1]")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case DoubleType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hist_quantile requires a DOUBLE column, got ${other.catalogString}")
    }

  private val width = (hi - lo) / bins

  override def createAggregationBuffer(): Array[Long] = new Array[Long](bins)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Double]
      val b = math.min(math.max(((x - lo) / width).toInt, 0), bins - 1)
      buf(b) += 1
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < bins) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = {
    var total = 0L
    var i = 0
    while (i < bins) { total += buf(i); i += 1 }
    if (total == 0L) return null
    val target = q * total
    var cum = 0L
    i = 0
    while (i < bins) {
      if (cum + buf(i) >= target) {
        val within = if (buf(i) == 0) 0.0 else (target - cum) / buf(i)
        return java.lang.Double.valueOf(lo + (i + within) * width)
      }
      cum += buf(i)
      i += 1
    }
    java.lang.Double.valueOf(hi)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(bins * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bins)(bb.getLong)
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HistQuantileAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): HistQuantileAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HistQuantileAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "hist_quantile"
}

object HistQuantileAgg {
  /** Register `hist_quantile(doubleCol)` with fixed quantile + range. */
  def register(spark: SparkSession, q: Double, lo: Double, hi: Double,
      bins: Int = 1024): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hist_quantile",
      exprs => HistQuantileAgg(exprs.head, q, lo, hi, bins).toAggregateExpression(),
      "built-in")

  def histQuantile(c: Column): Column =
    org.apache.spark.sql.functions.call_function("hist_quantile", c)
}
