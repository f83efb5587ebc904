package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}

/** Mergeable HyperLogLog sketch as a native `TypedImperativeAggregate`:
  * the buffer is the raw register array (2^p bytes), update is one xxhash64
  * + register max, merge is elementwise max — so partial sketches combine
  * map-side before the shuffle and the estimate is IDENTICAL under any
  * partitioning (max is commutative/associative/idempotent). This is the
  * serialized-mergeable-sketch contract a 100 TB pipeline needs: per-split
  * sketches can be persisted and rolled up later without re-scanning.
  *
  * Estimator: standard HLL (Flajolet et al.) with linear counting below
  * 2.5m — bias-table-free, which keeps the estimate reproducible from the
  * buffer alone. p=14 → 16 KiB buffer, ~0.8% standard error.
  */
case class HllSketchAgg(child: Expression, p: Int = 14,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {
  require(p >= 4 && p <= 18, s"precision must be in [4,18], got $p")
  private val m = 1 << p

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"hll_distinct requires a BIGINT column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = XXH64.hashLong(v.asInstanceOf[Long], 42L)
      val idx = (h >>> (64 - p)).toInt
      // rank = leading-zero count of the remaining 64-p bits, + 1
      val rest = h << p
      val rank = (if (rest == 0L) 64 - p
                  else math.min(java.lang.Long.numberOfLeadingZeros(rest), 63 - p)) + 1
      if (rank > buf(idx)) buf(idx) = rank.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (b2(i) > b1(i)) b1(i) = b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Byte]): Any = {
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.scalb(1.0, -buf(i))
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    val raw = alpha * m * m / invSum
    val est =
      if (raw <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else raw
    java.lang.Long.valueOf(math.round(est))
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketchAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "hll_distinct"
}

object HllSketchAgg {
  /** Register `hll_distinct(bigintCol)` with fixed precision. */
  def register(spark: SparkSession, p: Int = 14): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "hll_distinct",
      exprs => HllSketchAgg(exprs.head, p).toAggregateExpression(),
      "built-in")

  def hllDistinct(c: Column): Column =
    org.apache.spark.sql.functions.call_function("hll_distinct", c)
}
