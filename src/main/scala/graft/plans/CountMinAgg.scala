package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Count-Min sketch as a native mergeable `TypedImperativeAggregate`: the
  * buffer is a depth×width counter matrix, update adds 1 to one counter
  * per row (seeded xxhash64), merge is elementwise addition — so the
  * sketch is EXACTLY partitioning-independent (addition commutes), unlike
  * MG whose counters are order-dependent.
  *
  * The result is the raw counter array; point estimates are composed from
  * codegen'd built-ins by [[CountMinAgg.estimate]], which probes the SAME
  * seeded-xxhash64 chain (`xxhash64(lit(d), key)` ≡ the update path's
  * `XxHash64Function` chaining) — one broadcast row serves any number of
  * downstream lookups with no UDF.
  *
  * Guarantees (Cormode-Muthukrishnan): estimate ≥ true count always;
  * estimate ≤ true + 2N/width with probability ≥ 1 − 2^-depth per key.
  */
case class CountMinAgg(child: Expression, depth: Int = 4, width: Int = 4096,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {
  require(depth >= 1 && width >= 2, s"bad sketch shape $depth x $width")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"count_min requires a STRING column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      var d = 0
      while (d < depth) {
        // identical to the built-in xxhash64(lit(d, long), key) chain
        val seed = XxHash64Function.hash(d.toLong, LongType, 42L)
        val h = XxHash64Function.hash(v, StringType, seed)
        val idx = ((h % width) + width) % width
        buf(d * width + idx.toInt) += 1
        d += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): CountMinAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): CountMinAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CountMinAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "count_min"
}

object CountMinAgg {
  def register(spark: SparkSession, depth: Int = 4, width: Int = 4096): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "count_min",
      exprs => CountMinAgg(exprs.head, depth, width).toAggregateExpression(),
      "built-in")

  def countMin(c: Column): Column = call_function("count_min", c)

  /** Point estimate from the sketch array column: min over the depth rows
    * of the probed counters — pure built-ins, codegen'd, broadcast-friendly.
    */
  def estimate(sketch: Column, key: Column, depth: Int = 4, width: Int = 4096): Column =
    (0 until depth).map { d =>
      element_at(sketch,
        (lit(d * width) + pmod(xxhash64(lit(d.toLong), key), lit(width)))
          .cast("int") + 1)
    }.reduce(least(_, _))
}
