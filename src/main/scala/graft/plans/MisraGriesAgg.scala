package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native mergeable
  * `TypedImperativeAggregate`: the buffer is a bounded counter map of at
  * most `k` keys. Update is the classic MG step (increment if tracked,
  * insert if room, otherwise decrement all); merge follows the mergeable-
  * summaries construction (Agarwal et al., PODS'12): sum both maps, then
  * subtract the (k+1)-th largest count and drop non-positive entries.
  *
  * The invariant that survives ANY partitioning / merge tree: every item
  * with true frequency > N/(k+1) (N = total count) is present in the final
  * summary, and each tracked estimate undercounts by at most N/(k+1).
  * That guarantee — not the exact counter values, which are order-
  * dependent like every MG sketch — is what the oracle checks.
  *
  * At 100 TB this is the way to find frequent tokens / URLs / templates
  * without a full groupBy: map-side partials are k-bounded, the shuffle
  * carries one small map per partition, and stores can be rolled up later.
  */
case class MisraGriesAgg(child: Expression, k: Int = 64,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {
  require(k >= 1, s"capacity must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"misra_gries requires a STRING column, got ${other.catalogString}")
    }

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf(key) = c + 1
        case None if buf.size < k => buf(key) = 1L
        case None =>
          // decrement-all; drop zeros (classic MG third case)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace { (_, c) => c - 1 }
          buf.foreach { case (w, c) => if (c <= 0) dead += w }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (w, c) => b1(w) = b1.getOrElse(w, 0L) + c }
    if (b1.size > k) {
      // subtract the (k+1)-th largest count from everything, keep > 0
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      b1.mapValuesInPlace { (_, c) => c - cut }
      b1.foreach { case (w, c) => if (c <= 0) dead += w }
      dead.foreach(b1.remove)
    }
    b1
  }

  /** Result: map key → (order-dependent) estimate, keys sorted for a
    * stable output layout. Downstream checks use key MEMBERSHIP plus the
    * MG guarantee, never the raw estimates.
    */
  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val entries = buf.toArray.sortBy(_._1)
    ArrayBasedMapData(
      entries.map(e => UTF8String.fromString(e._1): Any),
      entries.map(_._2: Any))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (w, c) =>
      val bytes = w.getBytes("UTF-8")
      out.writeInt(bytes.length)
      out.write(bytes)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = in.readLong()
      i += 1
    }
    buf
  }

  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): MisraGriesAgg =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(o: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "misra_gries"
}

object MisraGriesAgg {
  /** Register `misra_gries(stringCol)` with fixed capacity `k`. */
  def register(spark: SparkSession, k: Int = 64): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "misra_gries",
      exprs => MisraGriesAgg(exprs.head, k).toAggregateExpression(),
      "built-in")

  def misraGries(c: Column): Column =
    org.apache.spark.sql.functions.call_function("misra_gries", c)
}
