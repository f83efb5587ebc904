package graft.plans

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact top-k per group as a native mergeable aggregate: the buffer is a
  * bounded heap of (score, id), so map-side partial aggregation carries at
  * most k rows per group per partition — unlike the rank-window
  * formulation, which shuffles EVERY row to its group's partition before
  * discarding all but k. At 100 TB, top-k-per-key over a skewed key is the
  * difference between a k-bounded partial and a full-data exchange with a
  * hot partition.
  *
  * Exact semantics (not a sketch): the merge of bounded top-k heaps is the
  * top-k of the union, so the result is identical under any partitioning
  * and fully oracle-checkable against a `row_number()` window. Ordering:
  * score DESC, id ASC on ties.
  */
case class TopKAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Long, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topk requires (BIGINT score, BIGINT id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  // head = WORST kept: lowest score first, ties by highest id
  private val heapOrd: Ordering[(Long, Long)] = new Ordering[(Long, Long)] {
    def compare(a: (Long, Long), b: (Long, Long)): Int = {
      val c = java.lang.Long.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Long, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  private def insert(buf: mutable.PriorityQueue[(Long, Long)],
      s: Long, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      if (s > ws || (s == ws && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Long, Long)],
      input: InternalRow): mutable.PriorityQueue[(Long, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Long], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Long, Long)],
      b2: mutable.PriorityQueue[(Long, Long)]): mutable.PriorityQueue[(Long, Long)] = {
    b2.foreach { case (s, i) => insert(b1, s, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Long, Long)]): Any = {
    // heapOrd ranks the WORST element greatest, so ascending heapOrd
    // order is exactly score DESC, id ASC
    val arr = buf.toArray.sorted(heapOrd)
    new GenericArrayData(arr.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeLong(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", LongType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKAgg =
    copy(score = c(0), id = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topk"
}

object TopKAgg {
  /** Register `topk_{k}(scoreBigint, idBigint)` — the name carries k so
    * registrations for different k never clobber each other or the
    * session-wide extension-injected `topk` (k=10, GraftExtensions).
    */
  def register(spark: SparkSession, k: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"topk_$k",
      exprs => TopKAgg(exprs.head, exprs(1), k).toAggregateExpression(),
      "built-in")

  def topk(k: Int, score: Column, id: Column): Column =
    org.apache.spark.sql.functions.call_function(s"topk_$k", score, id)
}

/** [[TopKAgg]] with a DOUBLE score — the similarity-search form (cosine
  * scores). Same exact bounded-heap semantics: map-side partials carry at
  * most k `(score, id)` entries per group, the merge of bounded top-k
  * heaps is the top-k of the union, ordering is score DESC, id ASC on
  * ties (NaN ranks above every finite score, matching Spark's DESC sort
  * order, so a window-rank oracle agrees row-for-row).
  */
case class TopKDoubleAgg(score: Expression, id: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]] {
  require(k >= 1, s"k must be >= 1, got $k")

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, i) => TypeCheckResult.TypeCheckFailure(
        s"topkd requires (DOUBLE score, BIGINT id), got " +
          s"(${s.catalogString}, ${i.catalogString})")
    }

  // head = WORST kept: lowest score first, ties by highest id
  private val heapOrd: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    def compare(a: (Double, Long), b: (Double, Long)): Int = {
      val c = java.lang.Double.compare(b._1, a._1)
      if (c != 0) c else java.lang.Long.compare(a._2, b._2)
    }
  }

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(heapOrd)

  private def insert(buf: mutable.PriorityQueue[(Double, Long)],
      s: Double, i: Long): Unit = {
    if (buf.size < k) buf.enqueue((s, i))
    else {
      val (ws, wi) = buf.head
      val c = java.lang.Double.compare(s, ws)
      if (c > 0 || (c == 0 && i < wi)) { buf.dequeue(); buf.enqueue((s, i)) }
    }
  }

  override def update(buf: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      insert(buf, s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: mutable.PriorityQueue[(Double, Long)],
      b2: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    b2.foreach { case (s, i) => insert(b1, s, i) }
    b1
  }

  override def eval(buf: mutable.PriorityQueue[(Double, Long)]): Any = {
    val arr = buf.toArray.sorted(heapOrd)
    new GenericArrayData(arr.map { case (s, i) =>
      new GenericInternalRow(Array[Any](s, i)): Any
    })
  }

  override def serialize(buf: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.enqueue((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): TopKDoubleAgg =
    copy(score = c(0), id = c(1))
  override def withNewMutableAggBufferOffset(o: Int): TopKDoubleAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKDoubleAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "topkd"
}

object TopKDoubleAgg {
  def register(spark: SparkSession, k: Int): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      s"topkd_$k",
      exprs => TopKDoubleAgg(exprs.head, exprs(1), k).toAggregateExpression(),
      "built-in")

  def topkd(k: Int, score: Column, id: Column): Column =
    org.apache.spark.sql.functions.call_function(s"topkd_$k", score, id)
}
