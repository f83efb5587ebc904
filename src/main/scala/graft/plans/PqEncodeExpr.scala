package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass PQ encoder: for an int-code vector, the nearest centroid
  * (integer squared-L2, ties to the lowest cid) in EVERY subspace — one
  * primitive loop instead of m×k interpreted zip-folds per row (the
  * SURVEY §5b native-expression pattern). Semantics identical to the fold
  * composition: sequential index-order accumulation, strict `<`.
  */
case class PqEncode(child: Expression, books: Seq[Seq[(Long, Array[Long])]],
    subDim: Int) extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("sub", LongType, nullable = false),
    StructField("cid", LongType, nullable = false),
    StructField("d", LongType, nullable = false))), containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires array<bigint> codes, got ${other.catalogString}")
  }

  // centroids frozen into primitive arrays, sorted by cid (tie rule)
  @transient private lazy val cents: Array[Array[Array[Long]]] =
    books.map(_.sortBy(_._1).map(_._2).toArray).toArray
  @transient private lazy val cids: Array[Array[Long]] =
    books.map(_.sortBy(_._1).map(_._1).toArray).toArray

  override def nullSafeEval(v: Any): Any = {
    val codes = v.asInstanceOf[ArrayData].toLongArray()
    val m = cents.length
    val out = new Array[Any](m)
    var s0 = 0
    while (s0 < m) {
      val base = s0 * subDim
      var bestD = Long.MaxValue
      var bestC = -1L
      var c = 0
      while (c < cents(s0).length) {
        val cent = cents(s0)(c)
        var d = 0L
        var j = 0
        while (j < subDim) {
          val diff = codes(base + j) - cent(j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; bestC = cids(s0)(c) }
        c += 1
      }
      out(s0) = new GenericInternalRow(Array[Any](s0.toLong, bestC, bestD))
      s0 += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): PqEncode =
    copy(child = c)
  override def prettyName: String = "pq_encode"
}

object PqEncode {
  /** (Re-)register with the CURRENT codebooks — call before each use.
    * Distinct `name`s let one query plan hold independently-frozen
    * encoders (e.g. an IVF coarse quantizer plus a residual PQ encoder)
    * without register-order coupling: resolution happens eagerly when the
    * DataFrame referencing the name is built.
    */
  def register(spark: SparkSession, books: Seq[Seq[(Long, Array[Long])]],
      subDim: Int, name: String = "pq_encode"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => PqEncode(exprs.head, books, subDim), "built-in")

  def encode(codes: Column, name: String = "pq_encode"): Column =
    org.apache.spark.sql.functions.call_function(name, codes)
}
