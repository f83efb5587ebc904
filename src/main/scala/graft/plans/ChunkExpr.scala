package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk hashes (the FastCDC/rsync shape used for
  * chunk-level dedup of near-identical documents) in ONE native pass per
  * row. Reference semantics: split where a rolling content fingerprint
  * hits a boundary pattern, so an insertion early in a document shifts at
  * most one chunk instead of re-aligning every fixed-width block.
  *
  * Deterministic, oracle-portable formulation:
  *  - normalize like [[WinnowHashes]] (lower, `[^a-z0-9]+` → single space;
  *    pure ASCII so char positions equal SQL character positions),
  *  - fingerprint every char k-gram with the portable md5-derived 60-bit
  *    hash ([[graft.functions.portableHash64]]),
  *  - cut BEFORE every gram start i >= 1 (0-based) whose gram hash is
  *    ≡ 0 (mod `modulus`) — expected chunk length ≈ `modulus` chars,
  *  - emit the portable hash of each chunk substring, in order,
  *    duplicates kept.
  * An empty normalized text yields an empty array; a text with no
  * qualifying cut yields one whole-text chunk hash. The DuckDB oracle
  * replays the identical chain with `range`/`lead` + md5 substrings.
  */
case class ChunkHashes(child: Expression, k: Int, modulus: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && modulus >= 1, "gram width and modulus must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"chunk_hashes requires a string column, got ${other.catalogString}")
  }

  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  private def hash60(s: String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  override def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String].toLowerCase.toString
      .replaceAll("[^a-z0-9]+", " ")
    if (norm.isEmpty) return new GenericArrayData(Array.emptyLongArray)
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 1
    while (i <= norm.length - k) {
      if (hash60(norm.substring(i, i + k)) % modulus == 0L) cuts += i
      i += 1
    }
    val out = new Array[Long](cuts.length + 1)
    var prev = 0
    var c = 0
    while (c < cuts.length) {
      out(c) = hash60(norm.substring(prev, cuts(c)))
      prev = cuts(c)
      c += 1
    }
    out(c) = hash60(norm.substring(prev))
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
  override def prettyName: String = "chunk_hashes"
}

object ChunkHashes {
  def chunkHashes(text: Column): Column =
    org.apache.spark.sql.functions.call_function("chunk_hashes", text)

  /** Register `chunk_hashes(text)` with fixed gram width and boundary
    * modulus (expected chunk length ≈ modulus chars).
    */
  def register(spark: SparkSession, k: Int = 8, modulus: Int = 64): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "chunk_hashes", exprs => ChunkHashes(exprs.head, k, modulus), "built-in")
}
