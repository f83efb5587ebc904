package graft.plans

import scala.collection.mutable
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, hashed with the
  * portable md5-derived 60-bit hash, in ONE native pass per row.
  *
  * Exactly reproduces the composed pipeline
  * `array_distinct(transform(wordShingles(text, n), portableHash64))`:
  *  - lowercasing via `UTF8String.toLowerCase` (identical to `lower()`),
  *  - tokens = regex split on `[^a-z]+` with empties dropped (identical to
  *    `filter(split(lower(text),'[^a-z]+'), x -> x <> '')` and DuckDB
  *    `regexp_split_to_array`),
  *  - shingle = n tokens joined by single spaces,
  *  - hash = first 15 hex digits of md5 as a bigint (== first 8 digest
  *    bytes big-endian >>> 4 == `conv(substr(md5(s),1,15),16,10)`).
  * The composed form walks interpreted higher-order lambdas with per-
  * element boxing; this is a tight loop. The DuckDB oracle replays the
  * same chain in SQL, so results stay hash-gated.
  */
case class ShingleHashes(child: Expression, n: Int, distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingle_hashes requires a string column, got ${other.catalogString}")
  }

  // one digest/pattern per deserialized expression instance; expression
  // trees are task-local in execution, so no cross-thread sharing
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val pattern = java.util.regex.Pattern.compile("[^a-z]+")

  override def nullSafeEval(input: Any): Any = {
    val lowered = input.asInstanceOf[UTF8String].toLowerCase.toString
    val tokens = pattern.split(lowered, -1).filter(_.nonEmpty)
    // distinct=false keeps duplicate shingles (term-frequency weighting,
    // e.g. SimHash votes); distinct=true matches array_distinct semantics
    val out =
      if (distinct) mutable.LinkedHashSet.empty[Long]
      else mutable.ArrayBuffer.empty[Long]
    var i = 0
    while (i <= tokens.length - n) {
      val sb = new java.lang.StringBuilder(tokens(i))
      var j = 1
      while (j < n) { sb.append(' ').append(tokens(i + j)); j += 1 }
      digest.reset()
      val d = digest.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      out += (h >>> 4) // first 15 hex digits of the md5
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}

/** Winnowing fingerprints in ONE native pass per row: portable-hash every
  * character k-gram of the normalized text ([a-z0-9 ]+ after lowering —
  * pure ASCII, so char positions equal SQL character positions), then keep
  * the distinct minima of every complete window of `w` consecutive gram
  * hashes. Bit-identical to the explode + sliding-window-min + distinct
  * chain (`Dedup.winnowFingerprints` with portableHash64) and to the
  * DuckDB oracle, without shuffling gram rows.
  */
case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && w >= 1, "k-gram width and window must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_hashes requires a string column, got ${other.catalogString}")
  }

  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val norm = input.asInstanceOf[UTF8String].toLowerCase.toString
      .replaceAll("[^a-z0-9]+", " ")
    val ng = math.max(norm.length - (k - 1), 0)
    val grams = new Array[Long](ng)
    var i = 0
    while (i < ng) {
      digest.reset()
      val d = digest.digest(norm.substring(i, i + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      grams(i) = h >>> 4
      i += 1
    }
    val seen = mutable.LinkedHashSet.empty[Long]
    i = 0
    while (i <= ng - w) {
      var m = grams(i)
      var j = 1
      while (j < w) { if (grams(i + j) < m) m = grams(i + j); j += 1 }
      seen += m
      i += 1
    }
    new GenericArrayData(seen.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
  override def prettyName: String = "winnow_hashes"
}

object WinnowHashes {
  def winnowHashes(text: Column): Column =
    org.apache.spark.sql.functions.call_function("winnow_hashes", text)

  /** Register `winnow_hashes(text)` with fixed k-gram and window widths.
    * `name` lets one session hold several (k, w) variants; w = 1 degrades
    * to "distinct char k-gram hashes in first-seen order" — the raw gram
    * profile used by substring-dedup and edit-distance filtering.
    */
  def register(spark: SparkSession, k: Int = 8, w: Int = 4,
      name: String = "winnow_hashes"): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, exprs => WinnowHashes(exprs.head, k, w), "built-in")
}

object ShingleHashes {
  def shingleHashes(text: Column): Column =
    org.apache.spark.sql.functions.call_function("shingle_hashes", text)

  /** Register `shingle_hashes(text)` with a fixed n-gram width. */
  def register(spark: SparkSession, n: Int = 3): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => ShingleHashes(exprs.head, n), "built-in")

  def tokenHashes(text: Column): Column =
    org.apache.spark.sql.functions.call_function("token_hashes", text)

  /** Register `token_hashes(text)`: per-token portable hashes, duplicates
    * kept (the SimHash vote input).
    */
  def registerTokenHashes(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "token_hashes",
      exprs => ShingleHashes(exprs.head, 1, distinct = false), "built-in")
}
