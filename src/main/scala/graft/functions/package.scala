package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}

/** Column-level helpers shared by graft operators.
  *
  * Everything here composes built-in (whole-stage-codegen'd) functions —
  * no Scala UDFs — so expressions stay inside Tungsten codegen and the
  * same semantics are expressible as ANSI SQL for the DuckDB oracle.
  */
package object functions {

  /** Order-independent, engine-exact sum of a double column: cast each value
    * to an exact decimal first, sum (exact, associative), then cast the one
    * final value back to double. Eliminates float-summation
    * non-determinism across partitionings and engines.
    */
  def xsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(27, scale))).cast(DoubleType)

  /** Engine-exact average built from [[xsum]] / count (IEEE division of two
    * deterministic values).
    */
  def xavg(c: Column, scale: Int = 6): Column =
    xsum(c, scale) / count(lit(1))

  /** Epoch seconds as bigint — ns-safe: Spark truncates parquet ns
    * timestamps to µs while DuckDB keeps ns, so second-level bucketing is
    * the cross-engine-safe representation.
    */
  def epochS(ts: Column): Column = unix_timestamp(ts).cast(LongType)

  /** Tumbling-window bucket start (epoch seconds), aligned to the epoch. */
  def windowStart(ts: Column, rangeS: Long): Column =
    floor(epochS(ts) / rangeS) * rangeS

  /** Lower-cased word tokens of a text column (letters only). */
  def wordTokens(text: Column): Column =
    filter(split(lower(text), "[^a-z]+"), w => w =!= "")

  /** Normalized content fingerprint: lower, strip non-alphanumerics,
    * collapse runs — then md5. Catches whitespace/punctuation-only dups.
    */
  def normFingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]+", " "))

  /** Portable 60-bit hash: the first 15 hex digits of md5, as a
    * non-negative bigint. Both engines compute it bit-identically
    * (Spark `conv(substr(md5(x),1,15),16,10)` ⇄ DuckDB
    * `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`), which makes the whole
    * MinHash/SimHash/LSH chain oracle-checkable. xxhash64 stays the
    * fast path where no oracle needs to reproduce the hash.
    */
  def portableHash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast(LongType)

  /** DuckDB SQL form of [[portableHash64]] for oracle queries. */
  def portableHash64Sql(expr: String): String =
    s"CAST('0x'||substr(md5($expr),1,15) AS BIGINT)"

  /** Driver-side twin of [[portableHash64]] for the gated in-memory
    * paths (r15): first 15 hex digits of md5 == first 8 digest bytes
    * big-endian >>> 4 — bit-identical to the Column form on any string.
    */
  def portableHash64Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var b = 0
    while (b < 8) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
    h >>> 4
  }

  /** Dot product of two float-array columns (cast to double, index-ordered
    * left fold → deterministic and DuckDB-`list_sum`-exact).
    */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm of a float-array column. */
  def vecNormD(a: Column): Column = sqrt(dotD(a, a))

  /** Cosine similarity between two float-array columns. For pairwise
    * workloads precompute [[vecNormD]] per side once and use
    * `dotD(a,b) / (na * nb)` — identical doubles, one fold per pair
    * instead of three.
    */
  def cosineSim(a: Column, b: Column): Column =
    dotD(a, b) / (vecNormD(a) * vecNormD(b))

  /** Character n-gram shingles of a normalized text column. */
  def charShingles(text: Column, n: Int): Column = {
    val norm = regexp_replace(lower(text), "[^a-z0-9]+", " ")
    // distinct shingles: substring windows over the normalized text
    array_distinct(transform(
      sequence(lit(1), greatest(length(norm) - (n - 1), lit(1))),
      i => norm.substr(i, lit(n))))
  }
}
