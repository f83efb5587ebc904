package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Training-data deduplication operators: exact, normalized-fingerprint,
  * banded n-gram Jaccard, MinHash+LSH, and SimHash.
  *
  * Scale design (100 TB): nothing here is O(n²) over the corpus. Exact and
  * fingerprint dedup are single hash-partitioned groupBys; Jaccard pairs
  * are generated only inside band buckets ((lang, length-bucket) here,
  * LSH band-hash buckets for MinHash); SimHash compares only within a
  * band. All signatures are built columnar (array expressions over the
  * token array) — no explode of (doc × shingle × hash) rows, no UDFs.
  */
object Dedup {

  /** Word n-gram shingles (distinct) of a text column. */
  def wordShingles(text: Column, n: Int = 3): Column = {
    val words = wordTokens(text)
    val sh = transform(sequence(lit(1), size(words) - (n - 1)),
      i => concat_ws(" ", (0 until n).map(k => element_at(words, i + k)): _*))
    array_distinct(when(size(words) >= n, sh).otherwise(array()))
  }

  /** Exact-duplicate groups by content hash: one shuffle, representative =
    * min id. (Reference has no dedup surface; this is the LLM-pipeline
    * extension family.)
    */
  def exactGroups(df: DataFrame, idCol: Column, contentCol: Column): DataFrame =
    df.groupBy(md5(contentCol).as("content_hash"))
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Near-exact groups by normalized fingerprint (case/punct/whitespace
    * insensitive).
    */
  def fingerprintGroups(df: DataFrame, idCol: Column, textCol: Column): DataFrame =
    df.groupBy(normFingerprint(textCol).as("fingerprint"))
      .agg(min(idCol).as("rep_id"), count(lit(1)).as("n_copies"))

  /** Exact Jaccard near-dup pairs, banded: pairs are only formed inside
    * `band` buckets, so the self-join shuffles on the band key and never
    * materializes the full cross product.
    */
  def jaccardPairs(docs: DataFrame, idCol: String, shingleCol: String,
      bandCols: Seq[String], threshold: Double): DataFrame = {
    val a = docs.select((bandCols :+ idCol :+ shingleCol).map(col): _*)
    val b = a.toDF(a.columns.map(c => if (bandCols.contains(c)) c else s"${c}_b"): _*)
    val jac = size(array_intersect(col(shingleCol), col(s"${shingleCol}_b"))
      ).cast("double") / size(array_union(col(shingleCol), col(s"${shingleCol}_b")))
    a.join(b, bandCols)
      .filter(col(idCol) < col(s"${idCol}_b"))
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"), col("jaccard"))
  }

  /** MinHash signature columns: sig_i = min over shingles of xxhash64(s, i).
    * Built as `numHashes` array-min expressions — columnar, no explode.
    */
  def withMinhashSignature(df: DataFrame, shingleCol: String, numHashes: Int): DataFrame =
    (0 until numHashes).foldLeft(df) { (d, i) =>
      d.withColumn(s"mh_$i",
        array_min(transform(col(shingleCol), s => xxhash64(s, lit(i)))))
    }

  /** LSH candidate pairs: band the signature, bucket-join on
    * (band, band_hash), emit verified pairs with exact Jaccard.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, shingleCol: String,
      numHashes: Int, bands: Int, threshold: Double): DataFrame = {
    val rows = numHashes / bands
    val signed = withMinhashSignature(
      docs.select(col(idCol), col(shingleCol)), shingleCol, numHashes)
    val bandHashes = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * rows until (b + 1) * rows).map(i => col(s"mh_$i")): _*).as("bh"))
    }
    val banded = signed
      .withColumn("_band", explode(array(bandHashes: _*)))
      .select(col(idCol), col(shingleCol), col("_band.band"), col("_band.bh"))
    val other = banded.select(col(idCol).as(s"${idCol}_b"),
      col(shingleCol).as(s"${shingleCol}_b"), col("band"), col("bh"))
    val jac = size(array_intersect(col(shingleCol), col(s"${shingleCol}_b"))
      ).cast("double") / size(array_union(col(shingleCol), col(s"${shingleCol}_b")))
    banded.join(other, Seq("band", "bh"))
      .filter(col(idCol) < col(s"${idCol}_b"))
      .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"),
        col(shingleCol), col(s"${shingleCol}_b"))
      .distinct()
      .withColumn("jaccard", jac)
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** 63-bit SimHash over word tokens (bit 63 left clear so the signature
    * stays a non-negative long). Columnar: 63 sign-sum expressions over the
    * token-hash array.
    */
  def simhash63(text: Column): Column = {
    val hashes = transform(wordTokens(text), t => xxhash64(t))
    val bits = (0 until 63).map { b =>
      val vote = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, b).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      when(vote > 0, lit(1L) * (1L << b)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** SimHash near-dup pairs within a band (same length bucket), Hamming
    * distance ≤ `maxHamming` via xor + bit_count.
    */
  def simhashPairs(docs: DataFrame, idCol: String, simhashCol: String,
      bandCols: Seq[String], maxHamming: Int): DataFrame = {
    val a = docs.select((bandCols :+ idCol :+ simhashCol).map(col): _*)
    val b = a.toDF(a.columns.map(c => if (bandCols.contains(c)) c else s"${c}_b"): _*)
    a.join(b, bandCols)
      .filter(col(idCol) < col(s"${idCol}_b"))
      .withColumn("hamming",
        bit_count(col(simhashCol).bitwiseXOR(col(s"${simhashCol}_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col(idCol).as("doc_a"), col(s"${idCol}_b").as("doc_b"), col("hamming"))
  }

  /** Embedding-cosine near-dup pairs, banded by a cluster/label column. */
  def embeddingPairs(emb: DataFrame, idCol: String, vecCol: String,
      bandCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(bandCol), col(idCol), col(vecCol))
    val b = a.toDF(bandCol, s"${idCol}_b", s"${vecCol}_b")
    a.join(b, bandCol)
      .filter(col(idCol) < col(s"${idCol}_b"))
      .withColumn("cos", cosineSim(col(vecCol), col(s"${vecCol}_b")))
      .filter(col("cos") >= threshold)
      .select(col(idCol).as("vec_a"), col(s"${idCol}_b").as("vec_b"), col("cos"))
  }
}
