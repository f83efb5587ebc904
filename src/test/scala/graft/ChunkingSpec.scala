package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.ChunkHashes

class ChunkingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.configure(
    SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")).getOrCreate()
  val sf = "/root/testdata/sf0.001"

  /** Sequential reference implementation of the ChunkHashes contract. */
  private def refChunks(text: String, k: Int, m: Int): Seq[Long] = {
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      (d.take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xffL))) >>> 4
    }
    val norm = text.toLowerCase.replaceAll("[^a-z0-9]+", " ")
    if (norm.isEmpty) return Nil
    val cuts = (1 to norm.length - k)
      .filter(i => h60(norm.substring(i, i + k)) % m == 0)
    val bounds = 0 +: cuts :+ norm.length
    bounds.sliding(2).map { case Seq(a, b) => h60(norm.substring(a, b)) }.toSeq
  }

  test("native ChunkHashes matches the sequential reference on the corpus") {
    import spark.implicits._
    ChunkHashes.register(spark, k = 8, modulus = 64)
    val got = graft.sources.Sources.documents(spark, sf)
      .select($"doc_id", ChunkHashes.chunkHashes($"text").as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val docs = graft.sources.Sources.documents(spark, sf)
      .select($"doc_id", $"text").collect()
    docs.foreach { r =>
      assert(got(r.getLong(0)) == refChunks(r.getString(1), 8, 64),
        s"doc ${r.getLong(0)}")
    }
    // the corpus actually chunks (some doc has >1 chunk)
    assert(got.values.exists(_.size > 1))
  }

  test("an insertion shifts at most the chunks around the edit point") {
    val base = "the quick brown fox jumps over the lazy dog " * 20
    val edited = base.substring(0, 300) + " inserted words here " +
      base.substring(300)
    val a = refChunks(base, 8, 64)
    val b = refChunks(edited, 8, 64)
    // content-defined cuts re-align after the edit: the tail chunks match
    val common = a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }
    assert(common.nonEmpty, "no shared tail chunks after an insertion")
  }

  test("empty and short texts degrade to zero or one chunk") {
    assert(refChunks("", 8, 64).isEmpty)
    assert(refChunks("!!!", 8, 64).size == 1) // normalizes to " "
    assert(refChunks("short", 8, 64).size == 1)
  }
}
