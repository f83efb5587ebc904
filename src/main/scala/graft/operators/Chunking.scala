package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Content-defined chunking (CDC — the rsync/FastCDC shape): split each
  * document where a rolling char-gram fingerprint hits a boundary
  * pattern, then dedup at CHUNK granularity. Catches shared boilerplate /
  * quoted blocks inside otherwise-distinct documents, and stays aligned
  * under insertions (a fixed-width blocker re-aligns every block after an
  * edit; a content-defined cut shifts at most one chunk).
  *
  * Reference scope: wallaroo computations are arbitrary per-message
  * transforms (lib/wallaroo/core/topology/computations.pony:20); chunking
  * is the LLM-pipeline member of that family — the dedup signal used for
  * training-corpus repetition removal at chunk level.
  *
  * Scale shape: chunk hashing is ONE native pass per row with zero
  * shuffles ([[graft.plans.ChunkHashes]]); the corpus report is a single
  * explode + hash-partitioned aggregate on the 60-bit chunk hash —
  * uniformly distributed keys, map-side combining, no joins. At 100 TB the
  * only corpus-sized exchange is the one aggregate over (hash, doc) pairs.
  */
object Chunking {

  /** Corpus-wide shared-chunk report: chunks appearing in 2+ documents,
    * with total occurrences and distinct-document counts — the
    * "duplicated mass" candidates a chunk-level dedup pass would drop.
    */
  def qCdcChunks(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.ChunkHashes.register(s, k = 8, modulus = 64)
    Sources.documents(s, dir)
      .select($"doc_id",
        explode(graft.plans.ChunkHashes.chunkHashes($"text")).as("chunk_hash"))
      .groupBy($"chunk_hash")
      .agg(count(lit(1)).as("n_total"), countDistinct($"doc_id").as("n_docs"))
      .filter($"n_docs" >= 2)
      .orderBy($"chunk_hash")
  }

  /** Per-document chunking profile: chunk count, distinct-chunk count and
    * hash range — the doc-level summary a shard writer keeps next to the
    * chunk store.
    */
  def qCdcProfile(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.ChunkHashes.register(s, k = 8, modulus = 64)
    Sources.documents(s, dir)
      .select($"doc_id", graft.plans.ChunkHashes.chunkHashes($"text").as("ch"))
      .filter(size($"ch") > 0)
      .select($"doc_id", size($"ch").cast("long").as("n_chunks"),
        size(array_distinct($"ch")).cast("long").as("n_uniq"),
        array_min($"ch").as("min_ch"), array_max($"ch").as("max_ch"))
      .orderBy($"doc_id")
  }

  /** Directed chunk containment: document A flagged as living inside B
    * when ≥ 80% of A's RARE distinct chunks (document frequency ≤ 100 —
    * a chunk in more docs is boilerplate carrying no containment signal,
    * and at scale its posting group is the quadratic blowup) also occur
    * in B, with A having ≥ 3 rare chunks. The chunk-level analogue of
    * [[Dedup.containmentPairs]]: catches quoted/wrapped copies that
    * whole-doc similarity dilutes. Posting equi-join on the chunk hash —
    * never a doc×doc product; integer 5·shared ≥ 4·n gate.
    */
  def qChunkContainment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.ChunkHashes.register(s, k = 8, modulus = 64)
    val ch = Sources.documents(s, dir)
      .select($"doc_id", explode(array_distinct(
        graft.plans.ChunkHashes.chunkHashes($"text"))).as("h"))
      .localCheckpoint(true)
    val rare = ch.groupBy($"h").agg(count(lit(1)).as("df"))
      .filter($"df" <= 100).select($"h")
    val kept = ch.join(rare, "h").localCheckpoint(true)
    val nsub = kept.groupBy($"doc_id").agg(count(lit(1)).as("n_rare"))
    val other = kept.toDF("h", "doc_sup")
    kept.join(other, "h")
      .filter($"doc_id" =!= $"doc_sup")
      .groupBy($"doc_id".as("doc_sub"), $"doc_sup")
      .agg(count(lit(1)).as("shared"))
      .join(nsub.withColumnRenamed("doc_id", "doc_sub"), "doc_sub")
      .filter($"n_rare" >= 3 && $"shared" * 5 >= $"n_rare" * 4)
      .select($"doc_sub", $"doc_sup", $"shared", $"n_rare")
      .orderBy($"doc_sub", $"doc_sup")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_cdc_chunks" -> qCdcChunks,
    "q_cdc_profile" -> qCdcProfile,
    "q_chunk_containment" -> qChunkContainment)

  /** DuckDB twin of [[graft.functions.portableHash64]]. */
  private def md(e: String) = s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"

  /** The chunk CTE chain both oracles share: normalized text → qualifying
    * cut positions (1-based gram starts i >= 2 whose 8-gram portable hash
    * is ≡ 0 mod 64) → chunk substrings between consecutive cuts.
    */
  private val chunksCte =
    s"""docs AS (
       |  SELECT doc_id,
       |    regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g') AS norm
       |  FROM documents),
       |nz AS (
       |  SELECT doc_id, norm, length(norm) AS len FROM docs
       |  WHERE length(norm) > 0),
       |cuts AS (
       |  SELECT doc_id, i
       |  FROM nz, UNNEST(range(2, len - 6)) AS t(i)
       |  WHERE ${md("substr(norm, CAST(i AS INTEGER), 8)")} % 64 = 0),
       |starts AS (
       |  SELECT doc_id, 1 AS s FROM nz
       |  UNION ALL
       |  SELECT doc_id, CAST(i AS INTEGER) AS s FROM cuts),
       |spans AS (
       |  SELECT doc_id, s,
       |    lead(s) OVER (PARTITION BY doc_id ORDER BY s) AS nxt
       |  FROM starts),
       |chunks AS (
       |  SELECT p.doc_id,
       |    substr(z.norm, p.s,
       |      COALESCE(p.nxt, z.len + 1) - p.s) AS chunk
       |  FROM spans p JOIN nz z USING (doc_id))""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_cdc_chunks" ->
      s"""WITH $chunksCte
         |SELECT ${md("chunk")} AS chunk_hash, COUNT(*) AS n_total,
         |  COUNT(DISTINCT doc_id) AS n_docs
         |FROM chunks
         |GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY chunk_hash""".stripMargin,
    "q_cdc_profile" ->
      s"""WITH $chunksCte
         |SELECT doc_id, COUNT(*) AS n_chunks,
         |  COUNT(DISTINCT ${md("chunk")}) AS n_uniq,
         |  MIN(${md("chunk")}) AS min_ch, MAX(${md("chunk")}) AS max_ch
         |FROM chunks GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q_chunk_containment" ->
      s"""WITH $chunksCte,
         |ch AS (SELECT DISTINCT doc_id, ${md("chunk")} AS h FROM chunks),
         |rare AS (SELECT h FROM ch GROUP BY h HAVING COUNT(*) <= 100),
         |kept AS (SELECT doc_id, ch.h FROM ch JOIN rare ON ch.h = rare.h),
         |nsub AS (SELECT doc_id, COUNT(*) AS n_rare FROM kept GROUP BY doc_id),
         |p AS (
         |  SELECT a.doc_id AS doc_sub, b.doc_id AS doc_sup,
         |    COUNT(*) AS shared
         |  FROM kept a JOIN kept b ON a.h = b.h AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT doc_sub, doc_sup, shared, n_rare
         |FROM p JOIN nsub ON p.doc_sub = nsub.doc_id
         |WHERE n_rare >= 3 AND shared * 5 >= n_rare * 4
         |ORDER BY doc_sub, doc_sup""".stripMargin)
}
