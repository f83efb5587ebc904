package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** Corpus-preparation operators for a large-scale training-data pipeline:
  * benchmark decontamination, deterministic train/val/test splitting,
  * cross-corpus chunk (paragraph-line) dedup, PII scrubbing, a composed
  * quality-filter chain (C4/Gopher-style rules), domain-mixture sampling,
  * and a deterministic global shuffle order.
  *
  * Everything is hash-deterministic ([[graft.functions.portableHash64]])
  * so each query has an exact DuckDB oracle; nothing depends on
  * partitioning or RNG state.
  */
object CorpusOps {
  type Q = (SparkSession, String) => DataFrame

  /** Benchmark decontamination: count, per training doc, how many of its
    * distinct word-3-gram hashes also occur in the benchmark (eval) set.
    * The benchmark gram set is broadcast — eval suites are tiny next to a
    * 100 TB corpus, so the scan side never shuffles; only the matched
    * (doc, gram) hits (≪ corpus) reach the final aggregation.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      shCol: String): DataFrame = {
    val benchGrams = bench.select(explode(col(shCol)).as("g")).distinct()
    train.select(col(idCol), explode(col(shCol)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Deterministic corpus split: hash-bucket each id into train/val/test
    * (80/10/10). Pure projection — no shuffle, reproducible across runs
    * and engines.
    */
  def splitColumn(idCol: Column): Column = {
    val bucket = pmod(portableHash64(concat(lit("split:"), idCol)), lit(100))
    when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
  }

  /** Cross-corpus chunk dedup (the "remove duplicated paragraphs/lines
    * corpus-wide" op): texts are chunked into consecutive `size`-word
    * pieces; each distinct chunk text survives only at its first
    * occurrence (ordered by doc id, then chunk index).
    *
    * Chunking goes through posexplode + conditional aggregation (one
    * tokenize per doc, algebraic agg, no interpreted array lambdas — see
    * SURVEY §5a on HOF inlining). The survivor pass shuffles on chunk
    * text, which is exactly the hash-partitioned dedup shape that scales.
    *
    * Returns (id, cid, chunk) survivors.
    */
  def chunkDedupSurvivors(docs: DataFrame, idCol: String, textCol: String,
      size: Int = 10): DataFrame = {
    val words = docs.select(col(idCol),
      posexplode(split(col(textCol), " ")).as(Seq("pos", "word")))
    val chunks = words
      .withColumn("cid", floor(col("pos") / size).cast("long"))
      .groupBy(col(idCol), col("cid"))
      .agg(concat_ws(" ", (0 until size).map(j =>
        max(when(pmod(col("pos"), lit(size)) === j, col("word")))): _*)
        .as("chunk"))
    val w = Window.partitionBy(col("chunk")).orderBy(col(idCol), col("cid"))
    chunks.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1).drop("rn")
  }

  /** PII scrubbing: replace emails, IPv4 addresses, and long digit runs
    * (card-like) with typed placeholder tags. Pure per-row projection —
    * codegen'd regexes, no shuffle, embarrassingly parallel at any scale.
    * Returns (scrubbed, n_emails, n_ips, n_cards) columns appended.
    */
  val EmailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
  val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val CardRe = "\\b\\d{13,19}\\b"

  def piiScrub(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    df.withColumn("n_emails", size(regexp_extract_all(t, lit(EmailRe), lit(0))).cast("long"))
      .withColumn("n_ips", size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).cast("long"))
      .withColumn("n_cards", size(regexp_extract_all(t, lit(CardRe), lit(0))).cast("long"))
      .withColumn("scrubbed",
        regexp_replace(
          regexp_replace(
            regexp_replace(t, EmailRe, "<EMAIL>"),
            Ipv4Re, "<IP>"),
          CardRe, "<CARD>"))
  }

  /** Composed quality-filter rules (C4/Gopher-style), all engine-exact:
    * word-count bounds, mean word length bounds, >=2 distinct stopwords,
    * type-token ratio floor. Adds boolean rule columns + `pass`.
    * Texts are single-space tokenized (the corpus contract here);
    * mean word length falls out of char/word counts with no per-word agg.
    */
  def qualityFlags(df: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val padded = concat(lit(" "), t, lit(" "))
    val stops = Seq("the", "a", "of", "and", "to")
      .map(s0 => when(padded.contains(s" $s0 "), 1).otherwise(0))
      .reduce(_ + _)
    df.withColumn("nw", size(split(t, " ")).cast("long"))
      .withColumn("mean_wl",
        (length(t) - (col("nw") - 1)).cast("double") / col("nw"))
      .withColumn("ttr",
        size(array_distinct(split(t, " "))).cast("double") / col("nw"))
      .withColumn("n_stop", stops.cast("long"))
      .withColumn("r_len", col("nw").between(20, 90))
      .withColumn("r_wl", col("mean_wl").between(3.0, 8.0))
      .withColumn("r_stop", col("n_stop") >= 2)
      .withColumn("r_ttr", col("ttr") >= 0.35)
      .withColumn("pass",
        col("r_len") && col("r_wl") && col("r_stop") && col("r_ttr"))
  }

  // ---------------------------------------------------------------- queries

  /** Decontamination of the training split against the `src0` "benchmark"
    * source via shared word-3-gram hashes.
    */
  def qDecontaminate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.ShingleHashes.register(s, n = 3)
    val docs = Sources.documents(s, dir)
      .withColumn("sh", graft.plans.ShingleHashes.shingleHashes($"text"))
    decontaminate(docs.filter($"source" =!= "src0"),
        docs.filter($"source" === "src0"), "doc_id", "sh")
      .orderBy($"doc_id")
  }

  /** Deterministic 80/10/10 split with per-split doc and char counts. */
  def qCorpusSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Sources.documents(s, dir)
      .withColumn("split", splitColumn($"doc_id"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"), sum($"n_chars").as("sum_chars"))
      .orderBy($"split")
  }

  /** Corpus-wide 10-word-chunk dedup: per doc, how many chunks survive and
    * the reassembled clean length (sum of chunk lengths + joining spaces).
    */
  def qParagraphDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Sources.documents(s, dir)
    val survivors = chunkDedupSurvivors(docs, "doc_id", "text")
    val perDocTotal = docs
      .select($"doc_id",
        ceil(size(split($"text", " ")) / lit(10.0)).cast("long").as("n_chunks"))
    val kept = survivors.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_kept"),
        (sum(length($"chunk")) + count(lit(1)) - 1).as("clean_len"))
    perDocTotal.join(kept, Seq("doc_id"), "left")
      .select($"doc_id", $"n_chunks",
        coalesce($"n_kept", lit(0L)).as("n_kept"),
        coalesce($"clean_len", lit(0L)).as("clean_len"))
      .orderBy($"doc_id")
  }

  /** PII scrub over text with deterministic synthesized PII (the corpus
    * itself is digit-free, so each doc gets an email/IP/card token derived
    * from its id — the scrubber and both engines' regex semantics are what
    * is under test).
    */
  def qPiiScrub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val synth = Sources.documents(s, dir)
      .withColumn("text", concat($"text",
        lit(" contact user"), $"doc_id",
        lit("@mail.example.com or 10.0."), pmod($"doc_id", lit(256)),
        lit(".7 card 4111111111111111.")))
    piiScrub(synth, "text")
      .select($"doc_id", $"n_emails", $"n_ips", $"n_cards",
        length($"scrubbed").cast("long").as("clean_len"))
      .orderBy($"doc_id")
  }

  /** Quality-filter chain report: per source, docs passing all rules plus
    * per-rule failure counts (the shape of a pipeline quality dashboard).
    */
  def qQualityFilterChain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    qualityFlags(Sources.documents(s, dir), "text")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"pass", 1L).otherwise(0L)).as("n_pass"),
        sum(when(!$"r_len", 1L).otherwise(0L)).as("fail_len"),
        sum(when(!$"r_wl", 1L).otherwise(0L)).as("fail_wl"),
        sum(when(!$"r_stop", 1L).otherwise(0L)).as("fail_stop"),
        sum(when(!$"r_ttr", 1L).otherwise(0L)).as("fail_ttr"))
      .orderBy($"source")
  }

  /** Domain-mixture sampling: weights derived from the source id, rates
    * capped at 1, membership by hash threshold — fully deterministic, so
    * the exact sampled counts are oracle-checkable. Per-source stats are
    * tiny and broadcast; the corpus itself is filtered in one scan.
    */
  def qDomainMix(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Sources.documents(s, dir)
    val counts = docs.groupBy($"source")
      .agg(count(lit(1)).as("n"))
      .withColumn("w",
        ((substring($"source", 4, 8).cast("int") % 4) + 1).cast("double"))
    val totals = counts.agg(sum($"w").as("tw"), sum($"n").as("total"))
    val rates = counts.crossJoin(broadcast(totals))
      .withColumn("rate", least(lit(1.0), $"w" / $"tw" * $"total" / $"n"))
      .withColumn("thr", floor($"rate" * 1000000).cast("long"))
      .select($"source", $"n", $"thr")
    val sampled = docs.join(broadcast(rates), "source")
      .filter(pmod(portableHash64(concat(lit("mix:"), $"doc_id")),
        lit(1000000)) < $"thr")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_sampled"))
    rates.join(sampled, Seq("source"), "left")
      .select($"source", $"n".as("n_docs"),
        coalesce($"n_sampled", lit(0L)).as("n_sampled"))
      .orderBy($"source")
  }

  /** Deterministic global shuffle (training order): rank docs by a salted
    * portable hash. At scale this is one range-partitioned sort (exactly
    * how training shards are written); the query exposes the head of the
    * order for the oracle.
    */
  def qGlobalShuffle(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val h = portableHash64(concat(lit("shuf:"), $"doc_id"))
    val head = Sources.documents(s, dir)
      .select($"doc_id", h.as("h"))
      .orderBy($"h", $"doc_id")
      .limit(50)
    // rank assigned after the distributed top-k — the window runs on 50 rows
    head.withColumn("rank",
        row_number().over(Window.orderBy($"h", $"doc_id")).cast("long"))
      .select($"rank", $"doc_id")
      .orderBy($"rank")
  }

  val queries: Map[String, Q] = Map(
    "q_decontaminate" -> qDecontaminate,
    "q_corpus_split" -> qCorpusSplit,
    "q_paragraph_dedup" -> qParagraphDedup,
    "q_pii_scrub" -> qPiiScrub,
    "q_quality_filter_chain" -> qQualityFilterChain,
    "q_domain_mix" -> qDomainMix,
    "q_global_shuffle" -> qGlobalShuffle)

  /** DuckDB twin of [[graft.functions.portableHash64]]. */
  private def md(e: String) = s"CAST('0x'||substr(md5($e),1,15) AS BIGINT)"
  private val W =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"
  private def shingleSql(w: String) =
    s"list_distinct(CASE WHEN len($w) >= 3 THEN " +
      s"list_transform(range(1, len($w)-1), i -> $w[i]||' '||$w[i+1]||' '||$w[i+2]) " +
      "ELSE [] END)"

  val oracles: Map[String, String] = Map(
    "q_decontaminate" ->
      s"""WITH g AS (
         |  SELECT doc_id, source,
         |    list_distinct(list_transform(${shingleSql(W)}, s -> ${md("s")})) AS sh
         |  FROM documents),
         |bench AS (
         |  SELECT DISTINCT unnest(sh) AS gr FROM g WHERE source = 'src0'),
         |train AS (
         |  SELECT doc_id, unnest(sh) AS gr FROM g WHERE source <> 'src0')
         |SELECT t.doc_id, COUNT(*) AS n_hits
         |FROM train t JOIN bench b ON t.gr = b.gr
         |GROUP BY t.doc_id ORDER BY t.doc_id""".stripMargin,
    "q_corpus_split" ->
      s"""SELECT CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val'
         |  ELSE 'test' END AS split,
         |  COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
         |FROM (SELECT n_chars, ${md("'split:'||doc_id")} % 100 AS b
         |      FROM documents)
         |GROUP BY split ORDER BY split""".stripMargin,
    "q_paragraph_dedup" ->
      """WITH base AS (
        |  SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        |idx AS (
        |  SELECT doc_id, l,
        |    unnest(range(0, CAST(ceil(len(l)/10.0) AS BIGINT))) AS cid
        |  FROM base),
        |ch AS (
        |  SELECT doc_id, cid,
        |    array_to_string(l[cid*10+1 : cid*10+10], ' ') AS chunk
        |  FROM idx),
        |ranked AS (
        |  SELECT doc_id, cid, chunk, ROW_NUMBER() OVER (
        |    PARTITION BY chunk ORDER BY doc_id, cid) AS rn FROM ch),
        |kept AS (
        |  SELECT doc_id, COUNT(*) AS n_kept,
        |    CAST(SUM(len(chunk)) + COUNT(*) - 1 AS BIGINT) AS clean_len
        |  FROM ranked WHERE rn = 1 GROUP BY doc_id),
        |totals AS (
        |  SELECT doc_id, CAST(ceil(len(l)/10.0) AS BIGINT) AS n_chunks
        |  FROM base)
        |SELECT t.doc_id, t.n_chunks,
        |  COALESCE(k.n_kept, 0) AS n_kept,
        |  COALESCE(k.clean_len, 0) AS clean_len
        |FROM totals t LEFT JOIN kept k ON t.doc_id = k.doc_id
        |ORDER BY t.doc_id""".stripMargin,
    "q_pii_scrub" ->
      """WITH synth AS (
        |  SELECT doc_id,
        |    text || ' contact user' || doc_id || '@mail.example.com or 10.0.'
        |      || (doc_id % 256) || '.7 card 4111111111111111.' AS t
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(len(regexp_extract_all(t, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(t, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(t, '\b\d{13,19}\b')) AS BIGINT) AS n_cards,
        |  CAST(len(regexp_replace(regexp_replace(regexp_replace(t,
        |    '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
        |    '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |    '\b\d{13,19}\b', '<CARD>', 'g')) AS BIGINT) AS clean_len
        |FROM synth ORDER BY doc_id""".stripMargin,
    "q_quality_filter_chain" ->
      """WITH m AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw,
        |    CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS ndw,
        |    CAST(len(text) AS BIGINT) AS nc,
        |    (CASE WHEN contains(' '||text||' ', ' the ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(' '||text||' ', ' a ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(' '||text||' ', ' of ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(' '||text||' ', ' and ') THEN 1 ELSE 0 END +
        |     CASE WHEN contains(' '||text||' ', ' to ') THEN 1 ELSE 0 END)
        |      AS n_stop
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |    (nw BETWEEN 20 AND 90) AS r_len,
        |    (CAST(nc - (nw - 1) AS DOUBLE)/nw BETWEEN 3.0 AND 8.0) AS r_wl,
        |    (n_stop >= 2) AS r_stop,
        |    (CAST(ndw AS DOUBLE)/nw >= 0.35) AS r_ttr
        |  FROM m)
        |SELECT source, COUNT(*) AS n_docs,
        |  CAST(SUM(CASE WHEN r_len AND r_wl AND r_stop AND r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
        |  CAST(SUM(CASE WHEN NOT r_len THEN 1 ELSE 0 END) AS BIGINT) AS fail_len,
        |  CAST(SUM(CASE WHEN NOT r_wl THEN 1 ELSE 0 END) AS BIGINT) AS fail_wl,
        |  CAST(SUM(CASE WHEN NOT r_stop THEN 1 ELSE 0 END) AS BIGINT) AS fail_stop,
        |  CAST(SUM(CASE WHEN NOT r_ttr THEN 1 ELSE 0 END) AS BIGINT) AS fail_ttr
        |FROM f GROUP BY source ORDER BY source""".stripMargin,
    "q_domain_mix" ->
      s"""WITH counts AS (
         |  SELECT source, COUNT(*) AS n,
         |    CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) AS w
         |  FROM documents GROUP BY source),
         |t AS (SELECT CAST(SUM(w) AS DOUBLE) AS tw,
         |  CAST(SUM(n) AS BIGINT) AS total FROM counts),
         |r AS (
         |  SELECT source, n,
         |    CAST(floor(least(1.0, w/tw*total/n)*1000000) AS BIGINT) AS thr
         |  FROM counts, t),
         |sel AS (
         |  SELECT d.source, COUNT(*) AS ns
         |  FROM documents d JOIN r ON d.source = r.source
         |  WHERE ${md("'mix:'||doc_id")} % 1000000 < r.thr
         |  GROUP BY d.source)
         |SELECT r.source, CAST(r.n AS BIGINT) AS n_docs,
         |  COALESCE(sel.ns, 0) AS n_sampled
         |FROM r LEFT JOIN sel ON r.source = sel.source
         |ORDER BY r.source""".stripMargin,
    "q_global_shuffle" ->
      s"""SELECT rank, doc_id FROM (
         |  SELECT doc_id, ROW_NUMBER() OVER (
         |    ORDER BY ${md("'shuf:'||doc_id")}, doc_id) AS rank
         |  FROM documents)
         |WHERE rank <= 50 ORDER BY rank""".stripMargin)
}
