package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}
import graft.functions._
import graft.sources.Sources

/** Frequency-domain operators: Misra-Gries heavy hitters over a token
  * stream, and Bloom-filter-pruned joins (build a mergeable bitset over
  * the small side's keys, drop probe rows before they reach the shuffle).
  */
object Freq {

  // ------------------------------------------------------------ bloom filter

  /** Build a Bloom filter over `keys` (a long column) as ONE row holding an
    * array<long> of `mBits/64` bit words. Entirely declarative and
    * mergeable: per-key bit positions come from `kh` seeded xxhash64
    * probes, partial bitsets OR together map-side (`bit_or` aggregate),
    * and the final assembly is a tiny `mBits/64`-entry map→array fold.
    * At 100 TB the build is one scan of the (small) side + a shuffle of
    * at most `mBits/64` rows.
    */
  def buildBloom(keys: DataFrame, keyCol: String, mBits: Int, kh: Int): DataFrame = {
    require(mBits % 64 == 0, "mBits must be a multiple of 64")
    val nWords = mBits / 64
    val idx = explode(array((0 until kh).map(j =>
      pmod(xxhash64(lit(j), col(keyCol)), lit(mBits))): _*)).as("_idx")
    keys
      .select(idx)
      .select((col("_idx") / 64).cast(IntegerType).as("_w"),
        call_function("shiftleft", lit(1L),
          pmod(col("_idx"), lit(64)).cast(IntegerType)).as("_bit"))
      .groupBy(col("_w"))
      .agg(expr("bit_or(_bit)").as("_bits"))
      .agg(map_from_entries(collect_list(struct(col("_w"), col("_bits"))))
        .as("_m"))
      .select(transform(sequence(lit(0), lit(nWords - 1)),
        i => coalesce(element_at(col("_m"), i), lit(0L))).as("bloom"))
  }

  /** Membership probe against a bloom array column: true if all `kh` probe
    * bits are set. Composed from codegen'd built-ins — no UDF. False
    * positives possible (callers re-verify with the real join), false
    * negatives impossible, so pre-filtering with this preserves exact join
    * results while pruning the probe side before the shuffle.
    */
  def mightContain(bloom: Column, key: Column, mBits: Int, kh: Int): Column =
    (0 until kh).map { j =>
      val idx = pmod(xxhash64(lit(j), key), lit(mBits))
      val word = element_at(bloom, (idx / 64).cast(IntegerType) + 1)
      val bit = pmod(idx, lit(64)).cast(IntegerType)
      (call_function("shiftright", word, bit).bitwiseAND(lit(1L))) === lit(1L)
    }.reduce(_ && _)

  // ---------------------------------------------------------------- queries

  /** Bloom-pruned semi join: orders of high-balance customers. The bloom
    * bitset (one broadcast row) eliminates most orders BEFORE the join
    * shuffle; survivors are verified by the exact (broadcast) semi join,
    * so the result is identical to the plain join — the oracle runs the
    * plain SQL form.
    */
  def qBloomJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val rich = Sources.customer(s, dir)
      .filter($"c_acctbal" > 9000.0)
      .select($"c_custkey")
    val bloom = buildBloom(rich, "c_custkey", mBits = 1 << 13, kh = 3)
    val orders = Sources.orders(s, dir)
    val pruned = orders
      .crossJoin(broadcast(bloom))
      .filter(mightContain($"bloom", $"o_custkey", mBits = 1 << 13, kh = 3))
      .drop("bloom")
    pruned
      .join(rich.hint("broadcast"), $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), xsum($"o_totalprice").as("revenue"))
      .orderBy($"o_orderpriority")
  }

  /** Misra-Gries heavy hitters over the corpus word stream, oracled via
    * the MG guarantee: every word with exact count strictly above
    * N/(k+1) MUST be tracked by the sketch. The query emits exactly those
    * words (exact counts, both engines) plus the sketch-membership bit —
    * any guarantee violation flips a `true` to `false` and fails the hash
    * compare.
    */
  def qHeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 64
    graft.plans.MisraGriesAgg.register(s, k)
    val words = Sources.documents(s, dir)
      .select(explode(wordTokens($"text")).as("word"))
    val sketch = words.agg(
      graft.plans.MisraGriesAgg.misraGries($"word").as("mg"),
      count(lit(1)).as("total"))
    words.groupBy($"word").agg(count(lit(1)).as("n_word"))
      .crossJoin(broadcast(sketch))
      .filter($"n_word" * (k + 1) > $"total")
      .select($"word", $"n_word",
        array_contains(map_keys($"mg"), $"word").as("in_sketch"))
      .orderBy($"word")
  }

  /** Count-Min point-frequency estimates over the corpus word stream,
    * oracled via BOTH sketch guarantees per word: the estimate never
    * undercounts (hard invariant) and overshoots by at most 2N/width
    * (holds with prob ≥ 1-2^-depth per key; deterministic here since the
    * seeds are fixed). One broadcast sketch row serves every lookup.
    */
  def qCountMin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val depth = 4; val width = 4096
    graft.plans.CountMinAgg.register(s, depth, width)
    val words = Sources.documents(s, dir)
      .select(explode(wordTokens($"text")).as("word"))
    val sketch = words.agg(
      graft.plans.CountMinAgg.countMin($"word").as("cm"),
      count(lit(1)).as("total"))
    words.groupBy($"word").agg(count(lit(1)).as("n_word"))
      .crossJoin(broadcast(sketch))
      .withColumn("est",
        graft.plans.CountMinAgg.estimate($"cm", $"word", depth, width))
      .select($"word", $"n_word",
        ($"est" >= $"n_word").as("ok_lower"),
        ($"est" <= $"n_word" + expr(s"total * 2 div $width")).as("ok_upper"))
      .orderBy($"word")
  }

  /** Per-group heavy hitters: one MG sketch PER SOURCE via an ordinary
    * groupBy — keyed sketch state, the "state computation per key" shape
    * with a native mergeable aggregate. The guarantee is checked within
    * each group against that group's own N.
    */
  def qHeavyHittersBySource(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val k = 32
    graft.plans.MisraGriesAgg.register(s, k)
    val words = Sources.documents(s, dir)
      .select($"source", explode(wordTokens($"text")).as("word"))
    val sketches = words.groupBy($"source").agg(
      graft.plans.MisraGriesAgg.misraGries($"word").as("mg"),
      count(lit(1)).as("total"))
    words.groupBy($"source", $"word").agg(count(lit(1)).as("n_word"))
      .join(broadcast(sketches), "source")
      .filter($"n_word" * (k + 1) > $"total")
      .select($"source", $"word", $"n_word",
        array_contains(map_keys($"mg"), $"word").as("in_sketch"))
      .orderBy($"source", $"word")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_bloom_join" -> qBloomJoin,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_heavy_hitters_by_source" -> qHeavyHittersBySource,
    "q_countmin" -> qCountMin)

  private val W =
    "list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), x -> x <> '')"

  val oracles: Map[String, String] = Map(
    "q_bloom_join" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(27,6))) AS DOUBLE) AS revenue
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer WHERE c_acctbal > 9000.0)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q_heavy_hitters" ->
      s"""WITH w AS (SELECT unnest($W) AS word FROM documents),
         |tot AS (SELECT COUNT(*) AS total FROM w),
         |c AS (SELECT word, COUNT(*) AS n_word FROM w GROUP BY word)
         |SELECT word, n_word, true AS in_sketch
         |FROM c, tot WHERE n_word * 65 > total
         |ORDER BY word""".stripMargin,
    "q_heavy_hitters_by_source" ->
      s"""WITH w AS (SELECT source, unnest($W) AS word FROM documents),
         |tot AS (SELECT source, COUNT(*) AS total FROM w GROUP BY source),
         |c AS (SELECT source, word, COUNT(*) AS n_word
         |      FROM w GROUP BY source, word)
         |SELECT c.source, word, n_word, true AS in_sketch
         |FROM c JOIN tot ON c.source = tot.source
         |WHERE n_word * 33 > total
         |ORDER BY c.source, word""".stripMargin,
    "q_countmin" ->
      s"""WITH w AS (SELECT unnest($W) AS word FROM documents)
         |SELECT word, COUNT(*) AS n_word,
         |  true AS ok_lower, true AS ok_upper
         |FROM w GROUP BY word ORDER BY word""".stripMargin)
}
