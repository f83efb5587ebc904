package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Market-basket analytics: frequent item pairs + association rules
  * (support / confidence / lift) over order baskets — the co-occurrence
  * mining shape (FP-growth's first two levels done relationally).
  *
  * Scale shape: downward closure prunes first — only items that are
  * frequent on their own (one tiny aggregate, broadcast) enter the
  * pair self-join, so the per-basket pair fan-out is bounded by the
  * frequent-item subset, never the raw basket width. The pair join is
  * per-basket (equi-join on the order key), not a corpus cross product.
  * Confidence/lift are scaled-integer (ppm, floored) so the gate never
  * rides on an IEEE quotient.
  */
object Itemsets {

  /** Frequent brand pairs with association stats, minsup = 100 baskets. */
  def qItemsets(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val minsup = 100L
    // basket = distinct brands per order. r15: the basket count joins
    // back as a broadcast 1-row aggregate instead of an eager driver
    // count() — the whole query is ONE lazy plan, so the repeated
    // basket-chain subtrees dedupe through ReusedExchange instead of
    // re-running for a separate count job. (A persist was tried first
    // and REVERTED: caching `baskets` flipped the pair self-join's
    // strategy and cost 150 s of task time at sf0.1 vs ~5 s lazy.)
    val baskets = Sources.lineitem(s, dir)
      .join(Sources.part(s, dir), $"l_partkey" === $"p_partkey")
      .select($"l_orderkey".as("basket"), $"p_brand".as("item"))
      .distinct()
    val nb = baskets.select($"basket").distinct()
      .agg(count(lit(1)).as("n_baskets"))
    // downward closure: frequent single items, broadcast back
    val freq1 = baskets.groupBy($"item")
      .agg(count(lit(1)).as("item_n"))
      .where($"item_n" >= minsup)
    val kept = baskets.join(broadcast(freq1), "item")
    val pairs = kept.as("a")
      .join(kept.as("b"), col("a.basket") === col("b.basket") &&
        col("a.item") < col("b.item"))
      .groupBy(col("a.item").as("item_a"), col("b.item").as("item_b"))
      .agg(count(lit(1)).as("pair_n"))
      .where($"pair_n" >= minsup)
    pairs
      .join(broadcast(freq1.withColumnRenamed("item", "item_a")
        .withColumnRenamed("item_n", "n_a")), "item_a")
      .join(broadcast(freq1.withColumnRenamed("item", "item_b")
        .withColumnRenamed("item_n", "n_b")), "item_b")
      .crossJoin(broadcast(nb))
      .select($"item_a", $"item_b", $"pair_n",
        expr("(pair_n * 1000000L) div n_a").as("conf_ab_ppm"),
        expr("(pair_n * 1000000L) div n_b").as("conf_ba_ppm"),
        expr("(pair_n * n_baskets * 1000000L) div (n_a * n_b)")
          .as("lift_ppm"))
      .orderBy($"item_a", $"item_b")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_itemsets" -> qItemsets)

  val oracles: Map[String, String] = Map(
    "q_itemsets" ->
      """WITH baskets AS (
        |  SELECT DISTINCT l_orderkey AS basket, p_brand AS item
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |nb AS (SELECT COUNT(DISTINCT basket) AS n_baskets FROM baskets),
        |freq1 AS (
        |  SELECT item, COUNT(*) AS item_n FROM baskets
        |  GROUP BY item HAVING COUNT(*) >= 100),
        |kept AS (SELECT b.basket, b.item FROM baskets b JOIN freq1 USING (item)),
        |pairs AS (
        |  SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS pair_n
        |  FROM kept a JOIN kept b
        |    ON a.basket = b.basket AND a.item < b.item
        |  GROUP BY 1, 2 HAVING COUNT(*) >= 100)
        |SELECT item_a, item_b, pair_n,
        |  (pair_n * 1000000) // fa.item_n AS conf_ab_ppm,
        |  (pair_n * 1000000) // fb.item_n AS conf_ba_ppm,
        |  (pair_n * nb.n_baskets * 1000000) // (fa.item_n * fb.item_n)
        |    AS lift_ppm
        |FROM pairs
        |JOIN freq1 fa ON pairs.item_a = fa.item
        |JOIN freq1 fb ON pairs.item_b = fb.item
        |CROSS JOIN nb
        |ORDER BY item_a, item_b""".stripMargin)
}
