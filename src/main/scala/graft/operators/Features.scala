package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.sources.Sources

/** ML feature-engineering operators: equi-depth quantile discretization
  * and smoothed target encoding — the tabular-feature-pipeline shapes.
  *
  * Scale shapes: binning computes boundaries with ONE percentile
  * aggregate per key (tiny result, broadcast back) and assigns bins in a
  * pure projection — no global sort, no ntile over a single partition;
  * target encoding is one grouped aggregate plus one broadcast of the
  * global prior. Every double derives from exact decimal sums, so both
  * engines walk identical IEEE values.
  */
object Features {

  /** Equi-depth quartile binning of event values per event_type:
    * boundaries from exact interpolated percentiles, bins assigned by
    * comparison against the broadcast boundary row.
    */
  def qQuantileBin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Sources.events(s, dir).select($"event_type", $"value")
    val bounds = ev.groupBy($"event_type").agg(
      expr("percentile(value, 0.25)").as("q1"),
      expr("percentile(value, 0.5)").as("q2"),
      expr("percentile(value, 0.75)").as("q3"))
    val bin = when($"value" <= $"q1", 0)
      .when($"value" <= $"q2", 1)
      .when($"value" <= $"q3", 2)
      .otherwise(3)
    ev.join(broadcast(bounds), "event_type")
      .withColumn("bin", bin)
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"), min($"value").as("vmin"),
        max($"value").as("vmax"))
      .orderBy($"event_type", $"bin")
  }

  /** Smoothed target encoding of part brands against lineitem quantity:
    * enc = (sum_y + prior·m) / (n + m) with m = 50 and the global mean
    * as prior — the high-cardinality-categorical encoder. Exact decimal
    * sums make the final IEEE divisions bit-identical cross-engine.
    */
  def qTargetEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val m = 50
    val li = Sources.lineitem(s, dir)
      .join(Sources.part(s, dir), $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_quantity")
    val prior = li.agg((xsum($"l_quantity") / count(lit(1))).as("prior"))
    li.groupBy($"p_brand")
      .agg(count(lit(1)).as("n"), xsum($"l_quantity").as("sum_y"))
      .crossJoin(broadcast(prior))
      .select($"p_brand", $"n",
        (($"sum_y" + $"prior" * m) / ($"n" + m)).as("enc"))
      .orderBy($"p_brand")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_quantile_bin" -> qQuantileBin,
    "q_target_encode" -> qTargetEncode)

  private def dsum(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(27,6))) AS DOUBLE)"

  val oracles: Map[String, String] = Map(
    "q_quantile_bin" ->
      """WITH ev AS (SELECT event_type, value FROM events),
        |bounds AS (
        |  SELECT event_type,
        |    quantile_cont(value, 0.25) AS q1,
        |    quantile_cont(value, 0.5) AS q2,
        |    quantile_cont(value, 0.75) AS q3
        |  FROM ev GROUP BY event_type)
        |SELECT e.event_type,
        |  CASE WHEN value <= q1 THEN 0 WHEN value <= q2 THEN 1
        |       WHEN value <= q3 THEN 2 ELSE 3 END AS bin,
        |  COUNT(*) AS n, MIN(value) AS vmin, MAX(value) AS vmax
        |FROM ev e JOIN bounds b ON e.event_type = b.event_type
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q_target_encode" ->
      s"""WITH li AS (
         |  SELECT p_brand, l_quantity
         |  FROM lineitem JOIN part ON l_partkey = p_partkey),
         |prior AS (
         |  SELECT ${dsum("l_quantity")} / COUNT(*) AS prior FROM li)
         |SELECT p_brand, COUNT(*) AS n,
         |  (${dsum("l_quantity")} + prior * 50) / (COUNT(*) + 50) AS enc
         |FROM li CROSS JOIN prior
         |GROUP BY p_brand, prior ORDER BY p_brand""".stripMargin)
}
