package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Sources

/** Distributed PCA power iteration over the embedding corpus — the
  * "what direction dominates my vectors" analysis (drift detection,
  * whitening, spectral diagnostics) without any linear-algebra library:
  * v ← normalize(Σ_rows (xᵀv)·x), three rounds.
  *
  * Integer-exact cross-engine (the [[Graph.pageRank]] discipline):
  * embeddings quantize to `floor(x·1000)` (identical doubles → identical
  * floors in both engines), every dot/accumulation is BIGINT/DECIMAL(38),
  * and the per-round normalization scales to ∞-norm 10⁶ with truncating
  * division (negatives handled by explicit sign-split so truncation
  * semantics agree). The DuckDB oracle unrolls the three rounds with
  * list ops — bit-identical output.
  *
  * Scale shape: ONE aggregate per round: each row contributes dot·x_d to
  * 64 per-dimension sums (posexplode + map-side-combining groupBy on the
  * 64-value dim key); the 64-row result collects to the driver for the
  * next round's literal (the k-means/ADC-table pattern). The quantized
  * corpus materializes once.
  */
object Spectral {

  private val QScale = 1000L   // embedding quantization
  private val VScale = 1000000L // eigenvector ∞-norm per round

  def qPowerIteration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dims = 64
    val iters = 3
    val xq = Sources.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => floor(x.cast("double") * QScale)
          .cast("long")).as("q"))
      .localCheckpoint(true)
    var v: Array[Long] =
      Array.tabulate(dims)(d => if (d == 0) VScale else 0L)
    for (_ <- 1 to iters) {
      val vLit = array(v.map(lit): _*)
      val withDot = xq.select($"q",
        aggregate(zip_with($"q", vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("dot"))
      val acc = withDot
        .select(posexplode($"q").as(Seq("d", "qd")), $"dot")
        .groupBy($"d")
        .agg(sum(($"dot" * $"qd").cast("decimal(38,0)")).as("acc"))
        .collect()
        .map(r => r.getInt(0) -> BigInt(r.getDecimal(1).toBigInteger))
        .toMap
      val m = (0 until dims).map(d => acc(d).abs).max.max(BigInt(1))
      v = Array.tabulate(dims) { d =>
        val a = acc(d)
        val scaled =
          if (a >= 0) (a * VScale) / m
          else -(((-a) * VScale) / m)
        scaled.toLong
      }
    }
    val out = v.zipWithIndex.map { case (x, d) => (d.toLong + 1, x) }
    s.createDataFrame(out.toSeq).toDF("dim", "v")
      .orderBy($"dim")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_power_iteration" -> qPowerIteration)

  private def iterSql(r: Int): String =
    s"""dot$r AS (
       |  SELECT q,
       |    list_sum(list_transform(range(1, 65), d -> q[d] * v[d])) AS dot
       |  FROM xq, v${r - 1}),
       |acc$r AS (
       |  SELECT dd.d, SUM(CAST(dot * q[dd.d] AS DECIMAL(38,0))) AS acc
       |  FROM dot$r, dims dd GROUP BY dd.d),
       |m$r AS (
       |  -- HUGEINT, not DECIMAL: DuckDB's // on DECIMAL goes through a
       |  -- double and loses integer exactness above 2^53
       |  SELECT GREATEST(MAX(ABS(CAST(acc AS HUGEINT))), 1) AS m
       |  FROM acc$r),
       |v$r AS (
       |  SELECT list(CASE WHEN acc >= 0
       |      THEN CAST(CAST(acc AS HUGEINT) * 1000000 // m AS BIGINT)
       |      ELSE -CAST(CAST(-acc AS HUGEINT) * 1000000 // m AS BIGINT)
       |    END ORDER BY d) AS v
       |  FROM acc$r, m$r)""".stripMargin

  val oracles: Map[String, String] = Map(
    "q_power_iteration" ->
      s"""WITH xq AS (
         |  SELECT vec_id, list_transform(embedding,
         |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS q
         |  FROM embeddings),
         |dims AS (SELECT UNNEST(range(1, 65)) AS d),
         |v0 AS (
         |  SELECT list_transform(range(1, 65),
         |    d -> CASE WHEN d = 1 THEN 1000000 ELSE 0 END) AS v),
         |${(1 to 3).map(iterSql).mkString(",\n")}
         |SELECT CAST(dd.d AS BIGINT) AS dim, CAST(v[dd.d] AS BIGINT) AS v
         |FROM v3, dims dd ORDER BY dim""".stripMargin)
}
