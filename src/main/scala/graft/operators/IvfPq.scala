package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions._
import graft.plans.PqEncode
import graft.sources.Sources

/** IVF-PQ: the billion-scale ANN composition — a coarse quantizer prunes
  * the search to `nprobe` of K buckets, and candidates are scored against
  * the query through a tiny per-bucket ADC (asymmetric distance
  * computation) lookup table over their product-quantized RESIDUALS, so
  * the probe never touches a raw vector.
  *
  * Everything is integer arithmetic over int8 codes (cf. reference
  * `lib/wallaroo` has no ANN surface — this is part of the training-data
  * extension family): coarse training is [[Pq.trainBooks]] with m=1,
  * residual codebooks are the same trainer over `codes − coarse_centroid`,
  * and the ADC tables are driver-side integer L2 between the query
  * residual and each (subspace, centroid) — so the full index build +
  * probe replays exactly in the SQL oracle.
  *
  * Scale shape: codebooks and ADC tables are literals (K + m·k
  * subvectors); index build is two scans (assign+residual, encode) with
  * map-side-combining training aggregates; the probe scans only the
  * `nprobe`/K fraction (with a bucket-partitioned layout, pruned at the
  * source) and moves topK rows through the final sort. No raw-vector
  * shuffle anywhere.
  */
object IvfPq {

  private def l2(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val x = a(i) - b(i); d += x * x; i += 1 }
    d
  }

  /** Build the IVF-PQ index over `emb` and run one top-k probe for the
    * vector `queryId` (excluded from candidates, not from training).
    * Returns (rank, vec_id, bucket, adc_dist).
    */
  def search(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
      coarseK: Int, coarseIters: Int, m: Int, pqK: Int, pqIters: Int,
      queryId: Long, nprobe: Int, topK: Int): DataFrame = {
    val spark = emb.sparkSession
    val subDim = dim / m
    val coded = Pq.quantizeCodes(emb, idCol, vecCol, dim)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // 1. coarse quantizer: the codebook trainer with a single subspace
      val coarse: Seq[(Long, Array[Long])] =
        Pq.trainBooks(coded, dim, 1, coarseK, coarseIters, salt = "ivf")(0)
      val cmap = coarse.toMap
      // 2. bucket assignment + residual: one scan, zero shuffle (the
      //    centroids are literals; the when-chain picks the assigned
      //    bucket's centroid for the subtraction)
      PqEncode.register(spark, Seq(coarse), dim, "ivfpq_coarse")
      val resExpr = coarse.sortBy(_._1).foldLeft(
        lit(null).cast("array<bigint>")) { case (acc, (cid, cent)) =>
        when(col("bucket") === cid,
          zip_with(col("codes"), typedLit(cent.toSeq), (a, b) => a - b))
          .otherwise(acc)
      }
      val assigned = coded
        .withColumn("bucket", element_at(
          PqEncode.encode(col("codes"), "ivfpq_coarse"), 1).getField("cid"))
        .withColumn("res", resExpr)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // 3. product-quantization codebooks over the residuals
        val books = Pq.trainBooks(
          assigned.select(col("vec_id"), col("res").as("codes")),
          subDim, m, pqK, pqIters, salt = "pqr")
        // 4. query prep (driver-side, all integer): probe buckets by
        //    coarse distance; per probed bucket, the ADC lookup table
        //    adc(b)(sub)(cid) = L2(query_residual_b[sub], books(sub)(cid))
        val qcodes = coded.filter(col("vec_id") === queryId)
          .head.getSeq[Long](1).toArray
        val probes: Seq[Long] = coarse
          .map { case (cid, c) => (l2(qcodes, c), cid) }
          .sorted.take(nprobe).map(_._2)
        val lut: Map[Long, Seq[Seq[Long]]] = probes.map { b =>
          val cent = cmap(b)
          val qres = Array.tabulate(dim)(i => qcodes(i) - cent(i))
          b -> Seq.tabulate(m) { s0 =>
            books(s0).sortBy(_._1).map { case (_, c) =>
              l2(qres.slice(s0 * subDim, (s0 + 1) * subDim), c)
            }
          }
        }.toMap
        // 5. probe: prune to the nprobe buckets, PQ-encode each
        //    candidate's residual, and sum ADC table entries — a pure
        //    projection over the probed fraction + a topK sort
        PqEncode.register(spark, books.toSeq, subDim, "ivfpq_sub")
        val lutCol = probes.foldLeft(
          lit(null).cast("array<array<bigint>>")) { case (acc, b) =>
          when(col("bucket") === b, typedLit(lut(b))).otherwise(acc)
        }
        val adc = aggregate(
          PqEncode.encode(col("res"), "ivfpq_sub"), lit(0L),
          (acc, e) => acc + element_at(
            element_at(col("_lut"), (e.getField("sub") + 1).cast("int")),
            (e.getField("cid") + 1).cast("int")))
        val w = org.apache.spark.sql.expressions.Window
          .orderBy(col("adc_dist"), col("vec_id"))
        assigned
          .filter(col("bucket").isin(probes: _*) &&
            col("vec_id") =!= queryId)
          .withColumn("_lut", lutCol)
          .withColumn("adc_dist", adc)
          .select(col("vec_id"), col("bucket"), col("adc_dist"))
          .orderBy(col("adc_dist"), col("vec_id"))
          .limit(topK)
          .withColumn("rank", row_number().over(w).cast("long"))
          .select(col("rank"), col("vec_id"), col("bucket"), col("adc_dist"))
          .localCheckpoint(true)
      } finally assigned.unpersist()
    } finally coded.unpersist()
  }

  // ---------------------------------------------------------------- queries

  /** IVF-PQ probe on the embeddings table: K=4 coarse buckets (1 Lloyd
    * round), 4×16-dim residual subspaces with 4 centroids each, probe the
    * 2 nearest buckets for vec_id 7, top-10 by ADC distance.
    */
  def qAnnIvfPq(s: SparkSession, dir: String): DataFrame =
    search(Sources.embeddings(s, dir), "vec_id", "embedding", dim = 64,
      coarseK = 4, coarseIters = 1, m = 4, pqK = 4, pqIters = 1,
      queryId = 7L, nprobe = 2, topK = 10)

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_ann_ivfpq" -> qAnnIvfPq)

  val oracles: Map[String, String] = Map("q_ann_ivfpq" -> ivfPqOracle)

  private def md(e: String) = portableHash64Sql(e)

  /** The full IVF-PQ pipeline in SQL: int8 codes → coarse codebook (hash
    * seeds + one floor-mean Lloyd round) → bucket assignment + residuals →
    * per-subspace residual codebooks (same trainer shape) → probe-bucket
    * selection → candidate encode → ADC distance → top-10.
    */
  private def ivfPqOracle: String = {
    // integer L2 between two 1-based list slices (DuckDB lambdas)
    def dist(n: Int, a: String, aOff: Int, b: String): String =
      s"CAST(list_sum(list_transform(range(1, ${n + 1}), i -> " +
        s"($a[i + $aOff] - $b[i]) * ($a[i + $aOff] - $b[i]))) AS BIGINT)"
    def residSub(s0: Int): String = {
      val lo = s0 * 16 + 1; val hi = s0 * 16 + 16
      s"""rs$s0 AS (SELECT vec_id, bucket, r[$lo:$hi] AS sc FROM resid),
         |rseed$s0 AS (
         |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS BIGINT) AS cid,
         |    sc AS cent
         |  FROM (SELECT vec_id, sc, ${md(s"'pqr$s0:'||vec_id")} AS h
         |        FROM rs$s0 ORDER BY h, vec_id LIMIT 4)),
         |ra$s0 AS (
         |  SELECT vec_id, sc, cid, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY d, cid) AS rn
         |  FROM (SELECT s.vec_id, s.sc, p.cid, ${dist(16, "s.sc", 0, "p.cent")} AS d
         |        FROM rs$s0 s CROSS JOIN rseed$s0 p)),
         |ru$s0 AS (
         |  SELECT cid, j, SUM(sc[j]) AS sm, COUNT(*) AS n
         |  FROM (SELECT cid, sc, unnest(range(1, 17)) AS j
         |        FROM ra$s0 WHERE rn = 1)
         |  GROUP BY cid, j),
         |rm$s0 AS (SELECT cid, list(sm // n ORDER BY j) AS cent
         |          FROM ru$s0 GROUP BY cid),
         |rcb$s0 AS (
         |  SELECT p.cid, COALESCE(m.cent, p.cent) AS cent
         |  FROM rseed$s0 p LEFT JOIN rm$s0 m ON p.cid = m.cid),
         |ce$s0 AS (
         |  SELECT vec_id, bucket, cid, ROW_NUMBER() OVER (
         |    PARTITION BY vec_id ORDER BY d, cid) AS rn
         |  FROM (SELECT s.vec_id, s.bucket, p.cid, ${dist(16, "s.sc", 0, "p.cent")} AS d
         |        FROM (SELECT vec_id, bucket, sc FROM rs$s0
         |              WHERE bucket IN (SELECT bucket FROM qprobe)
         |                AND vec_id <> 7) s
         |        CROSS JOIN rcb$s0 p)),
         |adc$s0 AS (
         |  SELECT e.vec_id, e.bucket, ${dist(16, "q.qr", s0 * 16, "p.cent")} AS d
         |  FROM ce$s0 e
         |  JOIN rcb$s0 p ON e.cid = p.cid
         |  JOIN qres q ON e.bucket = q.bucket
         |  WHERE e.rn = 1)""".stripMargin
    }
    val subChains = (0 until 4).map(residSub).mkString(",\n")
    val adcUnion = (0 until 4).map(s0 => s"SELECT * FROM adc$s0")
      .mkString(" UNION ALL ")
    s"""WITH dims AS (
       |  SELECT i, MIN(CAST(v[i] AS DOUBLE)) AS mn, MAX(CAST(v[i] AS DOUBLE)) AS mx
       |  FROM (SELECT embedding AS v FROM embeddings)
       |    CROSS JOIN (SELECT unnest(range(1, 65)) AS i)
       |  GROUP BY i),
       |rng AS (
       |  SELECT list(mn ORDER BY i) AS mns, list(mx ORDER BY i) AS mxs
       |  FROM dims),
       |codes AS (
       |  SELECT vec_id, list_transform(range(1, 65), i ->
       |    CAST(CASE WHEN mxs[i] = mns[i] THEN 0.0 ELSE
       |      least(255.0, floor((CAST(v[i] AS DOUBLE) - mns[i])
       |        / (mxs[i] - mns[i]) * 255.0)) END AS BIGINT)) AS c
       |  FROM (SELECT vec_id, embedding AS v FROM embeddings) CROSS JOIN rng),
       |cseed AS (
       |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY h, vec_id) - 1 AS BIGINT) AS cid,
       |    c AS cent
       |  FROM (SELECT vec_id, c, ${md("'ivf0:'||vec_id")} AS h
       |        FROM codes ORDER BY h, vec_id LIMIT 4)),
       |ca AS (
       |  SELECT vec_id, c, cid, ROW_NUMBER() OVER (
       |    PARTITION BY vec_id ORDER BY d, cid) AS rn
       |  FROM (SELECT s.vec_id, s.c, p.cid, ${dist(64, "s.c", 0, "p.cent")} AS d
       |        FROM codes s CROSS JOIN cseed p)),
       |cu AS (
       |  SELECT cid, j, SUM(c[j]) AS sm, COUNT(*) AS n
       |  FROM (SELECT cid, c, unnest(range(1, 65)) AS j FROM ca WHERE rn = 1)
       |  GROUP BY cid, j),
       |cm AS (SELECT cid, list(sm // n ORDER BY j) AS cent FROM cu GROUP BY cid),
       |ccb AS (
       |  SELECT p.cid, COALESCE(m.cent, p.cent) AS cent
       |  FROM cseed p LEFT JOIN cm m ON p.cid = m.cid),
       |fa AS (
       |  SELECT vec_id, c, cid, ROW_NUMBER() OVER (
       |    PARTITION BY vec_id ORDER BY d, cid) AS rn
       |  FROM (SELECT s.vec_id, s.c, p.cid, ${dist(64, "s.c", 0, "p.cent")} AS d
       |        FROM codes s CROSS JOIN ccb p)),
       |resid AS (
       |  SELECT f.vec_id, f.cid AS bucket,
       |    list_transform(range(1, 65), i -> f.c[i] - p.cent[i]) AS r
       |  FROM fa f JOIN ccb p ON f.cid = p.cid WHERE f.rn = 1),
       |qc AS (SELECT c FROM codes WHERE vec_id = 7),
       |qprobe AS (
       |  SELECT cid AS bucket, cent
       |  FROM (SELECT p.cid, p.cent, ROW_NUMBER() OVER (ORDER BY d, p.cid) AS pr
       |        FROM (SELECT p.cid, p.cent, ${dist(64, "q.c", 0, "p.cent")} AS d
       |              FROM ccb p CROSS JOIN qc q) p)
       |  WHERE pr <= 2),
       |qres AS (
       |  SELECT p.bucket, list_transform(range(1, 65), i -> q.c[i] - p.cent[i]) AS qr
       |  FROM qprobe p CROSS JOIN qc q),
       |$subChains,
       |tot AS (
       |  SELECT vec_id, bucket, CAST(SUM(d) AS BIGINT) AS adc_dist
       |  FROM ($adcUnion) GROUP BY vec_id, bucket)
       |SELECT CAST(ROW_NUMBER() OVER (ORDER BY adc_dist, vec_id) AS BIGINT) AS rank,
       |  vec_id, bucket, adc_dist
       |FROM tot ORDER BY adc_dist, vec_id LIMIT 10""".stripMargin
  }
}
