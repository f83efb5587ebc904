package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import graft.functions._
import graft.sources.Sources

/** Sequence packing for training-shard writers: lay documents out in a
  * deterministic global order and pack their token streams into
  * fixed-capacity bins (the GPT-style concat-and-chunk layout).
  *
  * The core primitive is a distributed exclusive prefix sum over a total
  * order — computed WITHOUT the single-task global window that
  * `SUM(...) OVER (ORDER BY ...)` plans to: range-repartition on the order
  * key, materialize once, collect only the per-partition totals (one tiny
  * row per partition), broadcast their exclusive offsets back, and add a
  * per-partition local running sum. Two passes over the data, no global
  * sort bottleneck — the classic two-phase scan, and exactly how a
  * 1000-executor shard writer assigns token offsets.
  */
object Pack {

  /** Exclusive prefix sum of `valueCol` (long) in ascending `orderCols`
    * order (the combined key must be unique for a well-defined order).
    * Appends `outCol` = sum of all values strictly before the row.
    *
    * Scale shape: one range shuffle + one metadata-sized collect
    * (`numParts` longs); no global window. The range-partitioned,
    * locally-sorted intermediate is localCheckpoint'ed so the totals pass
    * and the output pass read the same materialization.
    */
  def exclusivePrefixSum(df: DataFrame, orderCols: Seq[String],
      valueCol: String, outCol: String, numParts: Int = 0): DataFrame =
    exclusivePrefixSums(df, orderCols, Seq(valueCol -> outCol), numParts)

  /** Multi-column [[exclusivePrefixSum]]: one range shuffle computes an
    * exclusive running sum for EVERY (valueCol, outCol) pair — e.g. a
    * global rank (prefix of ones) and a cumulative mass (prefix of a
    * count) in the same pass.
    */
  def exclusivePrefixSums(df: DataFrame, orderCols: Seq[String],
      valueOutCols: Seq[(String, String)], numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ordered = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint()
    val vIdxs = valueOutCols.map(vo => ordered.schema.fieldIndex(vo._1))
    // per-partition totals: `parts` rows — driver-side exclusive offsets
    val partSums = ordered
      .groupBy(spark_partition_id().as("_pid"))
      .agg(valueOutCols.map(vo => sum(col(vo._1))).head,
        valueOutCols.map(vo => sum(col(vo._1))).tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        valueOutCols.indices.map(i => r.getLong(i + 1)).toArray)
      .toMap
    val nv = valueOutCols.size
    val offsets = Array.ofDim[Long](parts, nv)
    val acc = new Array[Long](nv)
    (0 until parts).foreach { p =>
      Array.copy(acc, 0, offsets(p), 0, nv)
      partSums.get(p).foreach(s => (0 until nv).foreach(i => acc(i) += s(i)))
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = valueOutCols.foldLeft(ordered.schema)(
      (sc, vo) => sc.add(vo._2, LongType, nullable = false))
    val rdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      val run = bc.value(pid).clone()
      it.map { r =>
        val out = Row.fromSeq(r.toSeq ++ run.toSeq)
        (0 until nv).foreach(i => run(i) += r.getLong(vIdxs(i)))
        out
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Pack documents into `capacity`-token bins in salted-hash order (the
    * deterministic "global shuffle" training order): each document starts
    * at its exclusive token offset; its bin is `offset / capacity`.
    * Returns per-bin occupancy: documents starting in the bin, their total
    * tokens, and how many straddle into the next bin (the padding /
    * boundary-split decision a shard writer makes).
    */
  def packBins(docs: DataFrame, idCol: String, tokenCol: String,
      orderSalt: String, capacity: Long): DataFrame = {
    val keyed = docs.select(
      col(idCol),
      portableHash64(concat(lit(orderSalt), col(idCol))).as("_h"),
      col(tokenCol).cast(LongType).as("_ntok"))
    val withOff =
      exclusivePrefixSum(keyed, Seq("_h", idCol), "_ntok", "_off")
    withOff
      .withColumn("bin", (col("_off") / capacity).cast(LongType))
      .withColumn("_end_bin",
        ((col("_off") + col("_ntok") - 1) / capacity).cast(LongType))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_ntok")).as("sum_tokens"),
        sum(when(col("_end_bin") > col("bin"), 1L).otherwise(0L))
          .as("n_straddle"))
  }

  // ---------------------------------------------------------------- queries

  /** Sequence packing of the document corpus into 1024-token bins. */
  def qSeqPack(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Sources.documents(s, dir)
      .select($"doc_id",
        size(split($"text", " ")).cast(LongType).as("ntok"))
    packBins(docs, "doc_id", "ntok", "pack:", capacity = 1024L)
      .orderBy($"bin")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    Map("q_seq_pack" -> qSeqPack)

  private def md(e: String) = portableHash64Sql(e)

  val oracles: Map[String, String] = Map(
    "q_seq_pack" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok,
         |    ${md("'pack:'||doc_id")} AS h
         |  FROM documents),
         |o AS (
         |  SELECT ntok, COALESCE(SUM(ntok) OVER (ORDER BY h, doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
         |  FROM t)
         |SELECT CAST(off // 1024 AS BIGINT) AS bin, COUNT(*) AS n_docs,
         |  CAST(SUM(ntok) AS BIGINT) AS sum_tokens,
         |  CAST(SUM(CASE WHEN (off + ntok - 1) // 1024 > off // 1024
         |    THEN 1 ELSE 0 END) AS BIGINT) AS n_straddle
         |FROM o GROUP BY bin ORDER BY bin""".stripMargin)
}
