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
      valueCol: String, outCol: String, numParts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (numParts > 0) numParts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ordered = df
      .repartitionByRange(parts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
      .localCheckpoint()
    val vIdx = ordered.schema.fieldIndex(valueCol)
    // per-partition totals: `parts` rows — driver-side exclusive offsets
    val partSums = ordered
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col(valueCol)).as("_s"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .toMap
    val offsets = new Array[Long](parts + 1)
    var acc = 0L
    (0 until parts).foreach { p =>
      offsets(p) = acc
      acc += partSums.getOrElse(p, 0L)
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = ordered.schema.add(outCol, LongType, nullable = false)
    val rdd = ordered.rdd.mapPartitionsWithIndex { (pid, it) =>
      var run = bc.value(pid)
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ run)
        run += r.getLong(vIdx)
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
