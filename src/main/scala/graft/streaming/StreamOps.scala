package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import graft.api.{GraftAggregation, StateComputation, StatelessComputation}

/** Structured-Streaming execution of the reference's pipeline model — this
  * is where wallaroo's continuous-processing semantics live on Spark:
  * sources → computations → key_by → windowed/state computations → sinks,
  * with watermarks standing in for the reference's delay + late-data
  * handling (windows.pony `with_delay`, late_data_policy.pony) and
  * checkpointed state replacing its actor-level recovery/checkpoint
  * machinery (core/checkpoint, core/recovery — owned by Spark here).
  */
object StreamOps {

  /** Rate-based generator source (reference GenSource,
    * core/source/gen_source): `rowsPerSecond` synthetic rows with an event
    * timestamp.
    */
  def genSource(spark: SparkSession, rowsPerSecond: Int): DataFrame =
    spark.readStream.format("rate")
      .option("rowsPerSecond", rowsPerSecond.toString).load()

  /** File-based streaming source (parquet dir tailing). */
  def fileSource(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
      path: String): DataFrame =
    spark.readStream.schema(schema).parquet(path)

  /** Stateless computation on a stream (1 → 0..n). */
  def compute[In, Out: Encoder](ds: Dataset[In],
      c: StatelessComputation[In, Out]): Dataset[Out] =
    ds.flatMap(in => c(in))

  /** Per-key StateComputation across micro-batches via
    * flatMapGroupsWithState. Within each batch a key's rows are folded in
    * `orderBy` order (cross-batch order is arrival order, as in the
    * reference); state persists in the state store and is restored on
    * recovery from the checkpoint.
    */
  def computeKeyedState[In, K: Encoder, S: Encoder, Out: Encoder](
      ds: Dataset[In], keyFn: In => K, orderBy: In => Long,
      c: StateComputation[In, S, Out]): Dataset[Out] = {
    ds.groupByKey(keyFn)
      .flatMapGroupsWithState[S, Out](OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: K, rows: Iterator[In], gs: GroupState[S]) =>
          var state = gs.getOption.getOrElse(c.initialState)
          val out = rows.toSeq.sortBy(orderBy).iterator.flatMap { in =>
            val (s2, outs) = c(in, state)
            state = s2
            outs.iterator
          }.toVector
          gs.update(state)
          out.iterator
      }
  }

  /** Range windows with delay (reference RangeWindowsBuilder.with_delay →
    * watermark): tumbling if `slide == range`, sliding otherwise. Late rows
    * beyond `delay` are dropped — LateDataPolicy.drop.
    */
  def windowedAgg(df: DataFrame, tsName: String, keys: Seq[Column],
      range: String, slide: String, delay: String,
      aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsName, delay)
      .groupBy((window(col(tsName), range, slide) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-based session windows (ephemeral windows analogue) via the native
    * session_window aggregation.
    */
  def sessionAgg(df: DataFrame, tsName: String, keys: Seq[Column],
      gap: String, delay: String, aggs: Seq[Column]): DataFrame =
    df.withWatermark(tsName, delay)
      .groupBy((session_window(col(tsName), gap) +: keys): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Windowless per-key aggregation (GlobalWindow / alphabet): running
    * per-key aggregate in Update mode via the Aggregation contract.
    */
  def globalAgg[In, K: Encoder, Acc: Encoder, Out: Encoder](
      ds: Dataset[In], keyFn: In => K, a: GraftAggregation[In, Acc, Out])(
      implicit tup: Encoder[(K, Out)]): Dataset[(K, Out)] =
    ds.groupByKey(keyFn).mapGroupsWithState[Acc, (K, Out)](GroupStateTimeout.NoTimeout) {
      (k: K, rows: Iterator[In], gs: GroupState[Acc]) =>
        val acc = rows.foldLeft(gs.getOption.getOrElse(a.initialAccumulator))(
          (b, in) => a.update(in, b))
        gs.update(acc)
        (k, a.output(acc))
    }

  /** Memory sink for tests/smoke (reference EmptySink/TCP sink stand-in). */
  def toMemorySink(df: DataFrame, name: String, outputMode: String): StreamingQuery =
    df.writeStream.format("memory").queryName(name).outputMode(outputMode).start()

  /** File sink with checkpointing — the durable sink path. */
  def toParquetSink(df: DataFrame, path: String, checkpoint: String): StreamingQuery =
    df.writeStream.format("parquet")
      .option("path", path).option("checkpointLocation", checkpoint)
      .outputMode("append").start()

  /** foreachBatch escape hatch (reference ConnectorSink analogue). */
  def toForeachBatchSink(df: DataFrame, checkpoint: String)(
      f: (DataFrame, Long) => Unit): StreamingQuery =
    df.writeStream.option("checkpointLocation", checkpoint)
      .foreachBatch(f).outputMode("update").start()
}
