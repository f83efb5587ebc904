package graft.api

import org.apache.spark.sql.{Column, Dataset, Encoder, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.expressions.Aggregator

/** Wallaroo-style pipeline builder over typed Datasets.
  *
  * Mirrors `Pipeline` in /root/reference/lib/wallaroo/application.pony:74-275:
  * `source → to → key_by → to → merge/collect → to_sink`, but each stage just
  * declares a Catalyst transform, so Spark owns distribution, shuffles and
  * fault tolerance (the concerns wallaroo's actor runtime hand-implements).
  *
  * The lambda-based stages (`to`) are for arbitrary user logic, exactly like
  * the reference's computations; operators with relational shape should
  * prefer the column-based modules in [[graft.operators]] which stay inside
  * whole-stage codegen.
  */
final class Pipeline[T](val ds: Dataset[T], val name: String) extends Serializable {

  def to[U: Encoder](c: StatelessComputation[T, U]): Pipeline[U] =
    new Pipeline(ds.flatMap(in => c(in)), name)

  /** Union with another pipeline of the same type (reference `merge`). */
  def merge(other: Pipeline[T]): Pipeline[T] =
    new Pipeline(ds.union(other.ds), name)

  /** Hash-partition by key (reference `key_by`). */
  def keyBy[K: Encoder](f: T => K): KeyedPipeline[K, T] =
    new KeyedPipeline(ds.groupByKey(f), name)

  /** Route everything to one logical key (reference `collect`). Downstream
    * aggregations still compute map-side partials, so this is NOT a
    * single-partition coalesce at scale.
    */
  def collect(): KeyedPipeline[Int, T] = {
    implicit val enc: Encoder[Int] = Encoders.scalaInt
    new KeyedPipeline(ds.groupByKey(_ => 0), name)
  }

  /** Parallelism hint (reference per-stage `parallelism`). */
  def parallelism(n: Int): Pipeline[T] = new Pipeline(ds.repartition(n), name)

  /** Partition-local key_by + aggregate (reference `local_key_by`,
    * application.pony:247, with the `local_routing` flag): a per-partition
    * grouped fold with NO shuffle — emits one FINAL (key, output) per key
    * per partition where it already sits, exactly the reference's
    * local-routing semantics (each worker aggregates and emits locally).
    * NOTE: the emitted values are outputs, not mergeable accumulators —
    * for two-phase global aggregation use [[localKeyByPartials]], whose
    * accumulators merge with `combine`.
    */
  def localKeyBy[K, Acc, Out](f: T => K, a: GraftAggregation[T, Acc, Out])(
      implicit tupEnc: Encoder[(K, Out)]): Pipeline[(K, Out)] =
    new Pipeline(ds.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[K, Acc]
      it.foreach { t =>
        val k = f(t)
        m.update(k, a.update(t, m.getOrElse(k, a.initialAccumulator)))
      }
      m.iterator.map { case (k, acc) => (k, a.output(acc)) }
    }, name)

  /** Shuffle-free per-partition partials for two-phase aggregation: emits
    * (key, accumulator) per key per partition; merge downstream with
    * `a.combine` (then `a.output`) for the exact global aggregate at a
    * fraction of the shuffle volume.
    */
  def localKeyByPartials[K, Acc, Out](f: T => K, a: GraftAggregation[T, Acc, Out])(
      implicit tupEnc: Encoder[(K, Acc)]): Pipeline[(K, Acc)] =
    new Pipeline(ds.mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[K, Acc]
      it.foreach { t =>
        val k = f(t)
        m.update(k, a.update(t, m.getOrElse(k, a.initialAccumulator)))
      }
      m.iterator
    }, name)

  /** Partition-local collect (reference `local_collect`,
    * application.pony:256): fold each partition to a single output, no
    * shuffle; empty partitions emit nothing.
    */
  def localCollect[Acc, Out](a: GraftAggregation[T, Acc, Out])(
      implicit outEnc: Encoder[Out]): Pipeline[Out] =
    new Pipeline(ds.mapPartitions { it =>
      if (it.isEmpty) Iterator.empty
      else Iterator.single(
        a.output(it.foldLeft(a.initialAccumulator)((acc, t) => a.update(t, acc))))
    }, name)

  /** File sink (reference `to_sink`). */
  def toSink(sink: Sink): Unit = sink.write(ds.toDF())

  /** Fan out to several sinks (reference `to_sinks`,
    * application.pony:193). The plan is computed once and persisted so
    * each sink writes from the same materialized result.
    */
  def toSinks(sinks: Seq[Sink]): Unit = {
    val df = ds.toDF().persist()
    try sinks.foreach(_.write(df))
    finally df.unpersist()
  }

  def toDF: org.apache.spark.sql.DataFrame = ds.toDF()
}

object Pipeline {
  /** Entry stage (reference `Wallaroo.source`). */
  def source[T](name: String, ds: Dataset[T]): Pipeline[T] = new Pipeline(ds, name)

  /** Entry stage from a pluggable streaming-source config (reference
    * `Wallaroo.source(name, TCPSourceConfig/KafkaSourceConfig/...)`).
    */
  def source(spark: org.apache.spark.sql.SparkSession,
      config: graft.sources.StreamSource): Pipeline[org.apache.spark.sql.Row] =
    new Pipeline(config.load(spark), config.name)

  /** GraftAggregation ⇄ Spark Aggregator adapter (same algebra). */
  def asAggregator[In, Acc, Out](a: GraftAggregation[In, Acc, Out])(
      implicit accEnc: Encoder[Acc], outEnc: Encoder[Out]): Aggregator[In, Acc, Out] =
    new Aggregator[In, Acc, Out] {
      def zero: Acc = a.initialAccumulator
      def reduce(b: Acc, in: In): Acc = a.update(in, b)
      def merge(x: Acc, y: Acc): Acc = a.combine(x, y)
      def finish(b: Acc): Out = a.output(b)
      def bufferEncoder: Encoder[Acc] = accEnc
      def outputEncoder: Encoder[Out] = outEnc
    }
}

final class KeyedPipeline[K, T](val kv: KeyValueGroupedDataset[K, T], val name: String)
    extends Serializable {

  /** Per-key state computation, folding inputs in `order` (the batch
    * equivalent of the reference's per-key stream order). One shuffle+sort.
    */
  def toState[S, U: Encoder](c: StateComputation[T, S, U], order: Column*): Pipeline[U] = {
    val out = kv.flatMapSortedGroups(order: _*) { (_: K, it: Iterator[T]) =>
      var state = c.initialState
      it.flatMap { in =>
        val (s2, outs) = c(in, state)
        state = s2
        outs.iterator
      }
    }
    new Pipeline(out, name)
  }

  /** Windowless (global-window) aggregation via the reference's
    * initial/update/combine/output contract — executed as a Spark
    * `Aggregator`, so partial aggregates combine map-side before the
    * key shuffle.
    */
  def aggregate[Acc, Out](a: GraftAggregation[T, Acc, Out])(
      implicit accEnc: Encoder[Acc], outEnc: Encoder[Out],
      tupEnc: Encoder[(K, Out)]): Dataset[(K, Out)] =
    kv.agg(Pipeline.asAggregator(a).toColumn)
}

object Sink {
  def parquet(path: String): Sink = df => df.write.mode("overwrite").parquet(path)
  def csv(path: String): Sink = df => df.write.mode("overwrite").option("header", "true").csv(path)
  def json(path: String): Sink = df => df.write.mode("overwrite").json(path)
  /** Reference `EmptySink` — materializes and discards. */
  def empty: Sink = df => { df.foreach(_ => ()); () }
}

trait Sink extends Serializable {
  def write(df: org.apache.spark.sql.DataFrame): Unit
}
