package graft.api

/** User-computation contracts, mirroring the reference's pipeline surface
  * (wallaroo `StatelessComputation` / `StateComputation` / `Aggregation`,
  * /root/reference/lib/wallaroo/core/topology/computations.pony:88-128 and
  * /root/reference/lib/wallaroo/core/aggregations/aggregations.pony:25-52)
  * re-expressed for Spark: computations become typed Dataset transforms,
  * aggregations become Spark `Aggregator`s (zero/reduce/merge/finish is the
  * same algebra as initial/update/combine/output, which is what makes
  * map-side partial aggregation possible at 100 TB).
  */
trait StatelessComputation[In, Out] extends Serializable {
  def name: String
  /** 1 input → 0..n outputs (covers map, filter, flatMap). */
  def apply(in: In): IterableOnce[Out]
}

object StatelessComputation {
  def map[In, Out](n: String)(f: In => Out): StatelessComputation[In, Out] =
    new StatelessComputation[In, Out] {
      val name = n; def apply(in: In) = Iterator.single(f(in))
    }
  def filter[In](n: String)(p: In => Boolean): StatelessComputation[In, In] =
    new StatelessComputation[In, In] {
      val name = n; def apply(in: In) = if (p(in)) Iterator.single(in) else Iterator.empty
    }
  def flatMap[In, Out](n: String)(f: In => IterableOnce[Out]): StatelessComputation[In, Out] =
    new StatelessComputation[In, Out] { val name = n; def apply(in: In) = f(in) }
}

/** Per-key evolving state: each input updates the state and may emit
  * 0..n outputs. Batch execution folds inputs in an explicit event order
  * (the stream order of the reference); streaming execution runs it inside
  * `flatMapGroupsWithState`.
  */
trait StateComputation[In, S, Out] extends Serializable {
  def name: String
  def initialState: S
  def apply(in: In, state: S): (S, IterableOnce[Out])
}

/** The reference's windowed-aggregation contract: an associative,
  * partially-combinable accumulator. Maps 1:1 onto Spark's
  * `Aggregator[In, Acc, Out]`.
  */
trait GraftAggregation[In, Acc, Out] extends Serializable {
  def name: String
  def initialAccumulator: Acc
  def update(in: In, acc: Acc): Acc
  /** Must be associative; must not mutate its arguments. */
  def combine(a: Acc, b: Acc): Acc
  def output(acc: Acc): Out
}
