package graft.ops

import org.apache.spark.sql.{Dataset, Encoder, KeyValueGroupedDataset}
import org.apache.spark.sql.expressions.Aggregator

/** Typed fold surface.
  *
  * KeyedStream.reduce in the reference is an arbitrary binary Python
  * closure folded left-to-right over each key's records — and is silently
  * wrapped in a 1-second tumbling window (reference:
  * jobmanager/job_graph.py:450-457; fold at stateful.py:225-231). We
  * require the fold to be associative+commutative (SURVEY §7.4.1) and run
  * it as a real distributed reduce: partial folds per partition, one
  * shuffled row per key.
  *
  * ReducingState / AggregatingState (reference: state_types.py:217-324)
  * map to Aggregator[IN, BUF, OUT] — same (initial, add, merge, get)
  * contract, but usable in both batch and streaming aggregations.
  */
object Reduce {

  /** KeyedStream.reduce — typed distributed fold per key. */
  def reduceByKey[K, V](grouped: KeyValueGroupedDataset[K, V])(f: (V, V) => V): Dataset[(K, V)] =
    grouped.reduceGroups(f)

  /** AggregatingState as a reusable Aggregator
    * (reference: state_types.py:264-324 — add_func/get_func/initial).
    */
  def aggregating[IN, BUF: Encoder, OUT: Encoder](
      initial: BUF, addFn: (BUF, IN) => BUF, mergeFn: (BUF, BUF) => BUF,
      getFn: BUF => OUT): Aggregator[IN, BUF, OUT] =
    new Aggregator[IN, BUF, OUT] {
      override def zero: BUF = initial
      override def reduce(b: BUF, a: IN): BUF = addFn(b, a)
      override def merge(b1: BUF, b2: BUF): BUF = mergeFn(b1, b2)
      override def finish(b: BUF): OUT = getFn(b)
      override def bufferEncoder: Encoder[BUF] = implicitly[Encoder[BUF]]
      override def outputEncoder: Encoder[OUT] = implicitly[Encoder[OUT]]
    }

  /** ReducingState (reference: state_types.py:217-261) — an Aggregator
    * specialization where BUF = OUT = IN and zero is absorbing.
    */
  def reducing[T: Encoder](zeroValue: T)(f: (T, T) => T): Aggregator[T, T, T] =
    aggregating[T, T, T](zeroValue, f, f, identity)
}
