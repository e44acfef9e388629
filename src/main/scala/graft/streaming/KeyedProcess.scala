package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** KeyedProcessOperator (reference: taskmanager/operators/stateful.py:88-144):
  * arbitrary user function over (key, records, per-key state).
  *
  * The reference's implementation has a fatal bug — state for a key is
  * *never created* (the write-back is guarded by `if key_state is not
  * None`, stateful.py:123-131), so its dedup example can't remember
  * anything. This wrapper is the corrected semantics on
  * `flatMapGroupsWithState`, where the state handle always persists.
  */
object KeyedProcess {

  def apply[K: Encoder, V, S: Encoder, O: Encoder](
      ds: Dataset[V], key: V => K,
      outputMode: OutputMode = OutputMode.Append(),
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout())(
      fn: (K, Iterator[V], GroupState[S]) => Iterator[O]): Dataset[O] =
    ds.groupByKey(key).flatMapGroupsWithState(outputMode, timeout)(fn)

  /** The dedup example's intended behavior
    * (examples/stateful_deduplication.py:18-49): per-key set of seen event
    * ids, emit first occurrence only, cap state at `cap` ids (the example
    * caps at 10,000, stateful_deduplication.py:44-47).
    */
  def dedupCapped[V: Encoder](ds: Dataset[V], key: V => String, id: V => String,
                              cap: Int = 10000): Dataset[V] = {
    implicit val keyEnc: Encoder[String] = org.apache.spark.sql.Encoders.STRING
    // native array<string> state encoding — the state store holds an
    // ArrayType column, not a java-serialized blob per update. NOTE:
    // checkpoints written by a pre-ArrayType build (java-serialized
    // BinaryType state) are schema-incompatible — restart those queries
    // with a fresh checkpoint location.
    val sp = ds.sparkSession
    implicit val stateEnc: Encoder[Array[String]] = sp.implicits.newStringArrayEncoder
    apply[String, V, Array[String], V](ds, key) { (_, records, state) =>
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]
      if (state.exists) seen ++= state.get
      val out = records.toSeq.filter { r =>
        val rid = id(r)
        if (seen.contains(rid)) false
        else { seen += rid; true }
      }
      // cap: drop oldest ids first, like a bounded LRU of seen-keys
      while (seen.size > cap) seen -= seen.head
      state.update(seen.toArray)
      out.iterator
    }
  }
}
