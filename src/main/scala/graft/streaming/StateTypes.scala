package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming._

/** The reference's keyed state-type surface on `transformWithState`.
  *
  * The reference defines five state primitives over a KV backend
  * (reference: taskmanager/state/state_types.py — ValueState :31-60,
  * ListState :63-113, MapState :116-214, ReducingState :217-261,
  * AggregatingState :264-324) plus a StateDescriptor factory. Spark 4's
  * `StatefulProcessor` exposes the same Value/List/Map handles natively
  * (with TTL — the state-expiry story the reference lacks entirely);
  * Reducing/Aggregating semantics are a ValueState plus the fold, shown
  * here in `KeyedProfileProcessor.count` (reduce) — and as
  * `Reduce.aggregating` for aggregation pipelines.
  *
  * Requires the RocksDB state store
  * (`GraftSession.useRocksDBStateStore`) — transformWithState's backing
  * store, matching the reference's RocksDBStateBackend default.
  */
object StateTypes {

  case class ProfileOut(key: String, count: Long, recent: Seq[Double], distinctTypes: Int)

  /** Exercises all three native state handles per key:
    * ValueState running count, ListState bounded recent-values buffer,
    * MapState per-subtype counts.
    */
  class KeyedProfileProcessor(recentN: Int)
      extends StatefulProcessor[String, (String, String, Double), ProfileOut] {
    @transient private var count: ValueState[Long] = _
    @transient private var recent: ListState[Double] = _
    @transient private var perType: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      count = getHandle.getValueState[Long]("count", Encoders.scalaLong, TTLConfig.NONE)
      recent = getHandle.getListState[Double]("recent", Encoders.scalaDouble, TTLConfig.NONE)
      perType = getHandle.getMapState[String, Long]("perType",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: String, rows: Iterator[(String, String, Double)],
                                 timerValues: TimerValues): Iterator[ProfileOut] = {
      var c = if (count.exists()) count.get() else 0L
      rows.foreach { case (_, typ, v) =>
        c += 1
        recent.appendValue(v)
        val cur = if (perType.containsKey(typ)) perType.getValue(typ) else 0L
        perType.updateValue(typ, cur + 1)
      }
      count.update(c)
      // bound the ListState buffer to the last N values
      val trimmed = recent.get().toSeq.takeRight(recentN)
      recent.put(trimmed.toArray)
      Iterator.single(ProfileOut(key, c, trimmed, perType.keys().size))
    }
  }

  /** Run the profile processor over a keyed stream. */
  def keyedProfile(ds: Dataset[(String, String, Double)], recentN: Int = 5)
                  (implicit e: Encoder[ProfileOut]): Dataset[ProfileOut] = {
    implicit val keyEnc: Encoder[String] = Encoders.STRING
    ds.groupByKey(_._1)
      .transformWithState(new KeyedProfileProcessor(recentN),
        TimeMode.None(), OutputMode.Update())
  }
}
