package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}

/** Arbitrary per-key state machines on the typed Dataset API
  * (SURVEY.md §2.8 "stateful custom" row).
  *
  * `flatMapGroupsWithState` is the Structured Streaming primitive for
  * custom state; the same code runs in batch (state starts empty, one
  * call per key) and streaming (state persists across micro-batches in
  * the state store — RocksDB provider for large keyspaces at 100 TB).
  * Its batch twin is WindowQueries.qWindowCumsum, and StreamingSpec
  * asserts they agree.
  */
object StatefulOps {

  final case class Ev(
      event_id: Long, ts: Timestamp, user_id: Long, value: Double)
  final case class Running(
      user_id: Long, event_id: Long, running: Double)
  final case class SumState(total: Double)

  /** Per-user running total of `value` in (ts, event_id) order.
    *
    * Within one invocation the iterator's order is not guaranteed, so
    * rows are sorted before folding — in streaming this corresponds to
    * per-micro-batch ordering with the carried state providing the
    * prefix from earlier batches.
    */
  def runningTotals(events: Dataset[Ev]): Dataset[Running] = {
    implicit val stateEnc = Encoders.product[SumState]
    implicit val outEnc = Encoders.product[Running]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (user: Long, rows: Iterator[Ev], state: GroupState[SumState]) => {
          var total = state.getOption.map(_.total).getOrElse(0.0)
          val out = rows.toSeq
            .sortBy(e => (e.ts.getTime, e.event_id))
            .map { e =>
              total += e.value
              Running(user, e.event_id, total)
            }
          state.update(SumState(total))
          out.iterator
        })
  }

  /** `transformWithState` processor computing the same per-user running
    * total — the Spark 4 successor API to flatMapGroupsWithState.
    *
    * Differences that matter at scale: state is named and composable
    * (multiple ValueState/ListState/MapState per key instead of one
    * blob), TTL is first-class (`TTLConfig`), and the operator requires
    * the RocksDB state store provider — the large-keyspace answer
    * (SURVEY §4.3): state lives off-heap/on-disk per executor instead of
    * in the JVM heap.
    */
  private class RunningTotalProcessor
      extends StatefulProcessor[Long, Ev, Running] {
    @transient private var state: ValueState[SumState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SumState](
        "runningTotal", Encoders.product[SumState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(
        user: Long, rows: Iterator[Ev],
        timers: TimerValues): Iterator[Running] = {
      var total = if (state.exists()) state.get().total else 0.0
      val out = rows.toSeq
        .sortBy(e => (e.ts.getTime, e.event_id))
        .map { e =>
          total += e.value
          Running(user, e.event_id, total)
        }
      state.update(SumState(total))
      out.iterator
    }
  }

  /** transformWithState twin of [[runningTotals]] (same fixture, same
    * output — asserted against the legacy API in StatefulTwsSpec).
    * Caller must have the RocksDB provider configured
    * ([[StreamOps.configureRocksDBStateStore]]); the operator rejects
    * the default HDFS-backed provider. */
  def runningTotalsTws(events: Dataset[Ev]): Dataset[Running] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new RunningTotalProcessor,
        TimeMode.None(),
        OutputMode.Append())(Encoders.product[Running])
}
