package graft.operators

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** st14's streaming side: the strict view -> click -> purchase sequence
  * detector (q66's 6 h proximity semantics, completed chains only) as a
  * per-user STATE MACHINE over `flatMapGroupsWithState` — the CEP
  * runtime shape, where the batch twin is three chained window minimums.
  *
  * State per user is three optional anchors + a done bit — O(1)
  * regardless of event volume, the property that lets a billion-user
  * stream hold its entire pattern state in the state store (contrast
  * buffering raw events per user). Each invocation processes its
  * group's events in EVENT-TIME order (sorted within the batch — the
  * group iterator has no order contract); across batches the detector
  * assumes watermark-ordered delivery, the standard CEP contract (st08's
  * discipline: bounded disorder is handled by buffering within the
  * watermark horizon before feeding the machine — not modeled here,
  * where the equivalence spec feeds in order and pins the logic).
  * Emission is append-mode: one match per user, at the moment the chain
  * completes; the done bit makes replayed/late events no-ops.
  *
  * Anchor comparisons run at MICROsecond precision (`Timestamp.getTime`
  * is millis — two events inside one millisecond would tie-break
  * differently from the batch twin's native timestamp comparison).
  */
object SequenceMatch {

  /** q66's per-stage proximity bound, in microseconds. */
  val WindowMicros: Long = 6L * 3600 * 1000 * 1000

  final case class SeqEvent(user_id: Long, event_type: String, ts: java.sql.Timestamp)
  final case class SeqState(
      t1: Option[java.sql.Timestamp],
      t2: Option[java.sql.Timestamp],
      done: Boolean)
  final case class SeqMatch(
      user_id: Long,
      t1: java.sql.Timestamp,
      t2: java.sql.Timestamp,
      t3: java.sql.Timestamp)

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000 + (t.getNanos % 1000000) / 1000

  private[operators] def step(
      user: Long, evs: Iterator[SeqEvent],
      state: GroupState[SeqState]): Iterator[SeqMatch] = {
    var st = state.getOption.getOrElse(SeqState(None, None, done = false))
    val out = scala.collection.mutable.Buffer.empty[SeqMatch]
    for (e <- evs.toSeq.sortBy(x => micros(x.ts)) if !st.done) {
      val t = micros(e.ts)
      e.event_type match {
        case "view" if st.t1.isEmpty =>
          st = st.copy(t1 = Some(e.ts))
        case "click" if st.t1.isDefined && st.t2.isEmpty
            && t > micros(st.t1.get) && t <= micros(st.t1.get) + WindowMicros =>
          st = st.copy(t2 = Some(e.ts))
        case "purchase" if st.t2.isDefined
            && t > micros(st.t2.get) && t <= micros(st.t2.get) + WindowMicros =>
          out += SeqMatch(user, st.t1.get, st.t2.get, e.ts)
          st = st.copy(done = true)
        case _ => ()
      }
    }
    state.update(st)
    out.iterator
  }

  /** The detector over a (streaming or batch) typed event source. */
  def matches(events: Dataset[SeqEvent]): Dataset[SeqMatch] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(step)
  }
}
