package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — the custom-state
  * Structured Streaming extension surface (no reference equivalent;
  * pgloader is batch-only, SURVEY §2.9). One state-transition fold is
  * shared by the batch and streaming variants so the two paths cannot
  * drift.
  *
  * Scale shape: batch = one shuffle on user_id with per-group sort (each
  * group is one user's events — bounded); streaming =
  * flatMapGroupsWithState with event-time timeout, state one open session
  * per active user.
  */
object Sessionize {

  /** Open session state: [start, last] micros + event count. */
  final case class Session(start: Long, last: Long, n: Long)

  /** Fold sorted event times into sessions split on gaps > `gapMicros`.
    * Returns (closed sessions, open tail session). */
  def fold(sorted: Seq[Long], gapMicros: Long,
           open: Option[Session]): (Seq[Session], Option[Session]) = {
    var cur = open
    val closed = Seq.newBuilder[Session]
    sorted.foreach { t =>
      cur match {
        case Some(s) if t - s.last <= gapMicros =>
          cur = Some(Session(s.start, math.max(s.last, t), s.n + 1))
        case Some(s) =>
          closed += s
          cur = Some(Session(t, t, 1))
        case None =>
          cur = Some(Session(t, t, 1))
      }
    }
    (closed.result(), cur)
  }

  /** Batch sessionization: (user_id, session_start_us, session_end_us,
    * n_events), one row per session. */
  def batch(events: DataFrame, userCol: String, tsCol: String,
            gapMinutes: Int): DataFrame = {
    require(gapMinutes > 0, s"gap must be positive, got $gapMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    val gap = gapMinutes * 60L * 1000000L
    events
      .select(col(userCol).cast("long"), unix_micros(col(tsCol)))
      // decode through boxed longs and DROP null user/ts rows — a
      // primitive (Long, Long) encoder would throw on the first null
      // instead of skipping the row (the NearDup ingestion convention)
      .as[(Option[Long], Option[Long])]
      .flatMap { case (u, t) =>
        for (uu <- u; tt <- t) yield (uu, tt) }
      .groupByKey(_._1)
      .flatMapGroups { (uid: Long, it: Iterator[(Long, Long)]) =>
        val times = it.map(_._2).toArray.sorted.toSeq
        val (closed, open) = fold(times, gap, None)
        (closed ++ open).iterator.map(s => (uid, s.start, s.last, s.n))
      }
      .toDF("user_id", "session_start_us", "session_end_us", "n_events")
  }

  /** Streaming sessionization over a watermarked (user, ts) Dataset:
    * sessions close either when a later event arrives past the gap or
    * when the event-time watermark passes last + gap (timeout). */
  def streaming(events: Dataset[(Long, java.sql.Timestamp)],
                gapMinutes: Int): Dataset[(Long, Long, Long, Long)] = {
    require(gapMinutes > 0, s"gap must be positive, got $gapMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    val gap = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp)],
         state: GroupState[Session]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single((uid, s.start, s.last, s.n))
          } else {
            // floorDiv+getNanos, not getTime*1000: getTime is millis and
            // would truncate the sub-millisecond part the batch path
            // keeps via unix_micros (the same defect the funnel oracle
            // caught — see FunnelStream)
            val times = it.map { e =>
              Math.floorDiv(e._2.getTime, 1000L) * 1000000L +
                e._2.getNanos / 1000L
            }.toSeq.sorted
            val (closed, open) =
              fold(times, gap, state.getOption)
            open match {
              case Some(s) =>
                state.update(s)
                // close when the watermark passes last + gap; clamp to
                // watermark+1 — a watermark jump past last+gap (idle
                // stream resuming behind a far-future event) would
                // otherwise register a timeout at or below the current
                // watermark, which THROWS and kills the query (same
                // guard as NearDup.candidatePairsWithin / FunnelStream)
                val wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(
                  math.max(s.last / 1000L + gap / 1000L, wm + 1L))
              case None => if (state.exists) state.remove()
            }
            closed.iterator.map(s => (uid, s.start, s.last, s.n))
          }
      }
  }
}
