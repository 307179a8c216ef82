package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming ordered-step conversion funnel — the live twin of
  * [[graft.operators.Funnel]] (batch): per user, the earliest
  * completion time of each step STRICTLY after the previous step's
  * time, with −1 from the drop-off step onward, emitted once the user
  * has been quiet past the event-time watermark for `quietMinutes`.
  * One scalar fold ([[chain]]) defines the semantics; the spec pins it
  * against the batch operator so the two paths cannot drift.
  *
  * Exactness under out-of-order arrival: a later-arriving EARLIER
  * step-k event can retroactively change every downstream choice (the
  * chain is a greedy argmin cascade), so the state holds each step's
  * full time list until emission — bounded by the length of the
  * user's current activity BURST times the step-event rate (state
  * clears only at a quiet-window emission; a key that never goes
  * quiet for `quietMinutes` — a bot, a monitor — accumulates until it
  * does, so cap such keys upstream or pick a quiet window the traffic
  * actually honors). NOT bounded by corpus size, but looser than the
  * interval join's rate × horizon contract. Only times whose type is
  * a funnel step are kept; everything else just advances the quiet
  * clock.
  */
object FunnelStream {

  /** Greedy earliest chain: out(0) = min(times(0)); out(k) = min of
    * times(k) strictly after out(k−1); −1 from the first missing step
    * onward. */
  def chain(perStep: Seq[Seq[Long]]): Seq[Long] = {
    val out = Array.fill(perStep.length)(-1L)
    var broken = false
    var i = 0
    while (i < perStep.length) {
      if (!broken) {
        val cand =
          if (i == 0) perStep(i).minOption
          else perStep(i).filter(_ > out(i - 1)).minOption
        cand match {
          case Some(t) => out(i) = t
          case None => broken = true
        }
      }
      i += 1
    }
    out.toSeq
  }

  /** Per-user state: event-time micros per step + latest event seen. */
  final case class FState(times: Seq[Seq[Long]], maxTs: Long)

  /** Streaming funnel over a watermarked (user, ts, type) Dataset.
    * Emits `(user, Seq[t_us])` (−1 = step not reached) when the
    * watermark passes the user's last event + `quietMinutes`. Callers
    * apply `withWatermark` before the conversion to tuples (same
    * contract as [[Sessionize.streaming]]). */
  def streaming(events: Dataset[(Long, java.sql.Timestamp, String)],
                steps: Seq[String], quietMinutes: Int)
      : Dataset[(Long, Seq[Long])] = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(quietMinutes > 0,
      s"quietMinutes must be > 0, got $quietMinutes")
    val spark = events.sparkSession
    import spark.implicits._
    // an event type may appear at SEVERAL funnel positions (re-engage
    // funnels like view→buy→view) — route it to every matching index;
    // a single-index map would collapse duplicates to the last slot
    // and report zero conversions where the batch operator converts
    val stepIdx: Map[String, Seq[Int]] =
      steps.zipWithIndex.groupBy(_._1)
        .map { case (t, xs) => t -> xs.map(_._2) }
    val quietMs = quietMinutes * 60L * 1000L
    events
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, it: Iterator[(Long, java.sql.Timestamp, String)],
         state: GroupState[FState]) =>
          if (state.hasTimedOut) {
            val st = state.get
            state.remove()
            Iterator.single((uid, chain(st.times)))
          } else {
            val st = state.getOption.getOrElse(
              FState(Seq.fill(steps.length)(Seq.empty), Long.MinValue))
            val perStep = st.times.map(_.toBuffer)
            var maxTs = st.maxTs
            it.foreach { case (_, ts, tpe) =>
              // NOT getTime*1000: getTime is millis, which silently
              // truncates the sub-millisecond part the batch funnel
              // keeps (caught by the oracle at first run)
              val us = Math.floorDiv(ts.getTime, 1000L) * 1000000L +
                ts.getNanos / 1000L
              if (us > maxTs) maxTs = us
              stepIdx.getOrElse(tpe, Nil).foreach(i => perStep(i) += us)
            }
            state.update(FState(perStep.map(_.toSeq), maxTs))
            // clamp above the watermark: an event arriving exactly at
            // the boundary would otherwise register a timeout <= the
            // watermark, which throws and kills the query (same guard
            // as NearDup.candidatePairsWithin)
            state.setTimeoutTimestamp(math.max(maxTs / 1000L + quietMs,
              state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }
}
