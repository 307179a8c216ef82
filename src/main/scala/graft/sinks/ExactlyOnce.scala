package graft.sinks

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame

/** Opt-in exactly-once delivery for the COPY sink — the staging-table
  * escape hatch the at-least-once contract note names
  * (CopySink.write doc): the default path re-commits a partition's
  * already-landed batches when a Spark task retries (or speculates),
  * which is the standard non-transactional-sink trade. When the target
  * cannot tolerate that, stage per TASK ATTEMPT and publish atomically:
  *
  *   1. driver: pattern-drop any stale `<table>__graft_stage_p*` tables
  *      a previously crashed run left behind;
  *   2. executors: each task attempt COPYies into ITS OWN stage table,
  *      named by the attempt's globally-unique taskAttemptId — the
  *      endpoint's session setup runs `CREATE TABLE IF NOT EXISTS
  *      <stage> (LIKE <table>); TRUNCATE <stage>` on its own fresh
  *      connection, so CONCURRENT speculative attempts write disjoint
  *      tables and can never erase or interleave each other's batches
  *      (a single per-partition stage truncated per attempt is only
  *      sequential-retry safe: a slower concurrent attempt's TRUNCATE
  *      would silently drop the winner's committed batches);
  *   3. executors: the attempt that Spark accepts as the partition's
  *      completion records its stage name through an accumulator —
  *      Spark applies result-stage accumulator updates only for the
  *      FIRST successful completion of each partition, so exactly one
  *      winner is recorded per partition;
  *   4. driver: one transaction publishes every WINNING stage into the
  *      target (`BEGIN; INSERT INTO t SELECT * FROM stage; …; COMMIT;`)
  *      — the target sees all rows or none — then pattern-drops all
  *      stages (winners and any losing attempts' leftovers).
  *
  * Guarantees: task-retry AND speculative-execution safe end to end —
  * concurrent attempts are isolated by construction, not serialized.
  * Whole-RUN retry safe up to the publish transaction (a rerun
  * pre-cleans and re-stages). A rerun AFTER a successful publish
  * inserts again — run-level idempotence needs a key (`INSERT … ON
  * CONFLICT DO NOTHING` via `publishSql`), exactly as any transactional
  * loader. Default CopySink behavior is untouched; this is a wrapper,
  * not a mode flag.
  *
  * Scale shape: identical to the plain sink (the COPY work is the same
  * bytes into different tables); the publish is server-side
  * `INSERT … SELECT` per partition inside one transaction — no data
  * returns to the driver. Stage-per-attempt additionally keeps
  * concurrent attempts off each other's locks entirely.
  *
  * @param exec        driver-side SQL channel to the target
  * @param endpointFor builds the per-task-attempt endpoint for a STAGE
  *                    table: (stageName, sessionSetup, pid). The
  *                    implementation MUST run the given sessionSetup
  *                    statements first on the connection it opens
  *                    (PgWireCopyEndpoint does when they are passed as
  *                    its sessionSetup — the connection opens once per
  *                    task attempt); the wrapper supplies the
  *                    CREATE-stage + TRUNCATE statements
  * @param createStageSql stage DDL; default clones the target's column
  *                    layout PG-style
  * @param publishSql  per-stage publish statement inside the commit
  *                    transaction; override for `ON CONFLICT` dedup keys
  * @param dropStagesSql one statement dropping ALL of `table`'s stage
  *                    tables by name pattern; default is a PG DO block
  *                    over pg_tables — override for non-PG targets
  */
object ExactlyOnce extends Serializable {

  def stagePrefix(table: String): String = s"${table}__graft_stage_p"

  def stageName(table: String, pid: Int, attemptId: Long): String =
    s"${stagePrefix(table)}${pid}_a$attemptId"

  def write(df: DataFrame, table: String,
            exec: String => Unit,
            endpointFor: (String, Seq[String], Int) => CopyEndpoint,
            quote: String => String = identity,
            createStageSql: (String, String) => String = null,
            publishSql: (String, String) => String = null,
            dropStagesSql: String => String = null,
            maxRows: Int = 25000,
            maxBytes: Long = 20L << 20,
            publishExtra: Seq[String] = Nil): (Long, Long, Long) = {
    val mkStage: (String, String) => String =
      if (createStageSql != null) createStageSql
      else (stage, target) =>
        s"CREATE TABLE IF NOT EXISTS ${quote(stage)} (LIKE ${quote(target)});"
    val mkPublish: (String, String) => String =
      if (publishSql != null) publishSql
      else (stage, target) =>
        s"INSERT INTO ${quote(target)} SELECT * FROM ${quote(stage)};"
    val mkDrop: String => String =
      if (dropStagesSql != null) dropStagesSql
      else t =>
        "DO $$ DECLARE r record; BEGIN " +
          "FOR r IN SELECT tablename FROM pg_tables WHERE tablename LIKE " +
          s"'${stagePrefix(t).replace("'", "''").replace("_", "\\_")}%' " +
          "ESCAPE '\\' LOOP " +
          "EXECUTE 'DROP TABLE ' || quote_ident(r.tablename); " +
          "END LOOP; END $$;"
    // pre-clean: a previously crashed run's stages must not publish
    exec(mkDrop(table))
    val winners = df.sparkSession.sparkContext
      .collectionAccumulator[String]("graftStageWinners")
    val tbl = table; val ef = endpointFor; val q = quote
    def attemptStage(pid: Int): String = {
      // taskAttemptId is unique across the application, so concurrent
      // speculative attempts — and resubmitted stages — get disjoint
      // stage tables; outside a task (unit-test harnesses) fall back
      // to attempt 0
      val att = Option(TaskContext.get).map(_.taskAttemptId).getOrElse(0L)
      stageName(tbl, pid, att)
    }
    val sink = new CopySink(
      endpointFactory = pid => {
        val stage = attemptStage(pid)
        ef(stage, Seq(mkStage(stage, tbl), s"TRUNCATE ${q(stage)};"), pid)
      },
      maxRows = maxRows, maxBytes = maxBytes,
      // runs after the attempt's final flush: result-stage accumulator
      // semantics record exactly one completed attempt per partition
      onPartitionSuccess = pid => winners.add(attemptStage(pid)))
    val result = sink.write(df)
    import scala.jdk.CollectionConverters._
    val stages = winners.value.asScala.toSeq.distinct.sorted
    // atomic publish: all partitions land or none; `publishExtra`
    // statements (e.g. the streaming epoch marker) commit atomically
    // WITH the data
    exec((Seq("BEGIN;") ++ stages.map(mkPublish(_, table)) ++
      publishExtra ++ Seq("COMMIT;")).mkString(" "))
    exec(mkDrop(table))
    result
  }

  /** Exactly-once STREAMING delivery: the `foreachBatch` body for a
    * Structured Streaming query writing to PostgreSQL. Spark's
    * foreachBatch is at-least-once — after a crash between a batch's
    * side effect and the checkpoint commit, the SAME (queryId, batchId)
    * replays. This wrapper makes the replay a no-op: each batch stages
    * per task attempt exactly like [[write]], and the publish
    * transaction ALSO inserts an epoch marker row into
    * `<table>__graft_epochs` — data and marker commit atomically, so a
    * replayed batch sees its marker and skips, and a crash BEFORE the
    * publish left no marker and no published rows (the rerun's
    * pre-clean drops its orphan stages). The standard idempotent-sink
    * pattern, with the dedup ledger server-side in the target database.
    *
    * Usage: `ds.writeStream.foreachBatch { (batch, id) =>
    *   ExactlyOnce.writeStreamBatch(batch, "events", qid, id, …); () }`
    *
    * @param query read-only SQL against the target (epoch lookup)
    * @return (sent, rejected, bytes); (0, 0, 0) for a replayed batch
    */
  def writeStreamBatch(df: DataFrame, table: String,
                       queryId: String, batchId: Long,
                       exec: String => Unit,
                       query: String => Seq[Array[String]],
                       endpointFor: (String, Seq[String], Int) => CopyEndpoint,
                       quote: String => String = identity,
                       maxRows: Int = 25000,
                       maxBytes: Long = 20L << 20): (Long, Long, Long) = {
    val epochs = s"${table}__graft_epochs"
    val qlit = "'" + queryId.replace("'", "''") + "'"
    exec(s"CREATE TABLE IF NOT EXISTS ${quote(epochs)} " +
      "(query_id text NOT NULL, batch_id bigint NOT NULL, " +
      "PRIMARY KEY (query_id, batch_id));")
    val seen = query(s"SELECT 1 FROM ${quote(epochs)} " +
      s"WHERE query_id = $qlit AND batch_id = $batchId")
    if (seen.nonEmpty) (0L, 0L, 0L)
    else write(df, table, exec, endpointFor, quote,
      maxRows = maxRows, maxBytes = maxBytes,
      publishExtra = Seq(s"INSERT INTO ${quote(epochs)} " +
        s"VALUES ($qlit, $batchId);"))
  }
}
