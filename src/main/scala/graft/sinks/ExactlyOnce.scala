package graft.sinks

import org.apache.spark.sql.DataFrame

/** Opt-in exactly-once delivery for the COPY sink — the staging-table
  * escape hatch the at-least-once contract note names
  * (CopySink.write doc): the default path re-commits a partition's
  * already-landed batches when a Spark task retries (or speculates),
  * which is the standard non-transactional-sink trade. When the target
  * cannot tolerate that, stage per partition and publish atomically:
  *
  *   1. driver: `CREATE TABLE IF NOT EXISTS <table>__graft_stage_p<pid>
  *      (LIKE <table>)` for every partition;
  *   2. executors: each task COPYies into ITS OWN stage table through an
  *      endpoint whose session setup starts with `TRUNCATE <stage>` —
  *      the endpoint factory runs once per task ATTEMPT, so a retry (or
  *      a speculative attempt) first erases whatever the failed attempt
  *      landed and the stage table always holds exactly one attempt's
  *      rows;
  *   3. driver: one transaction publishes every stage into the target
  *      (`BEGIN; INSERT INTO t SELECT * FROM stage_p0; …; COMMIT;`) —
  *      the target sees all rows or none — then drops the stages.
  *
  * Guarantees: task-retry and speculative-execution safe end to end;
  * whole-RUN retry safe up to the publish transaction (a rerun before
  * publish re-truncates and re-stages). A rerun AFTER a successful
  * publish inserts again — run-level idempotence needs a key (`INSERT
  * … ON CONFLICT DO NOTHING` via `publishSql`), exactly as any
  * transactional loader. Default CopySink behavior is untouched; this
  * is a wrapper, not a mode flag.
  *
  * Scale shape: identical to the plain sink (the COPY work is the same
  * bytes into different tables); the publish is server-side
  * `INSERT … SELECT` per partition inside one transaction — no data
  * returns to the driver. Stage-per-partition keeps TRUNCATE from
  * serializing concurrent tasks on one table's lock.
  *
  * @param exec        driver-side SQL channel to the target
  * @param endpointFor builds the per-task endpoint for a STAGE table;
  *                    implementations MUST run `TRUNCATE <stage>` as the
  *                    first session-setup statement on the connection
  *                    they open (PgWireCopyEndpoint does when given it in
  *                    sessionSetup — the connection opens once per task
  *                    attempt)
  * @param createStageSql stage DDL; default clones the target's column
  *                    layout PG-style
  * @param publishSql  per-stage publish statement inside the commit
  *                    transaction; override for `ON CONFLICT` dedup keys
  */
object ExactlyOnce {

  def stageName(table: String, pid: Int): String =
    s"${table}__graft_stage_p$pid"

  def write(df: DataFrame, table: String,
            exec: String => Unit,
            endpointFor: (String, Int) => CopyEndpoint,
            quote: String => String = identity,
            createStageSql: (String, String) => String = null,
            publishSql: (String, String) => String = null,
            maxRows: Int = 25000,
            maxBytes: Long = 20L << 20): (Long, Long, Long) = {
    val mkStage: (String, String) => String =
      if (createStageSql != null) createStageSql
      else (stage, target) =>
        s"CREATE TABLE IF NOT EXISTS ${quote(stage)} (LIKE ${quote(target)});"
    val mkPublish: (String, String) => String =
      if (publishSql != null) publishSql
      else (stage, target) =>
        s"INSERT INTO ${quote(target)} SELECT * FROM ${quote(stage)};"
    val nParts = df.rdd.getNumPartitions
    val stages = (0 until nParts).map(p => stageName(table, p))
    stages.foreach(s => exec(mkStage(s, table)))
    val sink = new CopySink(
      endpointFactory = pid => endpointFor(stageName(table, pid), pid),
      maxRows = maxRows, maxBytes = maxBytes)
    val result = sink.write(df)
    // atomic publish: all partitions land or none
    exec((Seq("BEGIN;") ++ stages.map(mkPublish(_, table)) ++
      Seq("COMMIT;")).mkString(" "))
    stages.foreach(s => exec(s"DROP TABLE IF EXISTS ${quote(s)};"))
    result
  }
}
