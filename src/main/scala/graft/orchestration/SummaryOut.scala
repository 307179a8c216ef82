package graft.orchestration

/** Machine-readable load-summary output — the reference's
  * `--summary <path>` feature (clojure/src/pgloader/summary.clj:99-157
  * write-summary-csv / write-summary-json; v3 main.lisp `--summary`):
  * the same three-section report [[Summary.render]] prints for humans,
  * written as semicolon-CSV or JSON for CI and monitoring consumers.
  * Field sets match the reference column-for-column: label, errors,
  * rows, bytes, total time (verbose adds read time / write time), with
  * per-phase totals and a grand total.
  *
  * One honest deviation, documented here rather than silent:
  * per-table read/write times — Spark fuses source scan and sink
  * write into one job, so the reader/writer split the reference's
  * thread pairs measure does not exist; read time is reported 0 and
  * write time carries the table's wall time. Database migrations
  * itemize the pre/post phases with real wall times
  * ([[PhaseEntry]]: "fetch meta data", "Create tables",
  * "COPY Wall-Clock Time", "Create Indexes", "Primary Keys", …);
  * runs without a phase clock (file loads, dry runs) fall back to
  * one aggregate zero-time entry per phase.
  */
object SummaryOut {

  /** summary.clj fmt-duration: seconds with 3 dp, larger units prefixed. */
  private[graft] def fmtDuration(nanos: Long): String = {
    val ms = nanos / 1000000L
    val days = ms / 86400000L
    val hours = (ms % 86400000L) / 3600000L
    val mins = (ms % 3600000L) / 60000L
    val secs = (ms % 60000L) / 1000.0
    if (days >= 1)
      f"${days}%dd ${hours}%02d:${mins}%02d:${secs}%06.3f"
    else if (hours >= 1) f"${hours}%02d:${mins}%02d:${secs}%06.3f"
    else if (mins >= 1) f"${mins}%dm${secs}%06.3fs"
    else f"${ms / 1000.0}%.3fs"
  }

  /** One summary line entry: (label, errors, rows, bytes, totalNanos,
    * readNanos, writeNanos). */
  private final case class Entry(label: String, errors: Long, rows: Long,
                                 bytes: Long, totalNanos: Long,
                                 readNanos: Long, writeNanos: Long)

  private def entries(s: Summary): Map[String, Seq[Entry]] = {
    // itemized phase rows when the run recorded them ([[PhaseEntry]] —
    // the reference's named pre/post entries with real wall times);
    // the single aggregate "pre load"/"post load" rows remain the
    // fallback for runs without a phase clock (file loads, dry runs)
    def itemized(section: String): Seq[Entry] =
      s.phaseEntries.filter(_.section == section).map(pe =>
        Entry(pe.label, 0L, pe.rows, 0L, pe.nanos, 0L, pe.nanos))
    val preItems = itemized("pre")
    val pre =
      if (preItems.nonEmpty) preItems
      else if (s.preDdl.isEmpty) Nil
      else Seq(Entry("pre load", 0L, 0L, 0L, 0L, 0L, 0L))
    val data = s.tables.map { t =>
      val nanos = t.millis * 1000000L
      Entry(s"${t.schema}.${t.table}",
        t.rejected + (if (t.error.nonEmpty) 1L else 0L),
        t.rows, t.bytes, nanos, 0L, nanos)
    }
    val postItems = itemized("post")
    val post =
      if (postItems.nonEmpty)
        // tolerated DDL failures stay visible next to the itemized
        // rows (they are not attributable to one step after the fact)
        postItems ++ (if (s.ddlErrors.isEmpty) Nil
          else Seq(Entry("post load errors", s.ddlErrors.size.toLong,
            0L, 0L, 0L, 0L, 0L)))
      else if (s.postDdl.isEmpty && s.ddlErrors.isEmpty) Nil
      else Seq(Entry("post load", s.ddlErrors.size.toLong, 0L, 0L, 0L,
        0L, 0L))
    Map("pre" -> pre, "data" -> data, "post" -> post)
  }

  private def grandErrors(s: Summary): Long =
    entries(s).values.flatten.map(_.errors).sum

  /** CSV field quoting (summary.clj csv-quote — with the closing quote
    * the reference's own implementation drops). */
  private def csvQuote(v: String): String =
    if (v.exists(c => c == ';' || c == '"'))
      "\"" + v.replace("\"", "\"\"") + "\""
    else v

  /** Semicolon-CSV summary, reference write-summary-csv layout: header,
    * pre/data/post entries in order, GRAND TOTAL last. */
  def renderCsv(s: Summary, verbose: Boolean = false): String = {
    val sb = new StringBuilder
    val header =
      if (verbose)
        Seq("table name", "errors", "rows", "bytes", "total time",
          "read time", "write time")
      else Seq("table name", "errors", "rows", "bytes", "total time")
    sb.append(header.mkString(";")).append('\n')
    val es = entries(s)
    Seq("pre", "data", "post").foreach { phase =>
      es(phase).foreach { e =>
        val base = Seq(csvQuote(e.label), e.errors.toString,
          e.rows.toString, e.bytes.toString, fmtDuration(e.totalNanos))
        val row =
          if (verbose) base ++ Seq(fmtDuration(e.readNanos),
            fmtDuration(e.writeNanos))
          else base
        sb.append(row.mkString(";")).append('\n')
      }
    }
    sb.append(Seq("GRAND TOTAL", grandErrors(s).toString,
        s.totalRows.toString, s.totalBytes.toString,
        fmtDuration(s.totalMillis * 1000000L)).mkString(";"))
      .append('\n')
    sb.toString
  }

  // minimal JSON escape (control chars included — a table name with a
  // tab must not produce unparseable output)
  private def jstr(v: String): String = "\"" + v.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** JSON summary, reference write-summary-json shape:
    * `{"phases": {"pre"|"data"|"post": {"tables": [...], "total":
    * {...}}}, "grand-total": {...}}` with the reference's key names
    * (label/errors/rows/bytes/total-time, verbose read-time/write-time;
    * totals carry rows/errs/bytes/total-nanos). */
  def renderJson(s: Summary, verbose: Boolean = false): String = {
    val es = entries(s)
    def entryJson(e: Entry): String = {
      val base = Seq(
        s"""\"label\": ${jstr(e.label)}""",
        s"""\"errors\": ${e.errors}""",
        s"""\"rows\": ${e.rows}""",
        s"""\"bytes\": ${e.bytes}""",
        s"""\"total-time\": ${e.totalNanos}""")
      val all =
        if (verbose) base ++ Seq(
          s"""\"read-time\": ${e.readNanos}""",
          s"""\"write-time\": ${e.writeNanos}""")
        else base
      all.mkString("{", ", ", "}")
    }
    def totalJson(list: Seq[Entry]): String =
      Seq(s"""\"rows\": ${list.map(_.rows).sum}""",
        s"""\"errs\": ${list.map(_.errors).sum}""",
        s"""\"bytes\": ${list.map(_.bytes).sum}""",
        s"""\"total-nanos\": ${list.map(_.totalNanos).sum}""")
        .mkString("{", ", ", "}")
    val phases = Seq("pre", "data", "post").map { phase =>
      val list = es(phase)
      s"""${jstr(phase)}: {\"tables\": ${
        list.map(entryJson).mkString("[", ", ", "]")}, \"total\": ${
        totalJson(list)}}"""
    }.mkString("{", ", ", "}")
    val grand = Seq(
      s"""\"rows\": ${s.totalRows}""",
      s"""\"errs\": ${grandErrors(s)}""",
      s"""\"bytes\": ${s.totalBytes}""",
      s"""\"total-nanos\": ${s.totalMillis * 1000000L}""")
      .mkString("{", ", ", "}")
    s"""{\"phases\": $phases, \"grand-total\": $grand}"""
  }

  /** Reference write-summary dispatch: `.json` → JSON, anything else
    * (including `.csv`) → CSV. Prints the confirmation line the
    * reference prints. */
  def write(s: Summary, path: String, verbose: Boolean = false): Unit = {
    val out =
      if (path.endsWith(".json")) renderJson(s, verbose)
      else renderCsv(s, verbose)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      out.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    println(s"Summary written to $path")
  }
}
