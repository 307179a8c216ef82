package graft

import java.nio.file.Files
import graft.sources.{CsvDialect, CsvSource, SkipLines}

/** Per-file preamble skip: each file of a multi-file source drops its own
  * head lines (csv.lisp:84-127), including files shorter than the skip. */
class SkipLinesSpec extends SparkSpec {

  private def tmpDir(files: (String, String)*): String = {
    val dir = Files.createTempDirectory("skiplines").toFile
    files.foreach { case (name, content) =>
      Files.write(new java.io.File(dir, name).toPath,
        content.getBytes("UTF-8"))
    }
    dir.getAbsolutePath
  }

  test("each file drops its own head lines") {
    val dir = tmpDir(
      "a.txt" -> "pre1\npre2\na1\na2\n",
      "b.txt" -> "pre1\npre2\nb1\n")
    val got = SkipLines.lines(spark, dir, 2).collect().toSeq.sorted
    assert(got == Seq("a1", "a2", "b1"))
  }

  test("skip longer than the file drops the whole file") {
    val dir = tmpDir("short.txt" -> "only\n", "ok.txt" -> "p\nkeep\n")
    val got = SkipLines.lines(spark, dir, 1).collect().toSeq.sorted
    assert(got == Seq("keep"))
  }

  test("zero skip is the plain text read") {
    val dir = tmpDir("a.txt" -> "x\ny\n")
    assert(SkipLines.lines(spark, dir, 0).collect().toSeq.sorted ==
      Seq("x", "y"))
  }

  test("strict decode: undecodable bytes reject the ROW, not mojibake") {
    // a latin1 'é' (0xE9) in a file declared ascii: the reference's
    // decoder errors and the row lands in rejects (csv-error.load);
    // replacement-decoding would silently load mojibake
    val dir = Files.createTempDirectory("strictdec").toFile
    val f = new java.io.File(dir, "x.csv")
    Files.write(f.toPath,
      ("ok|1\n" + "hé|2\n" + "fine|3\n").getBytes("ISO-8859-1"))
    val d = CsvDialect(separator = '|', encoding = "us-ascii",
      skipLines = 1) // skip>0 forces the decoding path
    val got = CsvSource.read(spark, f.getAbsolutePath, d, Seq("a", "b"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("fine", "3")))
    val rej = CsvSource.rejects(spark, f.getAbsolutePath, d, Seq("a", "b"))
      .collect().map(_.getString(0)).toSeq
    assert(rej.length == 1 && rej.head.endsWith("|2"),
      s"undecodable row must surface in rejects: $rej")
    // the same bytes under the RIGHT charset load fully
    val ok = CsvSource.read(spark, f.getAbsolutePath,
        d.copy(encoding = "latin1"), Seq("a", "b"))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(ok == Seq("fine", "hé"))
  }

  test("COPY and fixed-width reads surface undecodable rows as rejects") {
    // invalid UTF-8 (a lone 0xE9 latin1 byte) mid-file: the row must
    // not silently vanish — it is excluded from data AND surfaced by
    // the rejects() companion so the loader counts it (the r14 ADVICE
    // finding: these paths dropped __bad rows with stats unchanged)
    val dir = Files.createTempDirectory("strictrej").toFile
    val f = new java.io.File(dir, "x.dat")
    val out = new java.io.FileOutputStream(f)
    out.write("ok\t1\n".getBytes("UTF-8"))
    out.write("hé\t2\n".getBytes("ISO-8859-1")) // bad UTF-8
    out.write("fine\t3\n".getBytes("UTF-8"))
    out.close()
    val copied = graft.sources.CopyText
      .read(spark, f.getAbsolutePath, Seq("a", "b"))
      .collect().map(_.getString(0)).toSeq.sorted
    assert(copied == Seq("fine", "ok"))
    val copyRej = graft.sources.CopyText.rejects(spark, f.getAbsolutePath)
      .collect().map(_.getString(0)).toSeq
    assert(copyRej.length == 1 && copyRej.head.endsWith("\t2"),
      s"undecodable COPY row must surface in rejects: $copyRej")
    import graft.sources.FixedWidth
    val specs = Seq(FixedWidth.FieldPos("a", 0, 4),
      FixedWidth.FieldPos("b", 4, 2))
    val fixed = FixedWidth.read(spark, f.getAbsolutePath, specs)
      .collect().map(_.getString(0)).toSeq.sorted
    assert(fixed.length == 2, s"bad row excluded from fixed data: $fixed")
    val fixedRej = FixedWidth.rejects(spark, f.getAbsolutePath)
      .collect().map(_.getString(0)).toSeq
    assert(fixedRej.length == 1,
      s"undecodable fixed row must surface in rejects: $fixedRej")
  }

  test("splitHint splits only inputs big enough for 4 MB per split") {
    // tiny file: splitHint must NOT shatter it — file-order serial
    // semantics depend on sub-4MB inputs staying one task
    val small = tmpDir("s.txt" -> (1 to 100).map(i => s"row$i").mkString("\n"))
    assert(SkipLines.lines(spark, small, 0, "UTF-8", splitHint = 8)
      .rdd.getNumPartitions == 1)
    // ~9 MB file: splitHint=8 is size-capped to 2 splits (9MB/4MB)
    val line = "x" * 99
    val big = tmpDir("b.txt" ->
      Seq.fill(90000)(line).mkString("\n"))
    val parts = SkipLines.lines(spark, big, 0, "UTF-8", splitHint = 8)
      .rdd.getNumPartitions
    assert(parts == 2, s"9 MB at hint 8 must size-cap to 2 splits, got $parts")
    // no hint: one split regardless (sub-block file)
    assert(SkipLines.lines(spark, big, 0).rdd.getNumPartitions == 1)
    // rows identical across split settings
    assert(SkipLines.lines(spark, big, 0, "UTF-8", 8).count() == 90000L)
  }

  test("CSV read honors skipLines + header per file") {
    val dir = tmpDir(
      "a.csv" -> "junk|junk\nk|v\n1|one\n2|two\n",
      "b.csv" -> "junk|junk\nk|v\n3|three\n")
    val got = CsvSource.read(spark, dir,
        CsvDialect(separator = '|', skipLines = 1, header = true),
        Seq("k", "v"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq.sorted
    assert(got == Seq(("1", "one"), ("2", "two"), ("3", "three")))
  }
}
