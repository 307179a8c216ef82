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

  test("isWellFormedUtf8 equals the strict JDK UTF-8 decoder " +
      "(randomized + exhaustive short sequences)") {
    import graft.sources.SkipLines
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    def jdkAccepts(b: Array[Byte]): Boolean =
      try {
        utf8.newDecoder().decode(java.nio.ByteBuffer.wrap(b)); true
      } catch {
        case _: java.nio.charset.CharacterCodingException => false
      }
    // exhaustive: every 1- and 2-byte sequence
    for (a <- 0 to 255) {
      val s1 = Array(a.toByte)
      assert(SkipLines.isWellFormedUtf8(s1, 0, 1) == jdkAccepts(s1),
        s"1-byte $a")
    }
    for (a <- 0 to 255; b <- Seq(0x00, 0x41, 0x7F, 0x80, 0x9F, 0xA0,
        0xBF, 0xC0, 0xC2, 0xE0, 0xED, 0xF0, 0xF4, 0xF5, 0xFF)) {
      val s2 = Array(a.toByte, b.toByte)
      assert(SkipLines.isWellFormedUtf8(s2, 0, 2) == jdkAccepts(s2),
        s"2-byte $a,$b")
    }
    // randomized longer sequences, biased toward structured bytes
    val rnd = new scala.util.Random(42)
    val pool = Array(0x24, 0x7F, 0x80, 0x9F, 0xA0, 0xBF, 0xC1, 0xC2,
      0xDF, 0xE0, 0xE1, 0xEC, 0xED, 0xEE, 0xF0, 0xF3, 0xF4, 0xF5)
    for (_ <- 1 to 20000) {
      val len = 1 + rnd.nextInt(8)
      val b = Array.fill(len)(pool(rnd.nextInt(pool.length)).toByte)
      assert(SkipLines.isWellFormedUtf8(b, 0, len) == jdkAccepts(b),
        s"seq ${b.map(x => x & 0xFF).mkString(",")}")
    }
    // valid text round-trips
    for (s <- Seq("", "plain", "h\u00e9h\u00e9", "\u6f22\u5b57",
        "\ud83d\ude42 ok", "\u0000nul")) {
      val b = s.getBytes(utf8)
      assert(SkipLines.isWellFormedUtf8(b, 0, b.length), s)
    }
  }

  test("undecodable UTF-8 rows are flagged __bad with bytes preserved") {
    val dir = java.nio.file.Files.createTempDirectory("badutf").toFile
    val f = new java.io.File(dir, "x.csv")
    val out = new java.io.FileOutputStream(f)
    out.write("1,ok\n".getBytes("UTF-8"))
    out.write(Array[Byte]('2', ',', 0xC3.toByte, 0x28, '\n')) // bad cont.
    out.write("3,fine\n".getBytes("UTF-8"))
    out.close()
    val rows = SkipLines.linesDF(spark, f.getAbsolutePath, 0, "UTF-8")
      .collect().map(r => (r.getString(0), r.getBoolean(1))).toSeq
    assert(rows.count(_._2) == 1)
    assert(rows.filter(!_._2).map(_._1).sorted == Seq("1,ok", "3,fine"))
    // the bad row's string form replacement-decodes
    assert(rows.find(_._2).get._1.startsWith("2,"))
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
