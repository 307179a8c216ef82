package graft

import java.nio.file.Files
import graft.sinks.{CopyEndpoint, CopyError, CopySink, LocalCopy, PgBinary}

/** The driver-local small-table fast path ([[graft.sinks.LocalCopy]]):
  * its scalar renderers must stay byte-identical to the distributed
  * sink's codegen renderers (the fast path is a pure execution-venue
  * change, never a format change), and its batch/reject machinery must
  * honor the same recovery contract. */
class LocalCopySpec extends SparkSpec {

  // tricky corpus: every COPY TEXT escape class, unicode, nulls, the
  // literal "\N" spelling that must NOT round-trip as NULL, plus a
  // seeded random batch for breadth
  private val tricky: Seq[String] = Seq(
    "", "\t", "\n", "\r", "\\", "\\N", "a\tb\nc\\d", "héllo wörld",
    "line1\nline2", "\\x41", "  padded  ", "∀x∈X", "\u0001\u007f",
    "ends with backslash\\", "\btab\fvert\u000b")
  private val rnd = new scala.util.Random(18)
  private def randomString(): String = {
    val chars = "ab\t\n\\é∀ \r"
    (0 until rnd.nextInt(12)).map(_ => chars(rnd.nextInt(chars.length)))
      .mkString
  }
  private val rows3: Seq[Array[String]] =
    tricky.map(s => Array(s, null: String, s.reverse)) ++
      (0 until 40).map(_ => Array(
        if (rnd.nextInt(5) == 0) null else randomString(),
        if (rnd.nextInt(5) == 0) null else randomString(),
        if (rnd.nextInt(5) == 0) null else randomString()))

  private def stringDf(rows: Seq[Array[String]]) = {
    import scala.jdk.CollectionConverters._
    val schema = org.apache.spark.sql.types.StructType(Seq("a", "b", "c")
      .map(n => org.apache.spark.sql.types.StructField(n,
        org.apache.spark.sql.types.StringType)))
    spark.createDataFrame(
      rows.map(r => org.apache.spark.sql.Row(r.toIndexedSeq: _*)).asJava,
      schema)
  }

  test("textRender matches the codegen textRenderer byte-for-byte") {
    val codegen = CopySink.textRenderer(stringDf(rows3)).collect()
      .map(_.getAs[Array[Byte]](0).toSeq)
    val local = rows3.map(r => LocalCopy.textRender(r)._1.toSeq)
    assert(codegen.length == local.length)
    // a local relation of this size collects in input order
    codegen.zip(local).zipWithIndex.foreach { case ((c, l), i) =>
      assert(c == l, s"row $i diverged")
    }
  }

  test("binaryRender matches the codegen rowColumn frames, including " +
    "the reject contract for unparseable values") {
    val kinds = Seq("int4", "text", "numeric").map(PgBinary.kindOf(_).get)
    val rows: Seq[Array[String]] = Seq(
      Array("1", "plain", "3.14"),
      Array(null, "x\ty", "0"),
      Array("not-an-int", "t", "1"), // int4 encode failure → reject
      Array("-42", null, "NaN"),
      Array("2147483647", "", "bogus"), // numeric failure → reject
      Array("7", "héllo", "-999999.99"))
    val codegen = PgBinary.renderer(kinds)(stringDf(rows)).collect()
      .map { r =>
        (Option(r.getAs[Array[Byte]](0)).map(_.toSeq),
          Option(r.getAs[Array[Byte]](1)).map(_.toSeq))
      }
    val render = LocalCopy.binaryRender(kinds)
    val local = rows.map { r =>
      val (v, j) = render(r)
      (Option(v).map(_.toSeq), Option(j).map(_.toSeq))
    }
    codegen.zip(local).zipWithIndex.foreach { case ((c, l), i) =>
      assert(c == l, s"row $i diverged")
    }
    // the two failure rows rejected in both paths
    assert(local.count(_._1.isEmpty) == 2)
  }

  test("write: batches flow through BatchRetry with the line-numbered " +
    "prefix-resend contract; rejects land in part-00000.dat") {
    val landed = scala.collection.mutable.ArrayBuffer.empty[String]
    val endpoint = new CopyEndpoint {
      def send(rows: Seq[Array[Byte]]): Unit = {
        val bad = rows.indexWhere(b => new String(b, "UTF-8").contains("BAD"))
        if (bad >= 0) throw CopyError(Some(bad + 1), "boom")
        rows.foreach(b => landed += new String(b, "UTF-8").stripSuffix("\n"))
      }
    }
    val dir = Files.createTempDirectory("localcopy").toString
    val rows = Iterator(Array[String]("1", "a"), Array("2", "BAD"),
      Array("3", "c"), Array[String](null, "d"))
    val (sent, rejected, bytes) = LocalCopy.write(rows, _ => endpoint,
      rejectDir = Some(dir))
    assert(sent == 3 && rejected == 1)
    assert(bytes > 0)
    assert(landed == Seq("1\ta", "3\tc", "\\N\td"))
    val rf = new java.io.File(dir, "part-00000.dat")
    assert(rf.exists())
    val content = new String(Files.readAllBytes(rf.toPath), "UTF-8")
    assert(content == "2\tBAD\n")
  }

  test("write: binary encode failures reject with the row's COPY TEXT " +
    "line, like the distributed renderer's reject column") {
    val kinds = Seq(PgBinary.kindOf("int4").get)
    val landed = scala.collection.mutable.ArrayBuffer.empty[Int]
    val endpoint = new CopyEndpoint {
      def send(rows: Seq[Array[Byte]]): Unit = landed += rows.length
    }
    val dir = Files.createTempDirectory("localcopybin").toString
    val (sent, rejected, _) = LocalCopy.write(
      Iterator(Array("41"), Array("nope"), Array("42")),
      _ => endpoint, render = LocalCopy.binaryRender(kinds),
      rejectDir = Some(dir))
    assert(sent == 2 && rejected == 1)
    val content = new String(Files.readAllBytes(
      new java.io.File(dir, "part-00000.dat").toPath), "UTF-8")
    assert(content == "nope\n")
  }

  test("write: onErrorStop fails fast instead of rejecting") {
    val endpoint = new CopyEndpoint {
      def send(rows: Seq[Array[Byte]]): Unit =
        throw CopyError(Some(1), "constraint")
    }
    intercept[CopyError] {
      LocalCopy.write(Iterator(Array("x")), _ => endpoint,
        onErrorStop = true)
    }
  }
}
