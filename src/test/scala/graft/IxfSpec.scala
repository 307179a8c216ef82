package graft

import graft.sources.IxfSource
import graft.sources.IxfSource.IxfColumn

object IxfSpec {
  /** shared with local-mode executor tasks (closures are serialized) */
  val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]
}

/** PC/IXF reader against the reference's OWN fixtures
  * (test/data/nsitra.test*.ixf) and its regress golden
  * (test/regress/expected/ixf.out). */
class IxfSpec extends SparkSpec {

  private def fixture(n: Int): Array[Byte] =
    java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      s"/root/reference/test/data/nsitra.test$n.ixf"))

  test("test1 decodes to exactly the reference's expected output") {
    val parsed = IxfSource.parse(fixture(1))
    assert(parsed.columns.map(_.name) == Seq("test1_id", "intcol",
      "intcal_notnull", "charcol15", "charcol15_notnull", "varcharcol16",
      "varcharcol16_notnull"))
    val expected = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(
          "/root/reference/test/regress/expected/ixf.out")), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
      .map(_.split("\t", -1).map(v => if (v == "\\N") null else v).toSeq)
    val got = parsed.rows.map(_.toSeq)
    assert(got == expected, s"golden mismatch:\n$got\nvs\n$expected")
  }

  test("timestamp, numeric and time/date fixtures parse with PG shapes") {
    val ts = IxfSource.parse(fixture(2))
    assert(ts.columns.forall(_.typeCode == 392))
    // 'yyyy-mm-dd HH:MM:SS.ffffff'
    val tsRe = "\\d{4}-\\d{2}-\\d{2} \\d{2}:\\d{2}:\\d{2}\\.\\d{6}".r
    ts.rows.flatten.filter(_ != null).foreach(v =>
      assert(tsRe.matches(v), s"bad timestamp shape: $v"))

    val num = IxfSource.parse(fixture(3))
    assert(num.columns.map(_.typeCode) == Seq(500, 492, 484, 480, 480))
    num.rows.flatten.filter(_ != null).foreach(v =>
      assert(v.matches("-?\\d+(\\.\\d+)?([eE]-?\\d+)?"), s"bad number: $v"))

    val dt = IxfSource.parse(fixture(4))
    assert(dt.columns.map(_.typeCode) == Seq(388, 388, 384, 384))
    val timeRe = "\\d{2}:\\d{2}:\\d{2}".r
    val dateRe = "\\d{4}-\\d{2}-\\d{2}".r
    dt.rows.foreach { r =>
      Seq(r(0), r(1)).filter(_ != null).foreach(v =>
        assert(timeRe.matches(v), s"bad time: $v"))
      Seq(r(2), r(3)).filter(_ != null).foreach(v =>
        assert(dateRe.matches(v), s"bad date: $v"))
    }
  }

  test("pg type mapping") {
    assert(IxfSource.pgType(IxfColumn("a", true, 496, "", 1, 1)) ==
      "integer")
    assert(IxfSource.pgType(IxfColumn("a", true, 484, "00502", 1, 1)) ==
      "numeric(5,2)")
    assert(IxfSource.pgType(IxfColumn("a", true, 448, "00016", 1, 1)) ==
      "varchar(16)")
    assert(IxfSource.pgType(IxfColumn("a", true, 392, "00006", 1, 1)) ==
      "timestamp")
  }

  test("streaming schema read stops before row data") {
    val in = new java.io.FileInputStream(
      "/root/reference/test/data/nsitra.test1.ixf")
    val cols = try IxfSource.readColumns(in) finally in.close()
    assert(cols.map(_.name).take(2) == Seq("test1_id", "intcol"))
    assert(cols.forall(_.drid == 1))
  }

  test("the reference's own ixf.load runs end-to-end through the Runner") {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/root/reference/test/ixf.load")), "UTF-8")
    val ddl = new java.util.concurrent.ConcurrentLinkedQueue[String]
    IxfSpec.rows.clear()
    val runner = new Runner(
      executeDdl = (sql, _) => ddl.add(sql),
      // endpoint closures are task-serialized: collect through static
      // state, which local-mode executors share with the driver JVM
      endpointFactory = (_, _) => _ => new graft.sinks.CopyEndpoint {
        def send(batch: Seq[Array[Byte]]): Unit =
          batch.foreach(b =>
            IxfSpec.rows.add(new String(b, "UTF-8").stripSuffix("\n")))
      })
    val stats = runner.runFile(spark, text, baseDir = "/root/reference/test")
    assert(stats.map(_.rows) == Seq(4L))
    import scala.jdk.CollectionConverters._
    assert(ddl.asScala.exists(_.contains("drop schema if exists nsitra")))
    // row 2 of the golden: nullable cols are NULL (\N on the wire)
    assert(IxfSpec.rows.asScala.exists(r =>
      r.startsWith("2\t\\N\t88\t\\N\tabcdef")))
  }

  test("LOAD IXF flows through the PlanBuilder") {
    val cmd = graft.dsl.Parser.parse(
      """LOAD IXF FROM '/root/reference/test/data/nsitra.test1.ixf'
         INTO postgresql:///g TARGET TABLE nsitra_test1""")
    val df = graft.dsl.PlanBuilder.build(spark, cmd)
    assert(df.columns.head == "test1_id")
    assert(df.count() == 4)
  }
}
