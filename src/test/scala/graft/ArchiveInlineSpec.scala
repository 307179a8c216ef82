package graft

import java.io.{File, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.dsl.{Parser, PlanBuilder}

/** LOAD ARCHIVE (zip expansion + ordered sub-commands) and FROM inline
  * (data embedded after the command). */
class ArchiveInlineSpec extends SparkSpec {

  private def mkZip(entries: (String, String)*): String = {
    val f = File.createTempFile("graft-arch", ".zip")
    val z = new ZipOutputStream(new FileOutputStream(f))
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes("UTF-8"))
      z.closeEntry()
    }
    z.close()
    f.getAbsolutePath
  }

  test("archive with two ordered csv sub-commands") {
    val zip = mkZip(
      "regions.csv" -> "1,east\n2,west\n",
      "cities.csv" -> "10,1,springfield\n20,2,shelbyville\n")
    val cmd = Parser.parse(
      s"""LOAD ARCHIVE FROM '$zip' INTO postgresql:///t
          LOAD CSV FROM FILENAME MATCHING ~/regions[.]csv/
            HAVING FIELDS (r_id, r_name)
            INTO postgresql:///t TARGET TABLE regions;
          LOAD CSV FROM FILENAME MATCHING ~/cities[.]csv/
            HAVING FIELDS (c_id, c_region, c_name)
            INTO postgresql:///t TARGET TABLE cities;
          ;""")
    assert(cmd.loadType == "archive" && cmd.subCommands.length == 2)
    val results = PlanBuilder.buildArchive(spark, cmd)
    assert(results.map(_._1.targetTable) ==
      Seq(Some("regions"), Some("cities")))
    val regions = results(0)._2.collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    assert(regions.toSeq == Seq(("1", "east"), ("2", "west")))
    assert(results(1)._2.count() == 2)
  }

  test("zip-slip entries are rejected") {
    val zip = mkZip("../evil.txt" -> "boom")
    val e = intercept[Exception](graft.sources.Archive.expand(zip))
    assert(e.getMessage.contains("escapes"))
  }

  test("http source downloads from a real (local) server and loads") {
    // zero-egress-safe: a loopback JDK HttpServer serves the CSV bytes
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val body = "10,alpha\n20,beta\n".getBytes("UTF-8")
    server.createContext("/data.csv",
      (ex: com.sun.net.httpserver.HttpExchange) => {
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      })
    server.start()
    try {
      val port = server.getAddress.getPort
      val cmd = Parser.parse(
        s"""LOAD CSV FROM 'http://127.0.0.1:$port/data.csv'
            HAVING FIELDS (k, v)
            INTO postgresql:///t TARGET TABLE kv
            WITH fields terminated by ','""")
      val got = PlanBuilder.build(spark, cmd)
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      assert(got.toSeq == Seq(("10", "alpha"), ("20", "beta")))
      // a 404 fails loudly, not silently empty
      val bad = Parser.parse(
        s"""LOAD CSV FROM 'http://127.0.0.1:$port/missing.csv'
            HAVING FIELDS (k, v)
            INTO postgresql:///t TARGET TABLE kv""")
      val e = intercept[Exception](PlanBuilder.build(spark, bad))
      assert(e.getMessage.contains("404"))
    } finally server.stop(0)
  }

  test("FROM inline reads the payload after the command") {
    val text =
      """LOAD CSV FROM inline
           HAVING FIELDS (k, v)
           INTO postgresql:///t TARGET TABLE kv
           WITH fields terminated by ',';
         1,one
         2,two
         3,three"""
    val (cmd, inline) = Parser.parseWithInline(text)
    assert(cmd.source.contains(graft.dsl.Ast.InlineData))
    assert(inline.nonEmpty)
    val df = PlanBuilder.build(spark, cmd, inlineData =
      inline.map(_.linesIterator.map(_.trim).filter(_.nonEmpty)
        .mkString("\n")))
    val got = df.collect().map(r => (r.getString(0), r.getString(1)))
      .sortBy(_._1)
    assert(got.toSeq == Seq(("1", "one"), ("2", "two"), ("3", "three")))
  }
}
