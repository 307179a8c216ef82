package graft

import java.nio.file.Files
import graft.sinks.{CopyEndpoint, CopyError, CopySink}

/** The sink's untested modes: reject files (bad rows land in per-task
  * .dat files in COPY text, docs/batches.rst:27-34) and on-error-stop
  * (fail fast, no recovery — copy-from-queue.lisp:53-59). */
object SinkModesSpec {
  def rejectingEndpoint(): CopyEndpoint = new CopyEndpoint {
    def send(rows: Seq[Array[Byte]]): Unit =
      rows.zipWithIndex.foreach { case (b, i) =>
        val k = new String(b, "UTF-8").split("\t")(0).toLong
        if (k % 10 == 3) throw CopyError(Some(i + 1), s"bad row $k")
      }
  }
  def countingEndpoint(): CopyEndpoint = new CopyEndpoint {
    def send(rows: Seq[Array[Byte]]): Unit = ()
  }
}

class SinkModesSpec extends SparkSpec {

  import spark.implicits._
  import SinkModesSpec._

  test("reject files collect exactly the bad rows in COPY text") {
    val dir = Files.createTempDirectory("rejects").toFile.getAbsolutePath
    val df = (1L to 100L).toDF("k")
      .withColumn("v", org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("val"),
        org.apache.spark.sql.functions.col("k")))
      .repartition(4)
    val sink = new CopySink(endpointFactory = _ => rejectingEndpoint(),
      rejectDir = Some(dir))
    val (sent, rejected, _) = sink.write(df)
    assert(sent == 90 && rejected == 10)
    val rejectedKeys = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".dat"))
      .flatMap(f => scala.io.Source.fromFile(f).getLines())
      .map(_.split("\t")(0).toLong).sorted.toSeq
    assert(rejectedKeys == (1L to 100L).filter(_ % 10 == 3))
  }

  test("on-error-stop fails the write instead of recovering") {
    val df = (1L to 50L).toDF("k").repartition(2)
    val sink = new CopySink(endpointFactory = _ => rejectingEndpoint(),
      onErrorStop = true)
    val e = intercept[org.apache.spark.SparkException](sink.write(df))
    assert(e.getMessage != null)
  }

  test("clean data passes through untouched in stop mode") {
    val df = (1L to 20L).filter(_ % 10 != 3).toDF("k").repartition(2)
    val sink = new CopySink(endpointFactory = _ => countingEndpoint(),
      onErrorStop = true)
    val (sent, rejected, _) = sink.write(df)
    assert(sent == 18 && rejected == 0)
  }
}
