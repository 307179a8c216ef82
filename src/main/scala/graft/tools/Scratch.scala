package graft.tools
import org.apache.spark.sql.functions._
// Temporary debug harness - NOT committed
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/reference/test"
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$base/csv-non-printable.load")), "UTF-8")
    val (cmd, inline) = graft.dsl.Parser.parseWithInline(text)
    val act = graft.dsl.PlanBuilder.build(spark, cmd, base, inline)
    act.collect().foreach { r =>
      println((0 until r.length).map(i => Option(r.getString(i)).map(s => s.map(c => if (c < ' ') f"<${c.toInt}%02x>" else c.toString).mkString).getOrElse("NULL")).mkString(" | "))
    }
    spark.stop()
  }
}
