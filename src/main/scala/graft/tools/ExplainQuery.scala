package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of one or more
  * [[graft.SparkEntry]] queries without executing them — the loop behind
  * "iterate until it's the plan you'd want" (broadcasts where expected,
  * filters pushed to the scan, WindowGroupLimit below the exchange).
  *
  * Usage: runMain graft.tools.ExplainQuery <sfDir> <name>[,<name>...]
  */
object ExplainQuery {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: ExplainQuery <sfDir> <queryName>[,<queryName>...]")
    val (dir, names) = (args(0), args(1).split(',').toSeq)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
