package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: print the formatted physical plan of driver
  * queries (all, or the names passed as args). Used each round to
  * check the plans still have the shapes the scale design expects —
  * pushed filters, pruned ReadSchema, broadcast dims, single-exchange
  * diff join, wide WholeStageCodegen spans.
  */
object ExplainProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      println(s"========== $q ==========")
      println(SparkEntry.queries(q)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
