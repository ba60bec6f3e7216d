package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all suites (forked test JVM). */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession
      .builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // mirror Verify/Bench: the optimizer extensions are always on, so
    // every suite runs against the shipped configuration and the
    // leave-alone cases prove the rules don't overreach
    graft.plans.RangeJoinRewrite.install(s)
    graft.plans.TopKPerGroup.install(s)
    s
  }
}
