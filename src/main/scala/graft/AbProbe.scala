package graft

import org.apache.spark.sql.SparkSession

/** In-JVM A/B for a session-conf toggle: runs each named query
  * alternately with the conf unset (A) and set (B), several rounds
  * in ONE JVM so JIT/cache warmth is shared, and reports per-query
  * min/median for both arms. The bench's fresh-JVM subset runs spread
  * 1.5× on identical code (JIT + first-touch I/O), which drowns
  * sub-30% effects; alternation cancels that.
  *
  * Usage: SPARK_GRAFT_AB_CONF="key=value" \
  *        sbt "runMain graft.AbProbe q_a q_b ..."
  * Env: SPARK_GRAFT_AB_ROUNDS (default 3), SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_AB_ROUNDS", "3").toInt
    val Array(key, value) = sys.env.getOrElse(
      "SPARK_GRAFT_AB_CONF",
      sys.error("set SPARK_GRAFT_AB_CONF=key=value")).split("=", 2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", ScratchWarehouse.dir)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.RangeJoinRewrite.install(spark)
    graft.plans.TopKPerGroup.install(spark)
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(_.getCollectionTime).sum
    }
    def once(name: String): Double = {
      spark.catalog.clearCache()
      graft.operators.Dedup.unpersistAll()
      val g0 = gcMs()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      System.err.println(f"[ab] $name ${sec}%.2f s, gc ${(gcMs() - g0) / 1e3}%.2f s")
      sec
    }
    val results = for (name <- args) yield {
      val (as, bs) = (1 to rounds).map { _ =>
        spark.conf.unset(key)
        val a = once(name)
        spark.conf.set(key, value)
        val b = once(name)
        spark.conf.unset(key)
        (a, b)
      }.unzip
      (name, as, bs)
    }
    println(f"${"query"}%-42s ${"A-min"}%8s ${"B-min"}%8s ${"B/A"}%6s   A=${key} unset, B=$value")
    results.foreach { case (n, as, bs) =>
      println(f"$n%-42s ${as.min}%8.3f ${bs.min}%8.3f ${bs.min / as.min}%6.2f   A=[${as.map(v => f"$v%.2f").mkString(",")}] B=[${bs.map(v => f"$v%.2f").mkString(",")}]")
    }
    spark.stop()
  }
}
