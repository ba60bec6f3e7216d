package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Adjudication probe for the r15 sealed-record anomaly (r16 verdict
  * task #6): q_dedup_substring_incremental sealed at 6 exchanges /
  * 9.48 MB shuffle vs the driver run's 7 / 4.07 MB — the known 6↔7
  * AQE family, but the BYTES DOUBLED on the 6-exchange path, beyond
  * the r13 "bytes pinned within 0.5%" adjudication envelope. This
  * probe re-measures in isolation (fresh JVM, warm-up query first,
  * ITERS≥4) recording per-iteration (wall, executed-plan exchange
  * count, task-tally shuffle bytes) so the per-path byte cost is
  * pinned rather than inferred from two single samples. Run:
  * `Test/runMain graft.ProbeSubstrIncrAqe /root/testdata/sf0.1`.
  */
object ProbeSubstrIncrAqe {

  private final class Tally extends SparkListener {
    val bytes = new AtomicLong()
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val m = t.taskMetrics
      if (m != null) {
        bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
  }

  private final class LastExec extends QueryExecutionListener {
    @volatile var last: Option[QueryExecution] = None
    val all = new java.util.concurrent.ConcurrentLinkedQueue[QueryExecution]()
    override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit = {
      last = Some(qe); all.add(qe)
    }
    override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val iters = sys.env.getOrElse("SPARK_GRAFT_BENCH_ITERS", "6").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", ScratchWarehouse.dir)
    // A/B knob, Bench's convention: "k=v;k=v" extra session confs
    sys.env.get("SPARK_GRAFT_SPARK_CONF").foreach {
      _.split(';').map(_.trim).filter(_.contains('=')).foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        builder.config(k, v)
      }
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.RangeJoinRewrite.install(spark)
    graft.plans.TopKPerGroup.install(spark)
    val tally = new Tally
    spark.sparkContext.addSparkListener(tally)
    val lastExec = new LastExec
    spark.listenerManager.register(lastExec)

    // warm-up: the sibling one-shot query primes JIT/IO without
    // touching the measured query's own plan-choice state
    SparkEntry.queries("q_dedup_substring")(spark, sfDir).count()

    val fn = SparkEntry.queries("q_dedup_substring_incremental")
    (1 to iters).foreach { i =>
      spark.catalog.clearCache()
      graft.operators.Dedup.unpersistAll()
      tally.bytes.set(0L)
      lastExec.last = None
      lastExec.all.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 10000L)
      val bytes = tally.bytes.get()
      val ex = lastExec.last
        .map(qe => Bench.countExchanges(qe.executedPlan)).getOrElse(-1)
      // join-strategy fingerprint of the final executed plan: which
      // AQE family fired (walk into query stages like countExchanges)
      def fp(p: org.apache.spark.sql.execution.SparkPlan): (Int, Int) = {
        import org.apache.spark.sql.execution.adaptive._
        p match {
          case a: AdaptiveSparkPlanExec => fp(a.executedPlan)
          case s: QueryStageExec => fp(s.plan)
          case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
            j.children.map(fp).foldLeft((1, 0)) { case ((a, b), (c, d)) => (a + c, b + d) }
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec =>
            j.children.map(fp).foldLeft((0, 1)) { case ((a, b), (c, d)) => (a + c, b + d) }
          case other =>
            (other.children.map(fp) ++ other.subqueries.map(fp))
              .foldLeft((0, 0)) { case ((a, b), (c, d)) => (a + c, b + d) }
        }
      }
      val (bhj, smj) = lastExec.last.map(qe => fp(qe.executedPlan)).getOrElse((-1, -1))
      // every execution in the window (operator-internal jobs too):
      // (exchanges, bhj, smj) triples in completion order
      import scala.jdk.CollectionConverters._
      val execs = lastExec.all.asScala.toSeq.map { qe =>
        val (b, s) = fp(qe.executedPlan)
        s"${Bench.countExchanges(qe.executedPlan)}/$b/$s"
      }.mkString(" ")
      lastExec.all.clear()
      println(f"[substr-incr-aqe] iter=$i sec=$sec%.3f n_exchanges=$ex " +
        f"shuffle_bytes=$bytes (${bytes / 1048576.0}%.2f MiB) bhj=$bhj smj=$smj " +
        s"execs(ex/bhj/smj)=[$execs]")
      if (sys.env.get("SPARK_GRAFT_SUBSTR_AQE_PLANS").contains("1"))
        lastExec.last.foreach { qe =>
          qe.executedPlan.toString.linesIterator
            .filter(l => l.contains("Exchange") || l.contains("Scan "))
            .foreach(l => println(s"[substr-incr-aqe]   it$i | ${l.trim.take(200)}"))
        }
    }
    spark.stop()
  }
}
