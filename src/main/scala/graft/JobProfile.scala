package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.QueryPlanningTracker
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Job-level profiler for single queries (guide §1: measure first).
  * Runs the named queries exactly the way Bench does (same master,
  * same shuffle partitions, same extensions, count() action) but with
  * a listener that records, per Spark job: wall time, task time,
  * shuffle read/write bytes, and the job's call site — so a 3-batch
  * lifecycle query's 60 s decomposes into its ~100 constituent jobs
  * and the expensive ones are visible by name instead of by guess.
  *
  * Usage: sbt "runMain graft.JobProfile q_pipeline_ingest_export_media"
  * Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
  *      SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROFILE_TOP (rows to print, default 40).
  */
object JobProfile {

  private final case class JobRec(
      jobId: Int, var site: String = "", var t0: Long = 0L, var t1: Long = 0L,
      var taskNanos: Long = 0L, var shufRead: Long = 0L, var shufWrite: Long = 0L,
      var tasks: Int = 0)

  private final class JobTimer extends SparkListener {
    val jobs = new ConcurrentHashMap[Int, JobRec]()
    private val stageToJob = new ConcurrentHashMap[Int, Int]()
    override def onJobStart(j: SparkListenerJobStart): Unit = {
      val r = JobRec(j.jobId)
      r.site = Option(j.properties)
        .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
      r.t0 = j.time
      jobs.put(j.jobId, r)
      j.stageIds.foreach(s => stageToJob.put(s, j.jobId))
    }
    override def onJobEnd(j: SparkListenerJobEnd): Unit = {
      val r = jobs.get(j.jobId); if (r != null) r.t1 = j.time
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      val jid = stageToJob.get(t.stageId)
      val r = jobs.get(jid)
      val m = t.taskMetrics
      if (r != null && m != null) r.synchronized {
        r.taskNanos += m.executorRunTime * 1000000L
        r.shufRead += m.shuffleReadMetrics.totalBytesRead
        r.shufWrite += m.shuffleWriteMetrics.bytesWritten
        r.tasks += 1
      }
    }
  }

  /** Sums QueryPlanningTracker phases + rule times across every SQL
    * execution in the window — the driver-side attribution the
    * inter-job gap number asks for.
    */
  private final class PhaseTally extends QueryExecutionListener {
    val phases = new ConcurrentHashMap[String, Long]()
    val rules = new ConcurrentHashMap[String, Long]()
    // per action name: (count, total ns, total plan nodes)
    val actions = new ConcurrentHashMap[String, (Int, Long, Long)]()
    @volatile var executions = 0
    private def addPhases(f: String, qe: QueryExecution, ns: Long): Unit = {
      executions += 1
      qe.tracker.phases.foreach { case (p, s) =>
        phases.merge(p, s.durationMs, (a, b) => a + b)
      }
      qe.tracker.rules.foreach { case (r, s) =>
        rules.merge(r, s.totalTimeNs, (a, b) => a + b)
      }
      val nodes =
        try qe.executedPlan.collect { case p => 1 }.sum.toLong
        catch { case _: Throwable => -1L }
      val key =
        if (f != "command") f
        else {
          // which command, on which table/path family (digits stripped
          // so per-batch table nonces group)
          val cls = qe.analyzed.getClass.getSimpleName
          val tgt = qe.analyzed.toString.linesIterator.take(1).mkString
            .replaceAll("[0-9]+", "N").take(110)
          s"command:$cls $tgt"
        }
      actions.merge(
        key, (1, ns, nodes),
        (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    }
    override def onSuccess(f: String, qe: QueryExecution, ns: Long): Unit =
      addPhases(f, qe, ns)
    override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit =
      addPhases(f, qe, 0L)
  }

  /** 20 ms self-sampler of the query-driving thread: buckets each
    * sample by scanning the stack for the usual driver-side suspects
    * (guide §7.3's thread-dump method, in-process so it works under
    * sbt fork). "waiting-on-jobs" = parked in awaitResult/run-job —
    * i.e. executors are working; everything else is pure driver time.
    */
  private final class MainSampler(target: Thread) extends Thread {
    setDaemon(true)
    val buckets = new ConcurrentHashMap[String, Integer]()
    @volatile var halted = false
    private def classify(st: Array[StackTraceElement]): String = {
      val s = st.map(e => e.getClassName + "." + e.getMethodName).mkString("\n")
      if (s.contains("janino") || s.contains("CodeGenerator") ||
        s.contains("doCompile")) "codegen-compile"
      else if (s.contains("awaitResult") || s.contains("runJob") ||
        s.contains("LinkedBlockingQueue.take")) "waiting-on-jobs"
      else if (s.contains("BroadcastExchange") || s.contains("executeCollect"))
        "broadcast/collect"
      else if (s.contains("FileFormatWriter") || s.contains("commit") ||
        s.contains("Committer")) "write-commit"
      else if (s.contains("InMemoryFileIndex") || s.contains("listLeafFiles") ||
        s.contains("DataSource.resolveRelation") || s.contains("ParquetUtils") ||
        s.contains("readFooter")) "file-listing/footers"
      else if (s.contains("RuleExecutor")) {
        // which batch owner: analyzer vs optimizer vs AQE reOptimize
        if (s.contains("AdaptiveSparkPlanExec")) "catalyst-rules/aqe-reopt"
        else if (s.contains("Analyzer")) "catalyst-rules/analysis"
        else "catalyst-rules/optimize"
      } else if (s.contains("QueryExecution") || s.contains("SparkPlanner") ||
        s.contains("QueryPlanner") || s.contains("AdaptiveSparkPlanExec")) {
        // sub-attribute by the deepest recognisable spark frame
        val tag = st.view.map(_.getClassName)
          .collectFirst {
            case c if c.contains("EnsureRequirements") => "ensure-reqs"
            case c if c.contains("createQueryStages") => "create-stages"
            case c if c.contains("CostEvaluator") => "cost-eval"
            case c if c.contains("prepareForExecution") => "prepare"
            case c if c.contains("Partitioning") => "partitioning"
            case c if c.contains("TreeNode") =>
              // the CALLER tells apart UI/listener plan rendering vs
              // explain vs checkpoint naming: first non-catalyst,
              // non-jvm frame below the TreeNode run
              val caller = st.view
                .map(e => e.getClassName + "#" + e.getMethodName)
                .filterNot(c => c.contains("catalyst") || c.contains("java.") ||
                  c.contains("scala.") || c.contains("TreeNode"))
                .take(3).mkString(" <- ")
              s"treenode[${st.view.filter(_.getClassName.contains("TreeNode"))
                .map(_.getMethodName).headOption.getOrElse("?")}] <- $caller"
            case c if c.contains("Expression") => "expression"
            case c if c.contains("codegen") => "codegen-weave"
          }.getOrElse(
            st.headOption.map(e => e.getClassName.split("\\.").takeRight(2)
              .mkString(".") + "." + e.getMethodName).getOrElse("?"))
        s"plan/aqe-driver[$tag]"
      }
      else if (s.contains("catalog") || s.contains("Catalog")) "catalog"
      else if (st.isEmpty) "no-stack"
      else "other:" + st.headOption.map(e =>
        e.getClassName.split("\\.").takeRight(2).mkString(".")).getOrElse("?")
    }
    override def run(): Unit =
      while (!halted) {
        val st = target.getStackTrace
        buckets.merge(classify(st), Integer.valueOf(1), (a, b) => a + b)
        Thread.sleep(20)
      }
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass query names")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val top = sys.env.getOrElse("SPARK_GRAFT_PROFILE_TOP", "40").toInt
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", ScratchWarehouse.dir)
    // experiment knob, same contract as Bench's: "k=v;k=v"
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
    for (name <- args) {
      val fn = SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query $name"))
      spark.catalog.clearCache()
      graft.operators.Dedup.unpersistAll()
      val timer = new JobTimer
      spark.sparkContext.addSparkListener(timer)
      val phaseTally = new PhaseTally
      spark.listenerManager.register(phaseTally)
      val sampler = new MainSampler(Thread.currentThread())
      sampler.start()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wallSec = (System.nanoTime() - t0) / 1e9
      sampler.halted = true
      org.apache.spark.graft.ListenerBridge.flush(spark.sparkContext, 10000L)
      spark.sparkContext.removeSparkListener(timer)
      spark.listenerManager.unregister(phaseTally)
      import scala.jdk.CollectionConverters._
      val recs = timer.jobs.values.asScala.toSeq
      val gapTotal = {
        // driver-side gaps between consecutive jobs: planning, catalog
        // ops, file listing — everything that is NOT task execution
        val sorted = recs.sortBy(_.t0)
        sorted.sliding(2).collect {
          case Seq(a, b) if b.t0 > a.t1 && a.t1 > 0 => (b.t0 - a.t1) / 1e3
        }.sum
      }
      println(s"========== $name  wall=${f"$wallSec%.2f"}s jobs=${recs.size} " +
        s"inter-job-gap=${f"$gapTotal%.2f"}s ==========")
      println(f"${"sec"}%8s ${"tasksec"}%8s ${"tasks"}%6s ${"shufR MB"}%9s ${"shufW MB"}%9s  site")
      recs.sortBy(r => -(r.t1 - r.t0)).take(top).foreach { r =>
        val sec = (r.t1 - r.t0) / 1e3
        println(f"${sec}%8.3f ${r.taskNanos / 1e9}%8.2f ${r.tasks}%6d " +
          f"${r.shufRead / 1e6}%9.2f ${r.shufWrite / 1e6}%9.2f  job#${r.jobId}%d ${r.site}")
      }
      // aggregate by call site: the repeated-verb view (3 batches x N
      // state verbs — which VERB is the bill)
      println("---- by call site ----")
      recs.groupBy(_.site).map { case (s, rs) =>
        (s, rs.map(r => (r.t1 - r.t0) / 1e3).sum, rs.size)
      }.toSeq.sortBy(-_._2).take(top).foreach { case (s, sec, n) =>
        println(f"${sec}%8.3f s  n=$n%-4d $s")
      }
      println(s"---- planning phases (summed over ${phaseTally.executions} executions) ----")
      phaseTally.phases.asScala.toSeq.sortBy(-_._2).foreach { case (p, ms) =>
        println(f"${ms / 1e3}%8.3f s  $p")
      }
      println("---- SQL executions by action (count, wall s, plan nodes) ----")
      phaseTally.actions.asScala.toSeq.sortBy(-_._2._2).foreach {
        case (f, (n, ns, nodes)) =>
          println(f"${ns / 1e9}%8.3f s  n=$n%-4d nodes=$nodes%-5d $f")
      }
      println("---- main-thread 20ms samples by bucket ----")
      sampler.buckets.asScala.toSeq.sortBy(-_._2.intValue).take(20)
        .foreach { case (b, n) =>
          println(f"${n.intValue * 0.02}%8.2f s  $b")
        }
      println("---- top Catalyst rules by total time ----")
      phaseTally.rules.asScala.toSeq.sortBy(-_._2).take(25).foreach { case (r, ns) =>
        println(f"${ns / 1e9}%8.3f s  $r")
      }
    }
    spark.stop()
  }
}
