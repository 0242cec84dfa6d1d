package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerTaskEnd, SparkListenerEvent}
import org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart

// temporary profiling harness (not part of the driver contract)
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-prof")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("GRAFT_PROF_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // per-query job/task counters — lifecycle queries (s_mv_*) are
    // dominated by the NUMBER of Spark jobs (commit passes), not bytes
    val jobs = new java.util.concurrent.atomic.AtomicLong
    val tasks = new java.util.concurrent.atomic.AtomicLong
    val jobMs = new java.util.concurrent.atomic.AtomicLong
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    // per-callsite job count + total ms — pinpoints which engine call
    // mints the jobs a lifecycle query pays for
    val bySite = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        // first graft.* frame in the stage's call-stack details — the
        // engine call that minted this job
        val site = js.stageInfos.flatMap(_.details.split('\n'))
          .find(l => l.contains("graft.") && !l.contains("graftshim"))
          .orElse(Option(js.properties.getProperty("spark.jobGroup.id")).map("grp:" + _))
          .map(_.trim.take(90)).getOrElse("broadcast/async")
        jobStart.put(js.jobId, (js.time, site))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val s = jobStart.remove(je.jobId)
        if (s != null) {
          jobMs.addAndGet(je.time - s._1)
          bySite.merge(s._2, (1L, je.time - s._1),
            (a, b) => (a._1 + b._1, a._2 + b._2))
          if (sys.env.contains("GRAFT_PROF_JOBS"))
            println(f"[prof]   job ${je.jobId}%4d ${je.time - s._1}%6d ms")
        }
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        if (sys.env.contains("GRAFT_PROF_JOBS")) {
          val si = sc.stageInfo
          val ms = for {a <- si.completionTime; b <- si.submissionTime} yield a - b
          if (ms.exists(_ > 200))
            println(f"[prof]   stage ${si.stageId}%4d ${ms.get}%6d ms " +
              f"${si.numTasks}%3d tasks  " +
              si.rddInfos.map(_.name).distinct.mkString("|").take(120))
        }
      }
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = { tasks.incrementAndGet(); () }
    })
    // SQL-execution descriptions: map executionId -> a short label from
    // the physical plan description, then attribute jobs to executions
    val execDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val byExec = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onOtherEvent(event: SparkListenerEvent): Unit = event match {
        case e: SparkListenerSQLExecutionStart =>
          val label = e.physicalPlanDescription.split('\n')
            .map(_.trim).filter(_.nonEmpty)
            .find(l => !l.startsWith("==")).getOrElse("?").take(70)
          execDesc.put(e.executionId, s"[${e.executionId}] $label")
          if (sys.env.contains("GRAFT_PROF_PLANS")) {
            val dir = java.nio.file.Paths.get("/tmp/prof_plans")
            java.nio.file.Files.createDirectories(dir)
            java.nio.file.Files.write(dir.resolve(s"exec_${e.executionId}.txt"),
              e.physicalPlanDescription.getBytes("UTF-8"))
          }
        case _ =>
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = ()
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val eid = Option(js.properties.getProperty("spark.sql.execution.id"))
        val root = Option(js.properties.getProperty("spark.sql.execution.root.id"))
        val label = root.orElse(eid).flatMap(id =>
          Option(execDesc.get(id.toLong))).getOrElse("no-sql")
        byExec.merge(label, (1L, 0L), (a, b) => (a._1 + b._1, a._2 + b._2))
      }
    })

    // driver main-thread sampler: every 20 ms, record the deepest
    // engine/spark frame — where the non-job wall time goes
    val mainThread = Thread.currentThread()
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Long]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val st = mainThread.getStackTrace
          val interesting = st.find { e =>
            val c = e.getClassName
            c.startsWith("graft.") || c.contains("graftshim")
          }.orElse(st.find { e =>
            val c = e.getClassName
            c.startsWith("org.apache.spark.sql.catalyst") ||
            c.startsWith("org.apache.spark.sql.execution") ||
            c.startsWith("org.apache.parquet") ||
            c.startsWith("org.apache.hadoop")
          }).orElse(st.headOption)
          interesting.foreach { e =>
            samples.merge(s"${e.getClassName.replaceAll("^org.apache.spark.sql.", "oass.")}.${e.getMethodName}", 1L, Long.box(_) + Long.box(_))
          }
          // executor task threads: the deepest graft/catalyst frame of
          // each running task — what the hot single-task stages compute
          if (sys.env.contains("GRAFT_PROF_TASKS")) {
            import scala.jdk.CollectionConverters._
            Thread.getAllStackTraces.asScala.foreach { case (t, frames) =>
              if (t.getName.startsWith("Executor task launch")) {
                frames.find { e =>
                  val c = e.getClassName
                  c.startsWith("graft.") || c.contains("graftshim") ||
                  c.startsWith("org.apache.spark.sql.catalyst.expressions")
                }.orElse(frames.drop(3).headOption).foreach { e =>
                  samples.merge(s"TASK ${e.getClassName}.${e.getMethodName}",
                    1L, Long.box(_) + Long.box(_))
                }
              }
            }
          }
        }
        Thread.sleep(20)
      }
    })
    sampler.setDaemon(true)
    sampler.start()

    try SparkEntry.entry(spark).count() catch { case _: Throwable => }
    for (n <- names; i <- 1 to 2) {
      spark.catalog.clearCache()
      jobs.set(0); tasks.set(0); jobMs.set(0); bySite.clear(); byExec.clear()
      samples.clear(); sampling = true
      val t0 = System.nanoTime()
      n match {
        case "x_grams" =>
          import org.apache.spark.sql.functions._
          graft.Tables.read(spark, sfDir, "documents")
            .select(col("source"), col("doc_id"),
              graft.functions.TextFunctions.wordShingleHashes(col("text"), 2).as("g"))
            .select(sum(size(col("g")))).collect()
        case "x_ngram_salt1" =>
          graft.operators.Dedup.ngramJaccardPairs(
            graft.Tables.read(spark, sfDir, "documents"),
            "text", "doc_id", "source", n = 2, threshold = 0.55, salts = 1).count()
        case "x_hyb_lex" =>
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.graftshim.TopKByScore
          graft.operators.Semantics.bm25Multi(
            graft.Tables.read(spark, sfDir, "documents"), "text", "doc_id",
            graft.operators.Semantics.QuerySet)
            .groupBy(col("q_id"))
            .agg(TopKByScore(col("bm25"), col("doc_id"), 50).as("__tk"))
            .count()
        case "x_hyb_lex_rank" =>
          import org.apache.spark.sql.functions._
          import org.apache.spark.sql.graftshim.TopKByScore
          graft.operators.Semantics.bm25Multi(
            graft.Tables.read(spark, sfDir, "documents"), "text", "doc_id",
            graft.operators.Semantics.QuerySet)
            .groupBy(col("q_id"))
            .agg(TopKByScore(col("bm25"), col("doc_id"), 50).as("__tk"))
            .select(col("q_id").cast("long").as("q_id"),
              posexplode(col("__tk")).as(Seq("__i", "__x")))
            .select(col("q_id"), col("__x.vec_id").as("id"),
              (col("__i") + 1).cast("int").as("rank_lex"))
            .count()
        case "x_hyb_vec" =>
          import org.apache.spark.sql.functions._
          val emb = graft.Tables.read(spark, sfDir, "embeddings")
          val qIds = graft.operators.Semantics.QuerySet.map(q => Long.box(q._1.toLong))
          graft.operators.Similarity.bruteForceTopK(
            emb, emb.filter(col("vec_id").isin(qIds: _*)), "embedding", "vec_id", 50)
            .count()
        case _ =>
          SparkEntry.queries(n)(spark, sfDir).count()
      }
      sampling = false
      // tiny settle so async job-end events land before we read counters
      Thread.sleep(200)
      println(f"[prof] $n run$i ${(System.nanoTime() - t0) / 1e9}%.2fs " +
        s"jobs=${jobs.get} tasks=${tasks.get} jobMs=${jobMs.get}")
      if (i == 2 && sys.env.contains("GRAFT_PROF_SITES")) {
        import scala.jdk.CollectionConverters._
        bySite.asScala.toSeq.sortBy(-_._2._2).take(25).foreach {
          case (site, (n, ms)) => println(f"[prof]   $n%4d jobs $ms%6d ms  $site")
        }
        samples.asScala.toSeq.sortBy(-_._2).take(20).foreach {
          case (frame, n) => println(f"[prof]   main ${n * 20}%6d ms  $frame")
        }
        byExec.asScala.toSeq.sortBy(-_._2._1).take(25).foreach {
          case (label, (n, _)) => println(f"[prof]   exec $n%4d jobs  $label")
        }
      }
    }
    spark.stop()
  }
}
