package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-22 micro-decomposition of the Tables.apply per-call cost (guide
  * §1 — measure first): times N repetitions of (a) the full Tables.apply
  * path, (b) the bare read.schema().parquet() relation build, (c) a plan
  * action (schema touch) on the result — so the ADVICE r21 cache redesign
  * rides a measured split, not a guess. Not part of the driver contract. */
object R22Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Scratch.resetKeep("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_MICRO_REPS", "50").toInt
    def bench(tag: String)(f: => Unit): Unit = {
      f // warm once
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[micro] $tag%-45s ${ms}%8.3f ms/call (n=$n)")
    }
    for (tbl <- Seq("orders", "events", "lineitem")) {
      val schema = graft.tables.Tables(spark, sfDir, tbl).schema
      bench(s"Tables.apply($tbl)") {
        graft.tables.Tables(spark, sfDir, tbl)
      }
      bench(s"read.schema.parquet($tbl)") {
        spark.read.schema(schema).parquet(s"$sfDir/$tbl.parquet")
      }
      bench(s"read.schema.parquet($tbl).select(first)") {
        spark.read.schema(schema).parquet(s"$sfDir/$tbl.parquet")
          .select(schema.fieldNames.head)
      }
      bench(s"inferred read.parquet($tbl)") {
        spark.read.parquet(s"$sfDir/$tbl.parquet")
      }
    }
    // a representative cheap op end to end, for the fixed-cost floor item
    val fn = graft.SparkEntry.queries("fn_year_month")
    bench("fn_year_month plan construction") { fn(spark, sfDir) }
    val df = fn(spark, sfDir)
    bench("fn_year_month executedPlan (analyze+optimize)") {
      fn(spark, sfDir).queryExecution.executedPlan
    }
    // Fixed-cost floor decomposition (VERDICT r21 #6): for representative
    // cheap long-tail ops, split one timed row (the bench's fn().count())
    // into plan build, analyze+optimize, and action wall vs job wall vs
    // Σtask time — so "the floor is Spark-inherent" is a measured claim
    // naming its parts (driver analysis/codegen/scheduling vs executor
    // work) rather than a guess.
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val nJobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val nTasks = new java.util.concurrent.atomic.AtomicInteger(0)
    val jobStarts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobStarts.put(js.jobId, System.nanoTime())
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        jobStarts.remove(je.jobId).foreach { t0 =>
          jobWallMs.addAndGet((System.nanoTime() - t0) / 1000000); nJobs.incrementAndGet()
        }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskInfo != null) { taskMs.addAndGet(te.taskInfo.duration); nTasks.incrementAndGet() }
    })
    for (op <- Seq("fn_year_month", "agg_sum_revenue", "filter_event_type",
        "window_ratio_share", "llm_token_count")) {
      val f = graft.SparkEntry.queries(op)
      f(spark, sfDir).count() // warm (JIT + codegen cache for this plan)
      val reps = 5
      var planMs = 0.0; var optMs = 0.0; var actMs = 0.0
      var jw = 0L; var tk = 0L; var nj = 0; var nt = 0
      (1 to reps).foreach { _ =>
        val t0 = System.nanoTime()
        val d = f(spark, sfDir)
        val t1 = System.nanoTime()
        d.queryExecution.executedPlan
        val t2 = System.nanoTime()
        jobWallMs.set(0); taskMs.set(0); nJobs.set(0); nTasks.set(0)
        d.count()
        val t3 = System.nanoTime()
        Thread.sleep(150) // drain listener bus
        planMs += (t1 - t0) / 1e6; optMs += (t2 - t1) / 1e6; actMs += (t3 - t2) / 1e6
        jw += jobWallMs.get(); tk += taskMs.get(); nj += nJobs.get(); nt += nTasks.get()
      }
      println(f"[floor] $op%-22s plan=${planMs / reps}%6.1f opt=${optMs / reps}%6.1f " +
        f"action=${actMs / reps}%7.1f jobWall=${jw / reps}%5d task=${tk / reps}%5d " +
        f"driverGap=${actMs / reps - jw / reps}%7.1f ms jobs=${nj / reps} tasks=${nt / reps}")
    }
    // attribution diagnostics for the measured ~70-105 ms per-action driver
    // gap: (a) a trivial 1-job query's floor in the same session, (b) the
    // same ops on an AQE-off child session (DIAGNOSTIC ONLY — AQE stays on
    // in the shipped sessions; this tells us whether the gap is AQE stage
    // coordination or something else)
    def actionOnly(tag: String, mk: () => org.apache.spark.sql.DataFrame): Unit = {
      mk().count()
      val reps = 5
      var actMs = 0.0; var jw = 0L
      (1 to reps).foreach { _ =>
        val d = mk()
        d.queryExecution.executedPlan
        jobWallMs.set(0)
        val t0 = System.nanoTime()
        d.count()
        actMs += (System.nanoTime() - t0) / 1e6
        Thread.sleep(150)
        jw += jobWallMs.get()
      }
      println(f"[floor] $tag%-32s action=${actMs / reps}%7.1f jobWall=${jw / reps}%5d gap=${actMs / reps - jw / reps}%7.1f ms")
    }
    actionOnly("range(1000) trivial", () => spark.range(1000).toDF("id"))
    val noAqe = spark.newSession()
    noAqe.conf.set("spark.sql.adaptive.enabled", "false")
    noAqe.conf.set("spark.sql.shuffle.partitions", cpus)
    for (op <- Seq("fn_year_month", "agg_sum_revenue", "window_ratio_share"))
      actionOnly(s"$op (AQE off, diag)", () => graft.SparkEntry.queries(op)(noAqe, sfDir))
    spark.stop()
  }
}
