package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Round-22 sink-family stage decomposition (VERDICT r21 #3): for every
  * sink_* operator, split the timed row into
  *   - job wall (Σ per-job submit→end spans — executor-visible work),
  *   - task time (Σ task durations — the parallel work inside those jobs),
  *   - driver gap (op wall − job wall: planning, FileFormatWriter's
  *     driver-side commitJob renames, manifest/fs ops, collect-backs),
  * plus the written byte/file footprint — so "the write IS the op" /
  * "format-inherent" become measured claims (commit-coordinator overhead
  * vs bytes), not judgments. Not part of the driver contract. */
object R22SinkProbe {
  private class Acc extends SparkListener {
    val jobWallMs = new java.util.concurrent.atomic.AtomicLong(0)
    val taskMs = new java.util.concurrent.atomic.AtomicLong(0)
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    private val starts = scala.collection.concurrent.TrieMap.empty[Int, Long]
    override def onJobStart(js: SparkListenerJobStart): Unit =
      starts.put(js.jobId, System.nanoTime())
    override def onJobEnd(je: SparkListenerJobEnd): Unit =
      starts.remove(je.jobId).foreach { t0 =>
        jobWallMs.addAndGet((System.nanoTime() - t0) / 1000000)
        jobs.incrementAndGet()
      }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
      if (te.taskInfo != null) {
        taskMs.addAndGet(te.taskInfo.duration)
        tasks.incrementAndGet()
      }
    }
    def reset(): Unit = { jobWallMs.set(0); taskMs.set(0); jobs.set(0); tasks.set(0) }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_SINK_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Scratch.resetKeep("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try graft.util.Scratch.wipeExcept(Set("spark_local")) catch { case _: Throwable => () }
    graft.etl.Ingest.derbyUrl(spark, sfDir) // sink_jdbc_load warmup (untimed seed)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)

    def scratchFootprint(): (Long, Int) = {
      var bytes = 0L; var files = 0
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(walk)
        else if (f.isFile && !f.getName.startsWith("_") && !f.getName.startsWith(".")) {
          bytes += f.length(); files += 1
        }
      walk(new java.io.File(graft.util.Scratch.rootDir))
      (bytes, files)
    }

    val sinks = graft.SparkEntry.queries.keys.filter(_.startsWith("sink_")).toSeq.sorted
    println("[sink] op, median wall s, job wall s, task s, driver gap s, jobs, tasks, MB written, files")
    sinks.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // one warm run untimed (JIT, committer classloading, derby boot)
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        System.err.println(s"[sink] $name warm FAILED: ${e.getMessage}")
      }
      val samples = (1 to reps).map { _ =>
        // wipe the op's own previous output OUTSIDE the timed region, like
        // Bench's warmed-scratch staging (keep live dirs + derby + staged
        // fixtures other ops own)
        try graft.util.Scratch.wipeWhere(n =>
          n.startsWith(name) || n == name)
        catch { case _: Throwable => () }
        val (b0, f0) = scratchFootprint()
        acc.reset()
        spark.sparkContext.setJobDescription(s"sink_probe:$name")
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.sparkContext.setJobDescription(null)
        // drain the listener bus so job/task sums are complete
        Thread.sleep(300)
        val (b1, f1) = scratchFootprint()
        (wall, acc.jobWallMs.get() / 1e3, acc.taskMs.get() / 1e3,
          acc.jobs.get(), acc.tasks.get(),
          (b1 - b0) / 1e6, f1 - f0)
      }
      val med = samples.sortBy(_._1).apply(samples.size / 2)
      val (wall, jw, tt, nj, nt, mb, nf) = med
      println(f"[sink] $name%-40s wall=$wall%6.3f jobWall=$jw%6.3f task=$tt%7.3f gap=${wall - jw}%6.3f jobs=$nj%3d tasks=$nt%5d mb=$mb%8.2f files=$nf%4d")
    }
    spark.stop()
  }
}
