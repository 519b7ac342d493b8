package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, Trigger}

/** STATE-STORE recovery across a PROCESS restart for the stateful
  * sessionizer (VERDICT r16 queue #5): `tools/StreamRecover` proves the
  * foreachBatch-sink half of crash recovery (offset WAL + idempotent epoch
  * commit); this tool proves the other half — the versioned state store
  * itself. `stream_session_state`'s flatMapGroupsWithState carries open
  * sessions across micro-batches in RocksDB state; a driver that dies
  * mid-run must, on restart in a BRAND-NEW JVM, reload the state version
  * belonging to the replayed batch (not the crashed run's partial
  * version), re-emit identical rows, and finish the remaining batches as
  * if the crash never happened.
  *
  *  - `crash` mode stages THREE time-split event drops (sessions straddle
  *    both batch boundaries, so real open-session state crosses the crash
  *    point), runs the sessionizer with `maxFilesPerTrigger=1`, and dies
  *    inside epoch 1's commit window — after the batch's emitted sessions
  *    are written (and after the stateful operator's tasks have committed
  *    state version 2), before the manifest marker. It verifies the
  *    wreckage (marker 0 present, marker 1 absent, orphaned batch-1 rows
  *    present) and POISONS the orphan (negated sum_value) so a resume
  *    that trusts orphaned output instead of re-running the epoch against
  *    the RIGHT state version is observable.
  *  - `resume` mode is a fresh JVM sharing only checkpoint + sink dirs:
  *    Spark replays epoch 1 from the offset WAL, the state stores load
  *    version 1 (batch 1's input version — RocksDB changelog replay, not
  *    the crashed process's v2), the re-emitted sessions overwrite the
  *    poison, and batches 2..n complete. The final session table must
  *    equal an UNINTERRUPTED single-JVM run of the same drops —
  *    StateRecoverSpec computes that twin via StreamOps.runSessionState
  *    and compares row-for-row.
  *
  * At 100 TB this is the stateful-streaming recovery contract: executors
  * and drivers die with million-user session maps in flight, and the
  * versioned store (changelog/SST upload per commit) is what makes the
  * restarted job's output bit-identical to a never-crashed run's. */
object StateRecover {

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("crash", sfDir, baseDir) => crash(sfDir, baseDir)
    case Seq("resume", sfDir, baseDir, outFile) => resume(sfDir, baseDir, outFile)
    case other =>
      System.err.println(
        s"usage: StateRecover crash <sfDir> <baseDir> | resume <sfDir> <baseDir> <outFile>; got $other")
      sys.exit(2)
  }

  private val Splits = Seq("2024-01-11", "2024-01-21")

  /** The three event-time-ordered drops both the tool and the spec's
    * uninterrupted twin consume — same projection as the registered op. */
  private[graft] def drops(spark: SparkSession, sfDir: String): Seq[DataFrame] = {
    val ev = graft.tables.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
    val cuts = Splits.map(s => unix_micros(to_timestamp(lit(s))))
    Seq(
      ev.filter(col("ts_us") < cuts(0)),
      ev.filter(col("ts_us") >= cuts(0) && col("ts_us") < cuts(1)),
      ev.filter(col("ts_us") >= cuts(1)))
  }

  /** One stream definition for both processes: the registered op's exact
    * stateful pipeline (watermark + flatMapGroupsWithState session closer,
    * RocksDB stores via StreamOps.streamSession) over the staged drops,
    * sunk through the manifest-guarded epoch commit so batch output
    * survives the JVM and replays idempotently. */
  private def runStream(spark: SparkSession, sfDir: String, baseDir: String,
      afterWrite: Long => Unit): Unit = {
    val manifest = java.nio.file.Paths.get(s"$baseDir/manifest")
    java.nio.file.Files.createDirectories(manifest)
    val ss = graft.streaming.StreamOps.streamSession(spark, 4)
    import ss.implicits._
    val schema = drops(ss, sfDir).head.schema
    val q = ss.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$baseDir/src")
      .withWatermark("ts", graft.streaming.StreamOps.sessionWmDelay)
      .as[graft.streaming.StreamOps.SEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(
        graft.streaming.StreamOps.closeSessions)
      .toDF()
      .writeStream
      .queryName("state_recover")
      .foreachBatch { (b: DataFrame, id: Long) =>
        graft.streaming.StreamOps.commitEpoch(
          b, id, s"$baseDir/out", manifest, afterWrite)
      }
      .outputMode("append")
      .option("checkpointLocation", s"$baseDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def crash(sfDir: String, baseDir: String): Unit = {
    val spark = session(baseDir)
    try {
      // stageDrops writes mtime-ordered one-file drops under <base>/src —
      // the same fixture stager the registered op uses
      graft.streaming.StreamOps.stageDrops(drops(spark, sfDir), baseDir)
      val died =
        try {
          runStream(spark, sfDir, baseDir, afterWrite = id =>
            if (id == 1) throw new RuntimeException(
              "injected crash: epoch-1 sessions written, marker not yet created"))
          false
        } catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            require(
              Option(e.getCause).exists(_.getMessage.contains("injected crash")) ||
                e.getMessage.contains("injected crash"),
              s"stream died of the WRONG cause: $e")
            true
        }
      require(died, "crash mode: the injected failure did not propagate")
      val m0 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-0"))
      val m1 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-1"))
      val orphan = new java.io.File(s"$baseDir/out/batch_id=1")
      require(m0, "epoch 0 marker missing — batch 0 never committed")
      require(!m1, "epoch 1 marker EXISTS — crash seam did not fire before it")
      require(orphan.isDirectory && graft.util.Scratch.dataFiles(orphan.getPath).nonEmpty,
        "orphaned epoch-1 session data missing — crash seam fired before the write")
      // the state-store evidence: versions committed by the crashed run
      // must be on disk for the fresh JVM to load (RocksDB changelog /
      // snapshot files under the checkpoint's state tree)
      val stateDir = new java.io.File(s"$baseDir/ckpt/state")
      def anyFile(f: java.io.File): Boolean =
        if (f.isFile) true
        else Option(f.listFiles()).getOrElse(Array.empty).exists(anyFile)
      require(stateDir.isDirectory && anyFile(stateDir),
        "no state-store files in the checkpoint — nothing for resume to recover")
      // poison the orphan so "trust the orphaned output" is observable
      val poisoned = spark.read.parquet(orphan.getPath)
        .withColumn("sum_value", -col("sum_value"))
      // read fully into driver memory before the overwrite (tiny frame)
      val rows = poisoned.collect()
      val schema = poisoned.schema
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .write.mode("overwrite").parquet(orphan.getPath)
      println("[state-recover] crashed mid-epoch-1: marker0=present " +
        "marker1=absent orphan=present(poisoned) state-files=present")
    } finally spark.stop()
  }

  private def resume(sfDir: String, baseDir: String, outFile: String): Unit = {
    val spark = session(baseDir)
    try {
      // no staging, no injection — this JVM knows only checkpoint + dirs
      runStream(spark, sfDir, baseDir, afterWrite = _ => ())
      val m1 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-1"))
      require(m1, "resume did not commit epoch 1 — WAL replay failed")
      val rows = spark.read.parquet(s"$baseDir/out")
        .select(col("user_id"), col("start_us"), col("end_us"),
          col("n_events"), col("sum_value"))
        .orderBy("user_id", "start_us")
        .collect()
        .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}," +
          s"${r.getLong(3)},${r.getDouble(4)}")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        rows.mkString("\n").getBytes("UTF-8"))
      println(s"[state-recover] resumed from checkpoint: ${rows.length} sessions")
    } finally spark.stop()
  }

  private def session(baseDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("state-recover")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
}
