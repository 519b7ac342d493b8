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
  * restarted job's output bit-identical to a never-crashed run's.
  *
  * The `crash-native`/`resume-native` mode pair (round 17 follow-on) runs
  * the ENGINE's `session_window` merge aggregate — the zero-user-code
  * complement of the custom-state path, with its own state layout (the
  * merging-session store) — through the identical crash/resume protocol;
  * its twin is StreamOps.runSessionWindow over the same drops. */
object StateRecover {

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("crash", sfDir, baseDir) => crash(sfDir, baseDir, "custom")
    case Seq("resume", sfDir, baseDir, outFile) =>
      resume(sfDir, baseDir, outFile, "custom")
    // `-native` variants run the ENGINE's session_window aggregate (its
    // merging-session state store) through the same crash/resume protocol
    // — zero user state code, the complement of the custom-state path
    case Seq("crash-native", sfDir, baseDir) => crash(sfDir, baseDir, "native")
    case Seq("resume-native", sfDir, baseDir, outFile) =>
      resume(sfDir, baseDir, outFile, "native")
    // `-join` variants run the stream-stream interval join (the
    // symmetric-join store — the last stateful layout without a
    // cross-process proof): matched pairs accumulate across batches,
    // the buffered-but-unmatched rows ARE the state that must survive
    case Seq("crash-join", sfDir, baseDir) => crash(sfDir, baseDir, "join")
    case Seq("resume-join", sfDir, baseDir, outFile) =>
      resume(sfDir, baseDir, outFile, "join")
    case other =>
      System.err.println(
        s"usage: StateRecover crash[-native|-join] <sfDir> <baseDir> | " +
          s"resume[-native|-join] <sfDir> <baseDir> <outFile>; got $other")
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

  /** Drops for the join mode: event_type rides along so each micro-batch
    * carries BOTH sides of the interval join (views and purchases from
    * the same time slice — matches straddle batch boundaries through the
    * buffered join state, which is the thing under test). */
  private[graft] def joinDrops(spark: SparkSession, sfDir: String): Seq[DataFrame] = {
    val ev = graft.tables.Tables(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
    val cuts = Splits.map(s => to_timestamp(lit(s)))
    Seq(
      ev.filter(col("ts") < cuts(0)),
      ev.filter(col("ts") >= cuts(0) && col("ts") < cuts(1)),
      ev.filter(col("ts") >= cuts(1)))
  }

  /** One stream definition for both processes: the registered op's exact
    * stateful pipeline (watermark + flatMapGroupsWithState session closer
    * — or, `native = true`, the engine's session_window merge aggregate —
    * RocksDB stores via StreamOps.streamSession) over the staged drops,
    * sunk through the manifest-guarded epoch commit so batch output
    * survives the JVM and replays idempotently. The native path flattens
    * the window struct to the SAME column shape the custom path emits
    * ((user_id, start_us, end_us, n_events, sum_value)), so resume/
    * verification code is shared. */
  private def runStream(spark: SparkSession, sfDir: String, baseDir: String,
      mode: String, afterWrite: Long => Unit): Unit = {
    val manifest = java.nio.file.Paths.get(s"$baseDir/manifest")
    java.nio.file.Files.createDirectories(manifest)
    val ss = graft.streaming.StreamOps.streamSession(spark, 4)
    import ss.implicits._
    def watermarked = ss.readStream
      .schema(drops(ss, sfDir).head.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$baseDir/src")
      .withWatermark("ts", graft.streaming.StreamOps.sessionWmDelay)
    val out: DataFrame = mode match {
      case "native" =>
        watermarked
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,4)")).as("sum_dec"))
          .select(col("user_id"),
            unix_micros(col("session_window.start")).as("start_us"),
            unix_micros(col("session_window.end")).as("end_us"),
            col("n_events"),
            round(col("sum_dec").cast("double"), 2).as("sum_value"))
      case "custom" =>
        watermarked.as[graft.streaming.StreamOps.SEv]
          .groupByKey(_.user_id)
          .flatMapGroupsWithState(OutputMode.Append,
            GroupStateTimeout.EventTimeTimeout)(
            graft.streaming.StreamOps.closeSessions)
          .toDF()
      case "join" =>
        // the registered stream_stream_join's exact shape over the staged
        // drops: both sides read the SAME source files, so each
        // micro-batch advances both sides one drop and cross-batch
        // matches ride the buffered join state
        def side(tpe: String, uid: String, eid: String, ts: String) =
          ss.readStream.schema(joinDrops(ss, sfDir).head.schema)
            .option("maxFilesPerTrigger", "1").parquet(s"$baseDir/src")
            .filter(col("event_type") === tpe)
            .select(col("user_id").as(uid), col("event_id").as(eid),
              col("ts").as(ts))
            .withWatermark(ts, "1 hour")
        side("view", "v_user", "view_id", "view_ts")
          .join(side("purchase", "p_user", "purchase_id", "purchase_ts"),
            expr("v_user = p_user AND purchase_ts >= view_ts " +
              "AND purchase_ts <= view_ts + interval 1 hour"))
          .select(col("v_user").as("user_id"), col("view_id"),
            col("purchase_id"))
      case other => sys.error(s"unknown mode $other")
    }
    val q = out
      .writeStream
      .queryName(s"state_recover_$mode")
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

  private def crash(sfDir: String, baseDir: String, mode: String): Unit = {
    val spark = session(baseDir)
    try {
      // stageDrops writes mtime-ordered one-file drops under <base>/src —
      // the same fixture stager the registered op uses
      graft.streaming.StreamOps.stageDrops(
        if (mode == "join") joinDrops(spark, sfDir) else drops(spark, sfDir),
        baseDir)
      val died =
        try {
          runStream(spark, sfDir, baseDir, mode, afterWrite = id =>
            if (id == 1) throw new RuntimeException(
              "injected crash: epoch-1 rows written, marker not yet created"))
          false
        } catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            require(
              // null-guard BOTH messages (ADVICE r17): a wrapped runtime
              // error with a null message must surface the real "wrong
              // cause" diagnostic, not an NPE inside the check itself
              Option(e.getCause).flatMap(c => Option(c.getMessage))
                .exists(_.contains("injected crash")) ||
                Option(e.getMessage).exists(_.contains("injected crash")),
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
      // poison the orphan so "trust the orphaned output" is observable:
      // negate a value column (sessions) / an id column (join pairs)
      val poisonCol = if (mode == "join") "purchase_id" else "sum_value"
      val poisoned = spark.read.parquet(orphan.getPath)
        .withColumn(poisonCol, -col(poisonCol))
      // read fully into driver memory before the overwrite (tiny frame)
      val rows = poisoned.collect()
      val schema = poisoned.schema
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
        .write.mode("overwrite").parquet(orphan.getPath)
      println(s"[state-recover] crashed mid-epoch-1 (mode=$mode): " +
        "marker0=present marker1=absent orphan=present(poisoned) state-files=present")
    } finally spark.stop()
  }

  private def resume(sfDir: String, baseDir: String, outFile: String,
      mode: String): Unit = {
    val spark = session(baseDir)
    try {
      // no staging, no injection — this JVM knows only checkpoint + dirs
      runStream(spark, sfDir, baseDir, mode, afterWrite = _ => ())
      val m1 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-1"))
      require(m1, "resume did not commit epoch 1 — WAL replay failed")
      val rows =
        if (mode == "join")
          spark.read.parquet(s"$baseDir/out")
            .select(col("user_id"), col("view_id"), col("purchase_id"))
            .orderBy("user_id", "view_id", "purchase_id")
            .collect()
            .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}")
        else
          spark.read.parquet(s"$baseDir/out")
            .select(col("user_id"), col("start_us"), col("end_us"),
              col("n_events"), col("sum_value"))
            .orderBy("user_id", "start_us")
            .collect()
            .map(r => s"${r.getLong(0)},${r.getLong(1)},${r.getLong(2)}," +
              s"${r.getLong(3)},${r.getDouble(4)}")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        rows.mkString("\n").getBytes("UTF-8"))
      println(s"[state-recover] resumed from checkpoint: ${rows.length} rows")
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
