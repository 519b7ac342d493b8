package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming checkpoint recovery across a PROCESS restart (VERDICT r15
  * queue #1) — the Lambda-retry reality of the reference (README.md:74-76:
  * a failed trigger re-fires and the pipeline must not double-apply):
  * `stream_exactly_once_sink` (streaming/StreamOps.scala) proves the
  * manifest-guarded epoch commit within one JVM; this tool proves the cross-
  * process half, mirroring the CatalogPersist forked-JVM pattern:
  *
  *  - `crash` mode stages the two file drops, starts the stream, commits
  *    epoch 0 normally, then dies INSIDE epoch 1's commit window — after
  *    the data write, before the manifest marker (the one ordering-critical
  *    gap in the protocol, same seam StreamingSpec drives in-JVM via
  *    [[graft.streaming.StreamOps.commitEpoch]]'s afterWrite hook). It then
  *    verifies the on-disk wreckage is exactly what the protocol promises:
  *    marker 0 present, marker 1 absent, orphaned batch-1 data present —
  *    and POISONS the orphan (negated prices) so a resume that trusts
  *    orphaned data instead of re-delivering is observable, not silently
  *    byte-idempotent.
  *  - `resume` mode is a BRAND-NEW JVM sharing only the checkpoint + sink
  *    dirs: Spark's offset WAL replays epoch 1 (offsets written, commit
  *    log not), the manifest guard finds no marker, the re-delivered batch
  *    OVERWRITES the poisoned orphan, and the marker lands. The sink must
  *    end exactly-once vs the batch oracle — StreamRecoverSpec compares
  *    the per-status aggregate against the same feed computed directly.
  *
  * At 100 TB this is the recovery contract that matters: executors and
  * drivers die mid-epoch, and the checkpoint (offset WAL) plus the
  * idempotent epoch-directory commit are what make a restarted job land
  * the same bytes a never-crashed run would. */
object StreamRecover {

  private val Sel = Seq("o_orderkey", "o_totalprice", "o_orderstatus")

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("crash", sfDir, baseDir) => crash(sfDir, baseDir)
    case Seq("resume", sfDir, baseDir, outFile) => resume(sfDir, baseDir, outFile)
    case other =>
      System.err.println(
        s"usage: StreamRecover crash <sfDir> <baseDir> | resume <sfDir> <baseDir> <outFile>; got $other")
      sys.exit(2)
  }

  private def feed(spark: SparkSession, sfDir: String): DataFrame =
    graft.tables.Tables(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01"))
      .select(Sel.map(col): _*)

  /** Stage the feed as two one-file drops with ordered mtimes so
    * maxFilesPerTrigger=1 yields exactly [even-keys, odd-keys] batches.
    * repartition(1) is ingest simulation (one part-file per drop), same
    * fixture-only pattern as StreamOps' stagers. */
  private def stage(spark: SparkSession, sfDir: String, incoming: String): Set[String] = {
    val f = feed(spark, sfDir)
    val now = System.currentTimeMillis()
    f.filter(pmod(col("o_orderkey"), lit(2)) === 0)
      .repartition(1).write.mode("overwrite").parquet(incoming)
    val first = stamp(incoming, now - 120000, Set.empty)
    f.filter(pmod(col("o_orderkey"), lit(2)) === 1)
      .repartition(1).write.mode("append").parquet(incoming)
    stamp(incoming, now - 60000, skip = first)
  }

  private def stamp(dir: String, epochMs: Long, skip: Set[String]): Set[String] = {
    val files = graft.util.Scratch.dataFiles(dir).filterNot(f => skip(f.getName))
    files.foreach(f => java.nio.file.Files.setLastModifiedTime(f.toPath,
      java.nio.file.attribute.FileTime.fromMillis(epochMs)))
    files.map(_.getName).toSet
  }

  /** The one stream definition both processes run — identical source,
    * schema, options, and checkpoint; only the crash seam differs (the
    * foreachBatch body is code, not checkpoint state). */
  private def runStream(spark: SparkSession, sfDir: String, baseDir: String,
      afterWrite: Long => Unit): Unit = {
    val manifest = java.nio.file.Paths.get(s"$baseDir/manifest")
    java.nio.file.Files.createDirectories(manifest)
    val q = spark.readStream.schema(feed(spark, sfDir).schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$baseDir/incoming")
      .writeStream
      .queryName("stream_recover")
      .foreachBatch { (b: DataFrame, id: Long) =>
        graft.streaming.StreamOps.commitEpoch(
          b, id, s"$baseDir/out", manifest, afterWrite)
      }
      .option("checkpointLocation", s"$baseDir/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  private def crash(sfDir: String, baseDir: String): Unit = {
    val spark = session(baseDir)
    try {
      val drops = stage(spark, sfDir, s"$baseDir/incoming")
      val died =
        try {
          runStream(spark, sfDir, baseDir, afterWrite = id =>
            if (id == 1) throw new RuntimeException(
              "injected crash: data written, marker not yet created"))
          false
        } catch {
          case e: org.apache.spark.sql.streaming.StreamingQueryException =>
            require(
              // null-guard BOTH messages (ADVICE r17, same fix as
              // StateRecover): a wrapped cause with a null message must
              // surface the "wrong cause" diagnostic, not an NPE
              Option(e.getCause).flatMap(c => Option(c.getMessage))
                .exists(_.contains("injected crash")) ||
                Option(e.getMessage).exists(_.contains("injected crash")),
              s"stream died of the WRONG cause: $e")
            true
        }
      require(died, "crash mode: the injected failure did not propagate")
      // on-disk wreckage must be the protocol's promised shape
      val m0 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-0"))
      val m1 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-1"))
      val orphan = new java.io.File(s"$baseDir/out/batch_id=1")
      require(m0, "epoch 0 marker missing — batch 0 never committed")
      require(!m1, "epoch 1 marker EXISTS — crash seam did not fire before it")
      require(orphan.isDirectory && graft.util.Scratch.dataFiles(orphan.getPath).nonEmpty,
        "orphaned epoch-1 data missing — crash seam fired before the write")
      // poison the orphan: a resume that trusts orphaned bytes instead of
      // re-delivering + overwriting now yields negated epoch-1 prices and
      // the spec's aggregate comparison fails loudly
      val odd = drops.toSeq.sorted.map(f => s"$baseDir/incoming/$f")
      feedSchemaRead(spark, sfDir, odd)
        .withColumn("o_totalprice", -col("o_totalprice"))
        .write.mode("overwrite").parquet(orphan.getPath)
      println("[stream-recover] crashed mid-epoch-1: marker0=present " +
        "marker1=absent orphan=present(poisoned)")
    } finally spark.stop()
  }

  private def feedSchemaRead(spark: SparkSession, sfDir: String,
      paths: Seq[String]): DataFrame =
    spark.read.schema(feed(spark, sfDir).schema).parquet(paths: _*)

  private def resume(sfDir: String, baseDir: String, outFile: String): Unit = {
    val spark = session(baseDir)
    try {
      // no staging, no injection — this JVM knows only checkpoint + dirs
      runStream(spark, sfDir, baseDir, afterWrite = _ => ())
      val m1 = java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$baseDir/manifest/batch-1"))
      require(m1, "resume did not commit epoch 1 — WAL replay failed")
      val rows = spark.read.parquet(s"$baseDir/out")
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
            .as("revenue"))
        .orderBy("o_orderstatus")
        .collect()
        .map(r => s"${r.getString(0)},${r.getLong(1)},${r.getDouble(2)}")
      java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
        rows.mkString("\n").getBytes("UTF-8"))
      println(s"[stream-recover] resumed from checkpoint, exactly-once over ${rows.length} groups")
    } finally spark.stop()
  }

  private def session(baseDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("stream-recover")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
}
