package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.QFn
import graft.etl.Upsert
import graft.tables.Tables
import graft.util.Scratch

/** SURVEY.md §2.9 — the reference's "streaming" is event-driven micro-batch
  * orchestration: an hourly Data Pipeline run (README.md:58-60) and an
  * S3-ObjectCreated→Lambda→Glue trigger (README.md:74-76,128,156-158).
  * Structured Streaming's file source + Trigger.AvailableNow reproduces
  * both with zero extra processes: new files are discovered, each batch is
  * upserted via foreachBatch, and watermark+dropDuplicates covers the
  * "sync issue" late/duplicate drops (README.md:123).
  *
  * The DuckDB oracle can't run streams, so each query returns the final
  * materialized state and the oracle is the batch-equivalent SQL
  * (SURVEY.md §2.9 note). Batch-vs-stream equivalence is additionally
  * asserted in StreamingSpec.
  */
object StreamOps {

  private def uniq(prefix: String): String =
    prefix + "_" + java.lang.Long.toHexString(System.nanoTime())

  /** Run a STATEFUL stream with a shuffle-partition count sized to the
    * stream, then restore. The partition count of a stateful query is a
    * real deployment decision made once per checkpoint (it is baked into
    * the state store layout and cannot change afterwards): size it to
    * volume/keyspace — 4 for the ~10k-row test streams here, executor
    * count × cores for a production stream. 32 state-store instances per
    * stateful operator on a 10k-row stream is pure commit overhead.
    * Synchronized for the same session-global-conf reason as Tables. */
  private def withStreamPartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    this.synchronized {
      val key = "spark.sql.shuffle.partitions"
      val prev = spark.conf.get(key)
      spark.conf.set(key, n.toString)
      try body finally spark.conf.set(key, prev)
    }

  /** File-drop → incremental upsert (README.md:74-76,156-158): each
    * discovered file batch is merged into the current state via the §2.4
    * anti-join∪staging plan, flip-flopping between two state dirs (the
    * staging/final pattern of README.md:25,67 without a warehouse). */
  val streamFileSourceUpsert: QFn = (spark, sfDir) => {
    val orders = Tables(spark, sfDir, "orders")
    val base = Scratch.dir("stream_file_source_upsert")
    val incoming = s"$base/incoming"
    val histDir = s"$base/hist"
    val dirs = Array(s"$base/stateA", s"$base/stateB")

    val sel = Seq("o_orderkey", "o_totalprice", "o_orderstatus", "o_orderdate")
    orders.select(sel.map(col): _*).write.mode("overwrite").parquet(histDir)
    // two staged "S3 drops": re-delivered 2001 orders with doubled price
    val stg = orders.filter(col("o_orderdate") >= lit("2001-01-01"))
      .withColumn("o_totalprice", col("o_totalprice") * 2)
      .select(sel.map(col): _*)
    stg.filter(col("o_orderdate") < lit("2001-05-01"))
      .write.mode("append").parquet(incoming)
    stg.filter(col("o_orderdate") >= lit("2001-05-01"))
      .write.mode("append").parquet(incoming)

    var cur = histDir
    var i = 0
    val q = spark.readStream.schema(stg.schema).parquet(incoming)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val next = dirs(i % 2); i += 1
        Upsert.upsert(spark.read.parquet(cur), batch, "o_orderkey")
          .write.mode("overwrite").parquet(next)
        cur = next
        ()
      }
      .option("checkpointLocation", s"$base/ckpt")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    spark.read.parquet(cur)
      .select("o_orderkey", "o_totalprice", "o_orderstatus")
      .orderBy("o_orderkey")
  }

  /** Hourly tumbling-window counts over the event stream (README.md:58-60
    * hourly cadence as a real stream aggregation).
    *
    * Scale note: complete-mode + memory sink is the TEST harness shape (the
    * DuckDB oracle needs the whole result). A production 100 TB stream runs
    * the same plan with `withWatermark` + update/append mode into a real
    * sink, so state is bounded by the watermark horizon instead of holding
    * every window forever. */
  val streamHourlyWindow: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val base = Scratch.dir("stream_hourly_window")
    ev.write.mode("overwrite").parquet(s"$base/src")
    val name = uniq("stream_hourly_window")
    withStreamPartitions(spark, 4) {
      val q = spark.readStream.schema(ev.schema).parquet(s"$base/src")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .count()
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"), col("count").as("cnt"))
      .orderBy("hour", "event_type")
  }

  /** Watermark + dropDuplicates against late/duplicate file drops — the
    * reference's "sync issue" (README.md:123): the same events file lands
    * twice; event_id dedup restores exactly-once counts. */
  val streamWatermarkLate: QFn = (spark, sfDir) => {
    val ev = Tables(spark, sfDir, "events")
    val base = Scratch.dir("stream_watermark_late")
    ev.write.mode("append").parquet(s"$base/src")
    ev.write.mode("append").parquet(s"$base/src") // duplicate drop
    val name = uniq("stream_watermark_late")
    withStreamPartitions(spark, 4) {
      val q = spark.readStream.schema(ev.schema).parquet(s"$base/src")
        .withWatermark("ts", "1 hour")
        .dropDuplicates("event_id")
        .groupBy("event_type").count()
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    spark.table(name)
      .select(col("event_type"), col("count").as("cnt"))
      .orderBy("event_type")
  }

  val queries: Map[String, QFn] = Map(
    "stream_file_source_upsert" -> streamFileSourceUpsert,
    "stream_hourly_window" -> streamHourlyWindow,
    "stream_watermark_late" -> streamWatermarkLate,
  )

  val oracleSql: Map[String, String] = Map(
    "stream_file_source_upsert" ->
      ("SELECT o_orderkey, CASE WHEN o_orderdate >= TIMESTAMP '2001-01-01' " +
        "THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice, o_orderstatus " +
        "FROM orders ORDER BY o_orderkey"),
    "stream_hourly_window" ->
      ("SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, " +
        "event_type, count(*) AS cnt FROM events GROUP BY 1, 2 ORDER BY 1, 2"),
    "stream_watermark_late" ->
      "SELECT event_type, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
  )
}
