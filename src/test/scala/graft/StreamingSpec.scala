package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §5.2.5 — streaming path produces the same final state as the
  * batch path (README.md:74-76 event-driven upsert ≡ batch upsert). */
class StreamingSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("file-source streaming upsert == batch upsert") {
    val streamed = graft.streaming.StreamOps.streamFileSourceUpsert(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    val orders = graft.tables.Tables(spark, sfDir, "orders")
    val expected = orders.select(col("o_orderkey"),
      when(col("o_orderdate") >= lit("2001-01-01"), col("o_totalprice") * 2)
        .otherwise(col("o_totalprice")).as("p"),
      col("o_orderstatus"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(streamed == expected)
  }

  test("streaming hourly window == batch date_trunc aggregation") {
    val streamed = graft.streaming.StreamOps.streamHourlyWindow(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = graft.tables.Tables(spark, sfDir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("flatMapGroupsWithState sessionizer == batch sessionize minus open sessions") {
    val streamed = graft.streaming.StreamOps.streamSessionState(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    // batch ground truth: full sessionization, drop each user's last
    // (still-open) session — recomputed independently of the oracle SQL
    val sess = graft.analytics.Temporal.windowSessionize(spark, sfDir)
    val lastIdx = sess.groupBy("user_id")
      .agg(max(col("session_idx")).as("last_idx"))
    val expected = sess.join(lastIdx, "user_id")
      .filter(col("session_idx") < col("last_idx"))
      .select("user_id", "session_start", "session_end", "n_events", "sum_value")
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed.nonEmpty && streamed == expected)
  }

  test("watermark dedup restores exactly-once counts after duplicate drop") {
    val res = graft.streaming.StreamOps.streamWatermarkLate(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = graft.tables.Tables(spark, sfDir, "events")
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(res == expected)
  }
}
