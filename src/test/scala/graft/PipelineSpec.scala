package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.etl.Upsert

/** SURVEY.md §5.2.4 — end-to-end replay of the reference pipeline
  * (README.md:54-72): one historical load, then three incremental batches
  * with overlapping keys (re-deliveries), merged via the staging→final
  * upsert. The final state must equal a last-write-wins replay, have no
  * duplicate keys, and preserve rows never re-delivered. */
class PipelineSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("historical + 3 overlapping incremental batches == last-write-wins replay") {
    val orders = graft.tables.Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_totalprice", "o_orderdate")

    // historical: everything before 2001; three hourly-style batches with
    // deliberately overlapping date windows (the reference's re-delivery /
    // "sync issue" case), each stamping its batch id into the price
    val hist = orders.filter(col("o_orderdate") < "2001-01-01")
      .withColumn("batch", lit(0))
    val windows = Seq(
      ("2001-01-01", "2001-05-01", 1),
      ("2001-03-01", "2001-07-01", 2), // overlaps batch 1
      ("2001-05-01", "2001-09-01", 3)) // overlaps batch 2
    val batches = windows.map { case (from, to, id) =>
      orders.filter(col("o_orderdate") >= from && col("o_orderdate") < to)
        .withColumn("batch", lit(id))
    }

    val finalState = batches.foldLeft(hist) { (state, b) =>
      Upsert.upsert(state, b, "o_orderkey")
    }.collect().map(r => r.getLong(0) -> r.getInt(3)).toMap

    // ground truth: per key, the LAST batch whose window contains its date
    val expected = orders
      .select(col("o_orderkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("d"))
      .collect().map { r =>
        val (key, d) = (r.getLong(0), r.getString(1))
        val winner = windows.collect {
          case (from, to, id) if d >= from && d < to => id
        }.lastOption.getOrElse(0)
        key -> winner
      }.toMap

    assert(finalState.keySet == expected.keySet, "no rows lost or invented")
    assert(finalState == expected, "last-write-wins per key")
  }
}
