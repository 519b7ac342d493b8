package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** agg_hll_mergeable has no DuckDB oracle (estimate algorithms differ
  * across engines) — pin its accuracy against the exact distinct count
  * instead, and pin the mergeability property: unioning per-day sketches
  * must give the same estimate as sketching the whole column at once. */
class ApproxSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("merged HLL estimates land within 5% of exact distinct counts") {
    val est = graft.analytics.Advanced.aggHllMergeable(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.tables.Tables(spark, sfDir, "events")
      .groupBy("event_type").agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    exact.foreach { case (t, n) =>
      val rel = math.abs(est(t) - n).toDouble / n
      assert(rel <= 0.05, s"$t: estimate ${est(t)} vs exact $n (rel err $rel)")
    }
  }

  test("union of per-day sketches equals the single-pass sketch") {
    val ev = graft.tables.Tables(spark, sfDir, "events")
    val merged = ev
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(expr("hll_sketch_agg(user_id, 12)").as("sk"))
      .groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = ev.groupBy("event_type")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // near-equality, not ==: direct updates use the HIP estimator but a
    // union falls back to the composite estimator once sketches leave
    // sparse/coupon mode, so dense-mode estimates can differ by a few
    // counts at higher cardinalities
    assert(merged.keySet == single.keySet && merged.nonEmpty)
    merged.foreach { case (t, m) =>
      val s = single(t)
      assert(math.abs(m - s).toDouble / math.max(1L, s) <= 0.01,
        s"$t: union estimate $m vs single-pass $s")
    }
  }
}
