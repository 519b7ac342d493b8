package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch estimates are not DuckDB-replayable (estimate algorithms differ
  * across engines) — pin accuracy against the exact twins here, and pin
  * the mergeability property: unioning per-day sketches must give the
  * same estimate as sketching the whole column at once. The weak-form
  * oracle frames (verifyQueries) carry the same bounds into the driver's
  * DuckDB compare; the dual pin at the bottom keeps their column contract
  * honest in CI. */
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

  test("HLL set algebra: union and inclusion-exclusion intersection within 5% of exact") {
    // The intersection is DERIVED from three estimates, so its honest
    // error scale is the union cardinality (each term contributes its own
    // HLL error); the direct estimates get the usual per-estimate band.
    val est = graft.analytics.Advanced.aggHllOverlap(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val o = graft.tables.Tables(spark, sfDir, "orders")
      .select(col("o_orderstatus").as("st"), col("o_custkey").as("ck"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val byStatus = o.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(est.nonEmpty)
    est.foreach { case ((a, b), (ea, eb, eu, ei)) =>
      val (sa, sb) = (byStatus(a), byStatus(b))
      val (xa, xb, xu, xi) =
        (sa.size, sb.size, (sa ++ sb).size, (sa & sb).size)
      assert(math.abs(ea - xa) <= 0.05 * xa, s"($a,$b): |A| $ea vs $xa")
      assert(math.abs(eb - xb) <= 0.05 * xb, s"($a,$b): |B| $eb vs $xb")
      assert(math.abs(eu - xu) <= 0.05 * xu, s"($a,$b): |A∪B| $eu vs $xu")
      assert(math.abs(ei - xi) <= 0.05 * xu,
        s"($a,$b): |A∩B| $ei vs $xi (union scale $xu)")
    }
  }

  test("CMS heavy-hitter estimates respect both Count-Min bounds vs exact counts") {
    // Deterministic guarantee: a Count-Min estimate can NEVER undercount
    // (counters only add). Probabilistic guarantee: overcount <= eps*N
    // w.p. >= confidence per key — asserted with 2x slack so the ~1%
    // per-key tail over a 50-key panel can't flake CI.
    val est = graft.analytics.Advanced.aggHeavyHittersCms(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = graft.tables.Tables(spark, sfDir, "events")
    val exact = ev.filter(col("user_id") < 50)
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = ev.count()
    val slack = math.max(1L, math.ceil(2 * 0.0001 * n).toLong)
    assert(est.keySet == exact.keySet && est.nonEmpty)
    exact.foreach { case (k, c) =>
      assert(est(k) >= c, s"user $k: CMS undercounted ${est(k)} < $c — impossible if correct")
      assert(est(k) <= c + slack,
        s"user $k: estimate ${est(k)} exceeds exact $c + 2*eps*N slack $slack")
    }
  }

  test("merged per-type CMS sketches answer like the single-pass sketch") {
    // Mergeability — the property that makes the sketch an index at
    // 100 TB (build per day/partition, union at query time): sketches
    // built per event_type, merged via counter addition, must estimate
    // within the SAME eps band as the whole-column sketch. Merge runs on
    // collected binaries (|event types| rows of metadata, the same shape
    // as the HLL union test above).
    import org.apache.spark.util.sketch.CountMinSketch
    val ev = graft.tables.Tables(spark, sfDir, "events")
    val parts = ev.groupBy("event_type")
      .agg(expr("count_min_sketch(user_id, cast(0.0001 as double), cast(0.99 as double), 42)").as("sk"))
      .collect().map(_.getAs[Array[Byte]]("sk"))
    assert(parts.length > 1, "need >1 per-type sketch for a meaningful merge")
    val merged = parts.map(b => CountMinSketch.readFrom(new java.io.ByteArrayInputStream(b)))
      .reduce { (a, b) => a.mergeInPlace(b); a }
    val single = graft.analytics.Advanced.aggHeavyHittersCms(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    single.foreach { case (k, est) =>
      assert(merged.estimateCount(java.lang.Long.valueOf(k)) == est,
        s"user $k: merged-sketch estimate != single-pass estimate")
    }
  }

  test("stats-bounds histogram equals the exact two-scan twin bin-for-bin") {
    // VERDICT r10 #4: the single-scan twin's bounds come from ANALYZE-time
    // catalog stats, which store the exact min/max as round-trippable
    // strings — so this is an EQUALITY pin, not a tolerance band: every
    // (bin, bin_lo, n) row must match, or the stats path silently drifted
    // from the data (e.g. a stale ANALYZE after a reload).
    val exact = graft.analytics.Queries.aggHistogramPrices(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    val stats = graft.analytics.Queries.aggHistogramApprox(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(exact.nonEmpty && stats == exact,
      s"stats-bounds histogram diverged from exact twin:\nexact=$exact\nstats=$stats")
  }

  test("stats-median MAD twin lands within 1% of the exact twin") {
    // VERDICT r11 #5: the approx side sources its median from the
    // segment-stats artifact (approx_percentile, accuracy 10000) and its
    // MAD from a sketch over the deviations — both return OBSERVED values
    // where the exact twin's percentile() interpolates, so this is a
    // tolerance pin, not an equality: each of median_price and mad must
    // land within 1% relative of the exact value, and row counts match
    // exactly (counts don't ride the sketch). sf0.01, not the fixture's
    // sf0.001: the 1% band is a statement about sketch rank error, which
    // needs enough rows per segment that one adjacent-rank gap in
    // o_totalprice is well under 1% of the MAD — at sf0.001 a segment
    // holds ~300 orders and a single gap near the deviation median is
    // itself >1%, which would test the corpus, not the sketch.
    val dir = "/root/testdata/sf0.01"
    val exact = graft.analytics.Advanced.aggMedianMad(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    val approx = graft.analytics.Advanced.aggMedianMadApprox(spark, dir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (seg, (n, med, mad)) =>
      val (an, amed, amad) = approx(seg)
      assert(an == n, s"$seg: row counts must be exact")
      assert(math.abs(amed - med) <= 0.01 * math.abs(med),
        s"$seg: median $amed vs exact $med exceeds 1%")
      assert(math.abs(amad - mad) <= 0.01 * math.abs(mad),
        s"$seg: mad $amad vs exact $mad exceeds 1%")
    }
  }

  test("agg_percentile_approx lands within tolerance of the exact percentile twin") {
    val exact = graft.analytics.Queries.aggPercentilePrice(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    val approx = graft.analytics.Advanced.aggPercentileApprox(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (status, (p50, p90, cnt)) =>
      val (a50, a90, acnt) = approx(status)
      assert(acnt == cnt, s"$status: row counts must be exact")
      // accuracy 10000 ⇒ the sketch answer is within 1/10000 of the true
      // RANK; at these group sizes that is ≤ 1 rank, but exact percentile
      // interpolates between ranks while the sketch returns an observed
      // value, so allow one rank-step of value slack via a 1% relative band
      assert(math.abs(a50 - p50) / math.max(1.0, p50) <= 0.01,
        s"$status: approx p50 $a50 vs exact $p50")
      assert(math.abs(a90 - p90) / math.max(1.0, p90) <= 0.01,
        s"$status: approx p90 $a90 vs exact $p90")
    }
  }

  test("agg_profile_approx: distinct counts within 5% of exact, and the Expand is gone") {
    val exact = graft.analytics.Advanced.aggTableProfile(spark, sfDir)
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val df = graft.analytics.Advanced.aggProfileApprox(spark, sfDir)
    val approx = df
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(approx.keySet == exact.keySet && approx.nonEmpty)
    exact.foreach { case (c, (nRows, nNulls, nDist)) =>
      val (aRows, aNulls, aDist) = approx(c)
      assert(aRows == nRows && aNulls == nNulls,
        s"$c: row/null counts must stay exact")
      val rel = math.abs(aDist - nDist).toDouble / math.max(1L, nDist)
      assert(rel <= 0.05, s"$c: approx distinct $aDist vs exact $nDist (rel err $rel)")
    }
    // the point of the approx tier: exact multi-countDistinct plans an
    // Expand (×(cols+1) row replication map-side); HLL buffers must not
    val exactPlan = graft.analytics.Advanced.aggTableProfile(spark, sfDir)
      .queryExecution.executedPlan.toString
    val approxPlan = df.queryExecution.executedPlan.toString
    assert(exactPlan.contains("Expand"), "exact twin should plan an Expand (baseline)")
    assert(!approxPlan.contains("Expand"),
      s"approx profile must aggregate without the Expand blowup:\n$approxPlan")
    // Round 10: the sketches must be DataSketches TypedImperativeAggregates
    // (ObjectHashAggregate holds ONE opaque buffer per sketch) — the HLL++
    // spelling flattens ~2.3k buffer slots per column into HashAggregate
    // codegen, blows the JIT budget, and ran 2.2× the exact twin warm
    // (ContractSpec twin gate). Pin the mechanism, not just the absence
    // of Expand.
    assert(approxPlan.contains("ObjectHashAggregate"),
      s"approx profile must keep sketches as opaque objects (ObjectHashAggregate):\n$approxPlan")
  }

  test("weak-oracle verify frames: every bound boolean true, schema oracle-shaped") {
    // Round 15: the three approx twins' driver rows ride these frames
    // (SparkEntry.verifyQueries) — their bound booleans must be TRUE and
    // their column names must match what the DuckDB oracle SQL emits,
    // else the driver row hash-fails a round later than CI can catch it.
    // The MAD bounds carry a rank-slack term (±0.5% ranks around the
    // median — see medianMadApproxJoined) so they hold at every SF tier.
    // Pin BOTH the fixture tier and the driver tier (review r15):
    // sf0.001 is where the plain 1% bound historically failed (one
    // adjacent-rank gap exceeds 1% of the MAD there), so it is the tier
    // that catches a regression of the slack term — at sf0.01 the 1%
    // bound passes even without it.
    val dirs = Seq(sfDir, "/root/testdata/sf0.01")
    val expectedCols = Map(
      "agg_percentile_approx" ->
        Seq("o_orderstatus", "cnt", "p50_exact", "p90_exact", "p50_ok", "p90_ok"),
      "agg_median_mad_approx" ->
        Seq("c_mktsegment", "n_orders", "median_exact", "mad_exact", "med_ok", "mad_ok"),
      "agg_profile_approx" ->
        Seq("column", "n_rows", "n_nulls", "n_distinct", "dist_ok"),
      "agg_hll_mergeable" ->
        Seq("event_type", "n_days", "exact_users", "hll_ok"),
      "agg_heavy_hitters_cms" ->
        Seq("user_id", "exact_cnt", "lower_ok", "upper_ok"),
      "agg_hll_overlap" ->
        Seq("status_a", "status_b", "exact_a", "exact_b", "exact_union",
          "exact_intersect", "a_ok", "b_ok", "union_ok", "intersect_ok"))
    // Scoped to the approx-aggregate frames this spec owns — the round-15
    // llm sketch frames (minhash/simhash/span/index/ivf/kmeans/bpe/
    // fingerprint) are pinned by WeakOracleSpec.
    assert(graft.analytics.Advanced.verifyQueries.keySet == expectedCols.keySet)
    for (dir <- dirs; (name, fn) <- graft.analytics.Advanced.verifyQueries) {
      val df = fn(spark, dir)
      assert(df.columns.toSeq == expectedCols(name),
        s"$name verify-frame columns drifted: ${df.columns.toSeq}")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name verify frame is empty at $dir")
      val okCols = expectedCols(name).filter(_.endsWith("_ok"))
      okCols.foreach { c =>
        val idx = df.columns.indexOf(c)
        assert(rows.forall(_.getBoolean(idx)),
          s"$name at $dir: bound column $c has a false row — estimate outside tolerance")
      }
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
