package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round 15: the fifteen xxhash/sketch/iterative llm ops' driver rows ride
  * weak-form verification frames (SparkEntry.verifyQueries — exact columns
  * DuckDB replays + bound booleans the oracle pins TRUE). This spec keeps
  * those frames honest in CI at the fixture tier: column contract stable
  * (a drifted name hash-fails the driver a full round later than CI can
  * catch it) and every boolean column all-TRUE. The sf0.01 driver tier is
  * exercised by the correctness gate itself (and was hand-verified with
  * tools/check_oracle.py when the frames landed); sf0.1 — the tier that
  * STRESSED the designs (one spurious minhash pair, the simhash 200-cut
  * dropping 28 of 182 J≥0.9 pairs, rare-fp blocking hiding 241 of 259
  * long-run pairs from span) — was validated the same way, recorded in
  * BASELINE.md round 15. */
class WeakOracleSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  // op -> (expected columns, boolean columns that must be all-TRUE)
  private val frames: Map[String, (Seq[String], Seq[String])] = Map(
    "llm_dedup_minhash" ->
      (Seq("doc_a", "doc_b", "jaccard", "detected", "est_ok", "fp_bounded"),
        Seq("detected", "est_ok", "fp_bounded")),
    "llm_dedup_minhash_indexed" ->
      (Seq("doc_a", "doc_b", "jaccard", "detected", "est_ok", "fp_bounded"),
        Seq("detected", "est_ok", "fp_bounded")),
    "llm_sig_index_append" ->
      (Seq("doc_a", "doc_b", "jaccard", "detected", "est_ok", "fp_bounded"),
        Seq("detected", "est_ok", "fp_bounded")),
    "llm_dedup_simhash" ->
      (Seq("n_docs", "pairs_bounded", "dup_zero_ok", "ham_bound_ok"),
        Seq("pairs_bounded", "dup_zero_ok", "ham_bound_ok")),
    "llm_dedup_simhash_indexed" ->
      (Seq("n_docs", "pairs_bounded", "dup_zero_ok", "ham_bound_ok"),
        Seq("pairs_bounded", "dup_zero_ok", "ham_bound_ok")),
    "llm_dedup_span" ->
      (Seq("n_docs", "precision_ok", "nonempty_ok"),
        Seq("precision_ok", "nonempty_ok")),
    "llm_dedup_span_indexed" ->
      (Seq("n_docs", "precision_ok", "nonempty_ok"),
        Seq("precision_ok", "nonempty_ok")),
    "llm_sig_index_build" ->
      (Seq("band", "n_rows", "buckets_ok"), Seq("buckets_ok")),
    "llm_sim_index_build" ->
      (Seq("chunk", "n_rows", "cvals_ok"), Seq("cvals_ok")),
    "llm_span_index_build" ->
      (Seq("n_docs", "n_positions", "density_ok", "distinct_ok"),
        Seq("density_ok", "distinct_ok")),
    "llm_similarity_ivf" ->
      (Seq("k", "sim20_exact", "recall_ok"), Seq("recall_ok")),
    "llm_cluster_kmeans" ->
      (Seq("n_vectors", "cells_ok", "inertia_ok"),
        Seq("cells_ok", "inertia_ok")),
    "llm_fingerprint" ->
      (Seq("doc_id", "n_shingles", "dup_consistent"), Seq("dup_consistent")),
    "llm_bpe_train" ->
      (Seq("merge_left", "merge_right", "pair_count", "steps_ok",
        "counts_ok", "merges_bounded"),
        Seq("steps_ok", "counts_ok", "merges_bounded")),
    "llm_bpe_apply" ->
      (Seq("doc_id", "n_words", "n_chars", "tokens_ge_words",
        "tokens_le_chars", "fully_merged_ok"),
        Seq("tokens_ge_words", "tokens_le_chars", "fully_merged_ok")))

  test("llm weak-oracle frame registry covers exactly the sketch ops") {
    val llmKeys = SparkEntry.verifyQueries.keySet --
      graft.analytics.Advanced.verifyQueries.keySet
    assert(llmKeys == frames.keySet,
      s"frame registry drift: only-live=${llmKeys -- frames.keySet}, " +
        s"only-spec=${frames.keySet -- llmKeys}")
    // every weak-form op must ALSO have driver oracle SQL — that pairing
    // is what turns a no_oracle row into a checked one
    val missingSql = frames.keySet -- SparkEntry.oracleSql.keySet
    assert(missingSql.isEmpty, s"weak-form ops without oracle SQL: $missingSql")
  }

  test("llm weak-oracle frames: columns stable, every bound boolean true") {
    for ((name, (cols, bools)) <- frames) {
      val df = SparkEntry.verifyQueries(name)(spark, sfDir)
      assert(df.columns.toSeq == cols,
        s"$name verify-frame columns drifted: ${df.columns.toSeq}")
      val rows = df.collect()
      assert(rows.nonEmpty, s"$name verify frame is empty at $sfDir")
      bools.foreach { c =>
        val idx = df.columns.indexOf(c)
        assert(rows.forall(!_.isNullAt(idx)),
          s"$name: bound column $c has a null row")
        assert(rows.forall(_.getBoolean(idx)),
          s"$name at $sfDir: bound column $c has a false row")
      }
    }
  }

  test("weak-frame bound constants live in VerifyBounds and match the " +
      "oracle-SQL contract (ADVICE r15)") {
    import graft.util.VerifyBounds
    // the one constant that must equal a production sketch parameter: the
    // CMS expression interpolates VerifyBounds.CmsEps, so the eps·N upper
    // band provably grades the sketch it configures — assert the frame and
    // the oracle stay on the weak-form contract (TRUE-pinned booleans)
    assert(VerifyBounds.CmsEps > 0 && VerifyBounds.CmsEps < 0.01)
    assert(VerifyBounds.CmsSlack >= 1.0)
    // oracle SQL pins exactly the boolean columns the frames compute —
    // a renamed/dropped bound column must fail HERE, not a driver round later
    val minhashSql = SparkEntry.oracleSql("llm_dedup_minhash")
    for (c <- Seq("detected", "est_ok", "fp_bounded"))
      assert(minhashSql.contains(s"TRUE AS $c"),
        s"minhash oracle SQL no longer pins $c")
    // the detection threshold in the oracle's WHERE must be the shared
    // constant (interpolated, so this asserts the interpolation survived)
    assert(minhashSql.contains(s">= ${VerifyBounds.JaccardThreshold}"),
      "minhash oracle SQL threshold drifted from VerifyBounds.JaccardThreshold")
    // sanity on the new precision gate's shape
    assert(VerifyBounds.MinhashFpFloor >= 1L &&
      VerifyBounds.MinhashFpFrac > 0 && VerifyBounds.MinhashFpFrac < 0.5)
  }

  test("minhash frame pins precision: zero spurious detections at fixture " +
      "scale, fp_bounded computed not constant") {
    // At the fixture tier the spurious count is measured 0, well under the
    // floor of 4; assert the frame's fp gate actually bit on the data by
    // recomputing the anti-join here.
    import org.apache.spark.sql.functions._
    val det = SparkEntry.queries("llm_dedup_minhash")(spark, sfDir)
      .select("doc_a", "doc_b")
    val exact = SparkEntry.queries("llm_dedup_ngram_jaccard")(spark, sfDir)
      .select("doc_a", "doc_b")
    val nFp = det.join(exact, Seq("doc_a", "doc_b"), "left_anti").count()
    val nTrue = exact.count()
    val cap = math.max(graft.util.VerifyBounds.MinhashFpFloor,
      math.ceil(graft.util.VerifyBounds.MinhashFpFrac * nTrue).toLong)
    assert(nFp <= cap, s"spurious detections $nFp exceed cap $cap")
  }

  test("minhash frame rows are the exact-Jaccard pair set (recall gate)") {
    // The frame's row KEYS must equal DuckDB's exact >=0.5 pair replay for
    // the driver hash to match; in CI, pin the Spark-side equivalent: the
    // frame carries every verified pair exactly once, pairs are ordered,
    // and the exact-jaccard column is within [0.5, 1].
    val df = SparkEntry.verifyQueries("llm_dedup_minhash")(spark, sfDir)
    val rows = df.collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length ==
      rows.length, "duplicate pair rows")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pair not ordered doc_a < doc_b")
      val j = r.getDouble(2)
      assert(j >= 0.5 && j <= 1.0, s"exact jaccard out of range: $j")
    }
  }
}
