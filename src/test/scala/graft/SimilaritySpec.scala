package graft

import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.10 — ANN vs exact cosine top-k recall. */
class SimilaritySpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("ANN top-20 recall >= 0.5 vs exact top-20, and top-1 agrees") {
    val exact = graft.llm.SimilarityOps.llmSimilarityTopk(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0))
    val ann = graft.llm.SimilarityOps.llmSimilarityAnn(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0))
    assert(exact.length == 20)
    val recall = ann.toSet.intersect(exact.toSet).size.toDouble / exact.length
    assert(recall >= 0.5, s"ANN recall $recall too low")
    assert(ann.head == exact.head, "top-1 neighbor must survive multi-probe")
  }

  test("batch ANN knn join: candidate cut is real and mean recall@5 vs the exact join holds") {
    val exact = graft.llm.SimilarityOps.llmSimilarityKnnJoin(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val ann = graft.llm.SimilarityOps.llmSimilarityKnnJoinAnn(spark, sfDir)
      .select("qid", "vec_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(exact.nonEmpty && ann.keySet.subsetOf(exact.keySet))
    val recalls = exact.map { case (q, ex) =>
      ann.getOrElse(q, Set.empty).intersect(ex).size.toDouble / ex.size
    }
    val mean = recalls.sum / recalls.size
    info(f"batch ANN mean recall@5 over ${exact.size} queries = $mean%.2f")
    // near-random fixture corpus at the derived ~34% bucket budget: the
    // probe is information-limited (same argument as AnnScaleSpec, which
    // pins the planted-neighbor regime at 1.0) — require a solid majority
    assert(mean >= 0.4, f"batch ANN mean recall $mean%.2f below floor")
  }

  test("IVF ANN returns 20 plausible neighbors; recall measured vs exact") {
    val exact = graft.llm.SimilarityOps.llmSimilarityTopk(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = graft.llm.SimilarityOps.llmSimilarityIvf(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.length == 20)
    assert(ivf.forall { case (_, s) => s >= -1.000001 && s <= 1.000001 })
    val recall = ivf.map(_._1).toSet.intersect(exact).size / 20.0
    info(s"IVF recall@20 (nlist=128, 40% row-budget prefix) = $recall")
    // round-9 geometry (nlist=sqrt(32n)=128, 40% row-budget prefix)
    // measured mean recall@20 = 0.902 at 39.6% scanned (IvfTune, 50
    // queries — up from 0.842 at 43.3% under the r7 64/28 policy); the
    // seeded pipeline is deterministic, so the single registered query
    // must hold the floor.
    assert(recall >= 0.8, s"IVF recall $recall below 0.8 floor")
  }

  test("IVF mean recall@20 >= 0.8 over 25 queries at <= 1/2 corpus scanned") {
    import org.apache.spark.sql.functions._
    val (assigned, centers) = graft.llm.SimilarityOps.ivfIndex(spark, sfDir)
    val n = assigned.count().toDouble
    // sf0.001 is small: evaluate on the driver against the same persisted
    // index the operator reads (exact ground truth = brute-force cosine)
    val rows = assigned.select("vec_id", "emb", "norm", "cell").collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray, r.getDouble(2), r.getInt(3)))
    val ctr = centers.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val cellSize = rows.groupBy(_._4).map { case (c, v) => c -> v.length }
    var recallSum = 0.0
    var scannedSum = 0.0
    val qs = rows.filter(_._1 < 25)
    for ((qid, qv, qn, _) <- qs) {
      def cos(v: Array[Double], vn: Double) =
        v.zip(qv).map { case (a, b) => a * b }.sum / (vn * qn)
      val exact = rows.filter(_._1 != qid)
        .sortBy { case (id, v, vn, _) => (-cos(v, vn), id) }.take(20).map(_._1).toSet
      // replicate the operator's probe policy: cosine-ranked cells, kept
      // while the cumulative occupancy prefix fits the row budget — via
      // the SAME driver-side helper IvfTune measures with (one copy; the
      // independent replication that pins the OPERATOR is this ranking +
      // the DataFrame plan, not a third hand-rolled loop)
      val ranked = ctr.toSeq.map { case (c, cv) =>
        val cn = math.sqrt(cv.map(x => x * x).sum)
        (c, cv.zip(qv).map { case (a, b) => a * b }.sum / (cn * qn))
      }.sortBy { case (c, s) => (-s, c) }
      val probed = IvfTune.cumPolicy(graft.llm.SimilarityOps.IvfScanBudget,
        cellSize.map { case (c, s) => c -> s.toLong }, n.toLong)(ranked).toSet
      val got = rows.filter(r => r._1 != qid && probed(r._4))
        .sortBy { case (id, v, vn, _) => (-cos(v, vn), id) }.take(20).map(_._1).toSet
      recallSum += got.intersect(exact).size / 20.0
      scannedSum += probed.toSeq.map(c => cellSize.getOrElse(c, 0)).sum / n
    }
    val (recall, scanned) = (recallSum / qs.length, scannedSum / qs.length)
    info(f"IVF mean recall@20 = $recall%.3f at $scanned%.3f corpus scanned")
    assert(recall >= 0.8, s"mean recall $recall below 0.8")
    assert(scanned <= 0.5, s"scanned fraction $scanned above 1/2")
  }

  test("cosine is bounded and self-similarity is 1") {
    import org.apache.spark.sql.functions._
    val e = graft.tables.Tables(spark, sfDir, "embeddings").limit(50)
      .select(col("embedding").as("x"))
    val sims = e.select(graft.llm.DedupOps.cosineExpr("x", "x").as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-6))
  }

  test("quantize survives an all-zero vector (failed-encode row): zeros, no ANSI cast error") {
    import org.apache.spark.sql.functions._
    // the testdata has no zero vectors, so the oracle can't exercise this
    // guard; unguarded, 127/0 = Inf and CAST(round(0*Inf) AS BIGINT) kills
    // the whole job under ANSI
    val dir = graft.util.Scratch.dir("quantize_zero_vec")
    graft.tables.Tables(spark, sfDir, "embeddings").limit(5)
      .select(col("vec_id"), col("embedding"), col("label"))
      .unionByName(spark.range(1).select(
        lit(999999L).as("vec_id"),
        expr("transform(sequence(1, 64), i -> CAST(0.0 AS FLOAT))").as("embedding"),
        lit(7).as("label")))
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = graft.llm.SimilarityOps.llmEmbeddingQuantize(spark, dir).collect()
    assert(rows.length == 6)
    val z = rows.find(_.getLong(0) == 999999L).get
    assert(z.getDouble(2) == 0.0 && z.getLong(3) == 0L &&
      z.getInt(4) == 0 && z.getDouble(5) == 0.0,
      s"zero vector must quantize to zeros: $z")
    // the non-zero rows still quantize with bounded reconstruction error
    rows.filter(_.getLong(0) != 999999L).foreach { r =>
      assert(r.getDouble(5) <= 0.5 / r.getDouble(2) + 1e-9,
        s"max_err must be bounded by 0.5/scale: $r")
    }
  }
}
