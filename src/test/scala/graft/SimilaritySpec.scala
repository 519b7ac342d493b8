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

  test("IVF ANN returns 20 plausible neighbors; recall measured vs exact") {
    val exact = graft.llm.SimilarityOps.llmSimilarityTopk(spark, sfDir)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val ivf = graft.llm.SimilarityOps.llmSimilarityIvf(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(ivf.length == 20)
    assert(ivf.forall { case (_, s) => s >= -1.000001 && s <= 1.000001 })
    val recall = ivf.map(_._1).toSet.intersect(exact).size / 20.0
    info(s"IVF recall@20 (nprobe=4/16) = $recall")
    // Random 64-dim embeddings are a worst case for a Euclidean coarse
    // quantizer under cosine similarity; require better-than-chance probing
    // (chance = nprobe/nlist = 0.25 of the corpus).
    assert(recall >= 0.25, s"IVF recall $recall below probed fraction")
  }

  test("cosine is bounded and self-similarity is 1") {
    import org.apache.spark.sql.functions._
    val e = graft.tables.Tables(spark, sfDir, "embeddings").limit(50)
      .select(col("embedding").as("x"))
    val sims = e.select(graft.llm.DedupOps.cosineExpr("x", "x").as("s"))
      .collect().map(_.getDouble(0))
    assert(sims.forall(s => math.abs(s - 1.0) < 1e-6))
  }
}
