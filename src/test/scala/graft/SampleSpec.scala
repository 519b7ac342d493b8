package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavior pins for the weighted exact-k sampler (llm_sample_weighted_k)
  * beyond its full DuckDB oracle: the A-ES selection must equal a
  * single-threaded reference replay, and the weighting must actually bias
  * toward heavy documents (the op's reason to exist). */
class SampleSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def weightedSample() =
    graft.llm.SampleOps.llmSampleWeightedK(spark, sfDir).collect()

  test("weighted exact-k equals the single-threaded A-ES reference replay") {
    val docs = graft.tables.Tables(spark, sfDir, "documents")
      .select("doc_id", "n_chars").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val k = graft.llm.SampleOps.SampleK
    val ref = docs.map { case (id, w) =>
      val h = ((id % 1000003L) * 45991L) % 2147483647L
      val key = BigDecimal(-math.log((h + 1).toDouble / 2147483648.0) / w)
        .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble
      (key, id)
    }.sortBy(identity).take(k)
    val got = weightedSample().map(r =>
      (r.getAs[Double]("key"), r.getAs[Long]("doc_id"))).toSeq
    assert(got == ref.toSeq,
      s"weighted selection diverged from reference: got ${got.take(3)}… " +
        s"expected ${ref.take(3)}…")
  }

  test("weighting biases the sample toward heavy documents") {
    val sampleMean = {
      val s = weightedSample().map(_.getAs[Long]("n_chars"))
      s.sum.toDouble / s.length
    }
    val corpusMean = graft.tables.Tables(spark, sfDir, "documents")
      .agg(org.apache.spark.sql.functions.avg("n_chars")).head.getDouble(0)
    assert(sampleMean > corpusMean,
      s"weighted sample mean chars $sampleMean not above corpus mean $corpusMean")
  }
}
