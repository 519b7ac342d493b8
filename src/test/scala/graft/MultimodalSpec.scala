package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Frame-sampling semantics: every 4th 64-byte window, checksum = sum of
  * character codes, frame numbering in stride units. Recomputed in plain
  * Scala for a sample of docs (no DuckDB oracle — per-row lateral ranges
  * aren't cleanly expressible there). */
class MultimodalSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("framesample matches a Scala recomputation on sampled docs") {
    val got = graft.llm.MultimodalOps.llmMultimodalFramesample(spark, sfDir)
      .filter(col("doc_id") < 5)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))

    val texts = graft.tables.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 5).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

    val expected = texts.toSeq.sortBy(_._1).flatMap { case (id, text) =>
      val nFrames = math.ceil(text.length / 64.0).toInt
      (0 to (nFrames - 1) / 4).map { k =>
        val start = k * 4 * 64
        val cs = (1 to 64).map { i =>
          val pos = start + i - 1
          if (pos < text.length) text.charAt(pos).toInt else 0
        }.sum
        (id, nFrames, k * 4, cs)
      }
    }
    assert(got.toSeq.sortBy(t => (t._1, t._3)) == expected)
  }

  test("resize keeps every 2nd codepoint (Scala recomputation)") {
    val got = graft.llm.MultimodalOps.llmMultimodalResize(spark, sfDir)
      .filter(col("doc_id") < 10).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    val texts = graft.tables.Tables(spark, sfDir, "documents")
      .filter(col("doc_id") < 10).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = texts.toSeq.sortBy(_._1).map { case (id, t) =>
      val kept = t.zipWithIndex.collect { case (c, i) if i % 2 == 0 => c.toInt }
      (id, t.length, (t.length + 1) / 2, kept.sum)
    }
    assert(got.toSeq.sortBy(_._1) == expected)
  }

  test("frame count scales with document length") {
    val df = graft.llm.MultimodalOps.llmMultimodalFramesample(spark, sfDir)
    val perDoc = df.groupBy("doc_id").count()
      .join(graft.tables.Tables(spark, sfDir, "documents"), "doc_id")
      .select(col("count"),
        (floor((ceil(col("n_chars") / 64.0) - 1) / 4) + 1).as("exp"))
      .collect()
    assert(perDoc.forall(r => r.getLong(0) == r.getLong(1)))
  }
}
