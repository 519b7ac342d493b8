package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.llm.TextOps

/** Ground-truth checks for the chunking + TF-IDF operators (both also have
  * full DuckDB oracles; these specs pin the semantic invariants the oracle
  * match alone wouldn't explain): chunk windows must tile every token with
  * the configured stride/overlap, and the top-terms ranking must equal an
  * exact driver-side TF-IDF recompute. */
class TextChunkSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def toks(text: String): Array[String] =
    text.trim.toLowerCase.split("\\s+")

  test("llm_chunk_documents tiles every doc: stride starts, full coverage, exact lengths") {
    val docs = graft.tables.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1))).toMap

    val chunks = TextOps.llmChunkDocuments(spark, sfDir).collect()
      .groupBy(_.getLong(0))

    assert(chunks.keySet == docs.keySet, "every doc chunked, none invented")
    for ((id, rows) <- chunks) {
      val n = docs(id).length
      val sorted = rows.sortBy(_.getInt(1))
      // starts are exactly 0, stride, 2*stride, ... <= n-1
      val starts = sorted.map(_.getInt(2))
      assert(starts.sameElements(0 until n by TextOps.ChunkStride),
        s"doc $id starts $starts")
      for (r <- sorted) {
        val (idx, start, len) = (r.getInt(1), r.getInt(2), r.getInt(3))
        assert(idx == start / TextOps.ChunkStride)
        assert(len == math.min(TextOps.ChunkLen, n - start), s"doc $id chunk $idx")
        assert(r.getString(4) == docs(id)(start), "first token")
        assert(r.getString(5) == docs(id)(start + len - 1), "last token")
      }
      // coverage: windows reach the last token
      assert(starts.last + math.min(TextOps.ChunkLen, n - starts.last) == n)
      // overlap: consecutive full chunks share ChunkLen - ChunkStride tokens
      if (n > TextOps.ChunkStride)
        assert(TextOps.ChunkLen - TextOps.ChunkStride == 16)
    }
  }

  test("llm_tfidf_topterms equals an exact driver-side recompute") {
    val docs = graft.tables.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> toks(r.getString(1)).filter(_.length >= 2))

    val nDocs = docs.length
    val tf = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) => (id, t, g.length) }
    }
    val df = tf.groupBy(_._2).map { case (t, g) => t -> g.length }

    val expected = tf.groupBy(_._1).map { case (id, rows) =>
      id -> rows
        .map { case (_, t, f) => (t, f, df(t), f * (nDocs + 1.0) / (df(t) + 1.0)) }
        .sortBy { case (t, _, _, s) => (-s, t) }
        .take(3)
    }

    val got = TextOps.llmTfidfTopterms(spark, sfDir).collect()
      .groupBy(_.getLong(0))

    assert(got.keySet == expected.keySet)
    for ((id, rows) <- got) {
      val sorted = rows.sortBy(_.getInt(5))
      assert(sorted.map(_.getInt(5)).sameElements(1 to sorted.length), "dense ranks")
      val exp = expected(id)
      assert(sorted.length == exp.length)
      for ((r, (t, f, d, _)) <- sorted.zip(exp)) {
        assert(r.getString(1) == t, s"doc $id rank ${r.getInt(5)} term")
        assert(r.getInt(2) == f && r.getInt(3) == d)
        val tfidf = f * (math.log((nDocs + 1.0) / (d + 1.0)) + 1.0)
        assert(math.abs(r.getDouble(4) - tfidf) < 5e-5)
      }
    }
  }
}
