package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY.md §2.10 — ground-truth recompute for the xxhash64-based
  * signatures that have no DuckDB oracle (the rows-only gap ADVICE r1
  * flagged): llm_fingerprint and the SimHash index. Strategy: pull the raw
  * texts to the driver, re-derive shingles/tokens in plain Scala, hash the
  * distinct strings through ONE trivial Spark projection (xxhash64 itself is
  * taken as given — what's under test is the HOF pipeline around it:
  * sequence/substring windows, array_min, the 64-way bitsum fold), then
  * fold driver-side and compare exactly. */
class FingerprintSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private lazy val texts: Array[(Long, String)] =
    graft.tables.Tables(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))

  /** xxhash64 (seed 42, Spark's default) of each distinct string, via a
    * single-column projection — no shingling logic on the Spark side. */
  private def hashOf(strings: Seq[String]): Map[String, Long] = {
    import spark.implicits._
    strings.distinct.toDF("s")
      .select(col("s"), xxhash64(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("llm_fingerprint equals a driver-side min-shingle recompute") {
    // same windowing as the plan: 8-char shingles, whole text if shorter
    def shingles(t: String): Seq[String] =
      if (t.length >= 8) (0 to t.length - 8).map(i => t.substring(i, i + 8))
      else Seq(t)
    val h = hashOf(texts.toSeq.flatMap(d => shingles(d._2)))
    val expected = texts.map { case (id, t) =>
      val hs = shingles(t).map(h)
      id -> ((hs.min, hs.distinct.size))
    }.toMap
    val got = graft.llm.TextOps.llmFingerprint(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(got == expected)
  }

  test("simhash index equals a driver-side bitsum-fold recompute") {
    def tokens(t: String): Seq[String] =
      t.trim.toLowerCase.split("\\s+").toSeq
    val h = hashOf(texts.toSeq.flatMap(d => tokens(d._2)))
    val expected = texts.map { case (id, t) =>
      val bitsums = new Array[Long](64)
      tokens(t).foreach { tok =>
        val th = h(tok)
        var j = 0
        while (j < 64) {
          bitsums(j) += (if (((th >> j) & 1L) == 1L) 1L else -1L); j += 1
        }
      }
      id -> (0 until 64).map(j => if (bitsums(j) > 0) 1L << j else 0L).sum
    }.toMap
    val got = graft.llm.DedupOps.simIndex(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("llm_dedup_simhash equals brute-force chunk+band candidates ranked by Hamming") {
    // mirror the operator's candidate rule: >=1 equal 16-bit chunk AND
    // token-count half-octave bands within +-1 (band = bit length of
    // n_tok², exactly what length(bin(n_tok*n_tok)) computes)
    val sim = graft.llm.DedupOps.simIndex(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
    def chunks(s: Long): Seq[Long] = (0 to 3).map(c => (s >> (16 * c)) & 0xFFFFL)
    def band(nTok: Int): Int = {
      val sq = nTok.toLong * nTok
      if (sq == 0) 1 else 64 - java.lang.Long.numberOfLeadingZeros(sq)
    }
    val expected = (for {
      i <- sim.indices.iterator
      j <- (i + 1) until sim.length
      (ida, sa, ta) = sim(i); (idb, sb, tb) = sim(j)
      if math.abs(band(ta) - band(tb)) <= 1 &&
        chunks(sa).zip(chunks(sb)).exists { case (x, y) => x == y }
    } yield (ida, idb, java.lang.Long.bitCount(sa ^ sb)))
      .toSeq.sortBy { case (a, b, ham) => (ham, a, b) }.take(200)
    val got = graft.llm.DedupOps.llmDedupSimhash(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == expected)
  }
}
