package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Element-exact equivalence of the round-11 native text-hash expressions
  * against the HOF spellings they replaced. The dedup indexes' entire
  * downstream correctness (banding, Jaccard verification, the full DuckDB
  * oracles) rides on these being IDENTICAL, not just similar — any
  * deviation in value OR order is a silent index change. Run on the real
  * corpus so every code path (multi-byte chars if present, short docs,
  * duplicate grams) is exercised with production data. */
class TextHashSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private lazy val docs = graft.tables.Tables(spark, sfDir, "documents")
    .select(col("doc_id"), lower(trim(col("text"))).as("t"))

  private def collectArrays(e: String): Map[Long, Seq[Long]] =
    docs.select(col("doc_id"), expr(e).as("a")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap

  test("ngram_hashes(t, 13) equals the HOF gram spelling, element for element") {
    val native = collectArrays("ngram_hashes(t, 13)")
    val hof = collectArrays(
      "array_distinct(transform(sequence(1, greatest(length(t) - 12, 1)), " +
        "i -> xxhash64(substring(t, i, 13))))")
    assert(native.keySet == hof.keySet)
    native.foreach { case (id, a) =>
      assert(a == hof(id), s"gram hash mismatch for doc $id")
    }
  }

  test("ngram_hashes(t, 5) equals the HOF shingle spelling") {
    val native = collectArrays("ngram_hashes(t, 5)")
    val hof = collectArrays(
      "array_distinct(transform(sequence(1, greatest(length(t) - 4, 1)), " +
        "i -> xxhash64(substring(t, i, 5))))")
    assert(native == hof)
  }

  test("minhash_sig(hsh, 32) equals the HOF permutation spelling") {
    val native = collectArrays("minhash_sig(ngram_hashes(t, 5), 32)")
    val hof = collectArrays(
      "transform(sequence(0, 31), s -> array_min(transform(" +
        "array_distinct(transform(sequence(1, greatest(length(t) - 4, 1)), " +
        "i -> xxhash64(substring(t, i, 5)))), h -> xxhash64(h, s))))")
    assert(native == hof)
  }

  test("edge cases: short, empty, multi-byte, duplicate-heavy strings") {
    val rows = Seq("", "ab", "abcde", "aaaaaaaaaa", "héllo wörld — ünïcode",
      "xyxyxyxyxyxyxy", "日本語のテキストです")
    val df = spark.createDataFrame(rows.map(Tuple1(_))).toDF("t")
    val got = df.select(expr("ngram_hashes(t, 5)").as("a"),
      expr("array_distinct(transform(sequence(1, greatest(length(t) - 4, 1)), " +
        "i -> xxhash64(substring(t, i, 5))))").as("b"))
      .collect()
    got.zip(rows).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"mismatch on '$s'")
    }
    // minhash on the same edge strings (skip empty: array_min of an empty
    // array is null on the HOF side, a null-element array natively — the
    // indexes never see empty gram sets because n-gram windows are >= 1)
    val sig = df.select(expr("minhash_sig(ngram_hashes(t, 3), 8)").as("a"),
      expr("transform(sequence(0, 7), s -> array_min(transform(" +
        "array_distinct(transform(sequence(1, greatest(length(t) - 2, 1), 1), " +
        "i -> xxhash64(substring(t, i, 3)))), h -> xxhash64(h, s))))").as("b"))
      .collect()
    sig.zip(rows).foreach { case (r, s) =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"sig mismatch on '$s'")
    }
  }
}
