package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.CollectUpto — the state-bounded collect behind the
  * rare-key blocking family (ADVICE r17): groups below the cap must be
  * COMPLETE (multiset-equal to collect_list), groups at/above the cap
  * must report exactly `cap` elements (so a downstream
  * `size BETWEEN 2 AND cap-1` filter discards hot keys exactly like the
  * old count-then-semi-join), and both properties must survive
  * partial/final aggregation across many partitions (merge path). */
class CollectUptoSpec extends AnyFunSuite {
  import SparkFixture.spark

  private def ensure(): Unit = graft.functions.GraftFunctions.ensure(spark)

  test("below the cap: multiset-equal to collect_list; at/above: exactly cap elements") {
    ensure()
    import spark.implicits._
    // key k appears k times with values 1000k+1 .. 1000k+k, spread over
    // 13 partitions so partial buffers genuinely merge
    val rows = (1L to 12L).flatMap(k => (1L to k).map(i => (k, 1000 * k + i)))
    val df = spark.createDataset(rows).toDF("k", "v").repartition(13)
    val got = df.groupBy("k")
      .agg(expr("collect_upto(v, 6)").as("capped"),
        collect_list(col("v")).as("full"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1), r.getSeq[Long](2)))
    assert(got.length == 12)
    got.foreach { case (k, capped, full) =>
      if (k < 6) {
        assert(capped.sorted == full.sorted, s"k=$k: incomplete below cap")
      } else {
        assert(capped.length == 6, s"k=$k: expected exactly cap elements, got ${capped.length}")
        // every collected element is a genuine member of the group
        assert(capped.toSet.subsetOf(full.toSet), s"k=$k: foreign element collected")
      }
    }
  }

  test("nulls are skipped; the rare-band filter matches the count-then-join semantics") {
    ensure()
    spark.sql(
      "SELECT * FROM VALUES (1L, 10L), (1L, CAST(null AS BIGINT)), (1L, 11L), (2L, 20L) t(k, v)"
    ).createOrReplaceTempView("cu_nulls")
    val r = spark.sql(
      "SELECT k, size(collect_upto(v, 6)) AS n FROM cu_nulls GROUP BY k ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(r.toSeq == Seq((1L, 2), (2L, 1)))
    // the production gate: size BETWEEN 2 AND 5 keeps df<=5 groups whole
    // and discards df>=6 groups — identical key set to the count aggregate
    import spark.implicits._
    val rows = (1L to 40L).flatMap(k => (1L to (k % 9 + 1)).map(i => (k, i)))
    val df = spark.createDataset(rows).toDF("g", "doc_id").repartition(11)
    val viaCap = df.groupBy("g").agg(expr("collect_upto(doc_id, 6)").as("ds"))
      .filter(size(col("ds")).between(2, 5))
      .select("g").collect().map(_.getLong(0)).toSet
    val viaCount = df.groupBy("g").agg(count(lit(1)).as("nd"))
      .filter(col("nd").between(2, 5))
      .select("g").collect().map(_.getLong(0)).toSet
    assert(viaCap == viaCount && viaCap.nonEmpty)
  }

  test("cap must be a positive literal") {
    ensure()
    spark.range(3).createOrReplaceTempView("cu_bad")
    val e = intercept[Exception] {
      spark.sql("SELECT collect_upto(id, 0) FROM cu_bad").collect()
    }
    assert(e.getMessage.contains("positive"), s"unexpected error: ${e.getMessage}")
  }
}
