package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.VectorAvg — the typed-imperative centroid aggregate must
  * match the composed Spark spelling (posexplode → per-dimension avg →
  * ordered reassembly), survive serialization across partial/final
  * aggregation, and handle empty/null inputs. */
class VectorAvgSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("vector_avg equals the explode-and-regroup spelling to 1e-9") {
    val e = graft.tables.Tables(spark, sfDir, "embeddings")
      .select(col("label"), expr("cast(embedding as array<double>)").as("emb"))
      // many partitions so partial buffers really merge
      .repartition(7)
    val native = e.groupBy("label").agg(expr("vector_avg(emb)").as("c"))
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getSeq[Double](1)).toMap
    val composed = e
      .select(col("label"), posexplode(col("emb")).as(Seq("idx", "v")))
      .groupBy("label", "idx").agg(avg(col("v")).as("m"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("idx"), col("m")))).as("s"))
      .select(col("label"), expr("transform(s, p -> p.m)").as("c"))
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getSeq[Double](1)).toMap
    assert(native.keySet == composed.keySet && native.nonEmpty)
    native.foreach { case (l, v) =>
      v.zip(composed(l)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"label $l: $a vs $b")
      }
    }
  }

  test("vector_avg of an empty group is null; null vectors are skipped") {
    val r = spark.sql(
      "SELECT vector_avg(v) AS c FROM (SELECT cast(null as array<double>) AS v)"
    ).collect().head
    assert(r.isNullAt(0))
    val r2 = spark.sql(
      "SELECT vector_avg(v) AS c FROM (" +
        "SELECT array(1.0d, 3.0d) AS v UNION ALL SELECT cast(null as array<double>) " +
        "UNION ALL SELECT array(3.0d, 5.0d))").collect().head
    assert(r2.getSeq[Double](0) == Seq(2.0, 4.0))
  }

  test("GraftExtensions exposes every GraftFunctions builder with working arity") {
    // getOrCreate would hand back the fixture session (extensions only
    // apply to a freshly built one), so exercise the same builder list the
    // extension injects: names, arity checks, and constructed expressions.
    import org.apache.spark.sql.catalyst.expressions.Literal
    val byName = graft.functions.GraftFunctions.builders.toMap
    assert(byName.keySet == Set("vector_dot", "vector_avg", "vector_sumq",
      "cms_estimate", "bloom_might_contain", "bloom_filter_agg",
      "ngram_hashes", "minhash_sig", "bitmap_distinct", "winnow_fps",
      "nfc_normalize", "collect_upto", "sorted_intersect_count"))
    val lit = Literal.create(Array(1.0), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.DoubleType))
    val bin = Literal.create(Array[Byte](1),
      org.apache.spark.sql.types.BinaryType)
    val keys = Literal.create(Array(1L), org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType))
    val one = Literal.create(1L, org.apache.spark.sql.types.LongType)
    assert(byName("vector_dot")(Seq(lit, lit)).isInstanceOf[graft.functions.VectorDot])
    assert(byName("vector_avg")(Seq(lit)).isInstanceOf[graft.functions.VectorAvg])
    assert(byName("vector_sumq")(Seq(lit)).isInstanceOf[graft.functions.VectorSumQ])
    assert(byName("cms_estimate")(Seq(bin, keys))
      .isInstanceOf[graft.functions.CmsEstimate])
    assert(byName("bloom_might_contain")(Seq(bin, one))
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain])
    assert(byName("bloom_filter_agg")(Seq(one))
      .isInstanceOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate])
    val str = Literal.create(org.apache.spark.unsafe.types.UTF8String.fromString("abc"),
      org.apache.spark.sql.types.StringType)
    val n = Literal.create(5, org.apache.spark.sql.types.IntegerType)
    assert(byName("ngram_hashes")(Seq(str, n))
      .isInstanceOf[graft.functions.NgramHashes])
    assert(byName("minhash_sig")(Seq(keys, n))
      .isInstanceOf[graft.functions.MinhashSig])
    intercept[IllegalArgumentException](byName("ngram_hashes")(Seq(str)))
    intercept[IllegalArgumentException](byName("minhash_sig")(Seq(keys)))
    intercept[IllegalArgumentException](byName("vector_dot")(Seq(lit)))
    intercept[IllegalArgumentException](byName("vector_avg")(Seq(lit, lit)))
    intercept[IllegalArgumentException](byName("vector_sumq")(Seq(lit, lit)))
    intercept[IllegalArgumentException](byName("cms_estimate")(Seq(bin)))
    intercept[IllegalArgumentException](byName("bloom_might_contain")(Seq(bin)))
    assert(byName("bitmap_distinct")(Seq(one))
      .isInstanceOf[graft.functions.BitmapDistinct])
    assert(byName("sorted_intersect_count")(Seq(keys, keys))
      .isInstanceOf[graft.functions.SortedIntersectCount])
    intercept[IllegalArgumentException](byName("sorted_intersect_count")(Seq(keys)))
    intercept[IllegalArgumentException](byName("bloom_filter_agg")(Seq(one, one)))
    assert(byName("winnow_fps")(Seq(str, n, n))
      .isInstanceOf[graft.functions.WinnowFps])
    intercept[IllegalArgumentException](byName("bitmap_distinct")(Seq(one, one)))
    intercept[IllegalArgumentException](byName("winnow_fps")(Seq(str, n)))
    assert(byName("nfc_normalize")(Seq(str))
      .isInstanceOf[graft.functions.NfcNormalize])
    intercept[IllegalArgumentException](byName("nfc_normalize")(Seq(str, str)))
    assert(byName("collect_upto")(Seq(one, n))
      .isInstanceOf[graft.functions.CollectUpto])
    intercept[IllegalArgumentException](byName("collect_upto")(Seq(one)))
    // and the class itself applies cleanly to a fresh extensions object
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("bitmap_distinct is exact, partition-invariant, null-skipping, and " +
      "correct on sparse/negative/page-boundary keys") {
    import spark.implicits._
    graft.functions.GraftFunctions.ensure(spark)
    // page boundaries (4095/4096), negatives (floor-shift paging), a far
    // page (2^40), and duplicates — the cases a lazy >> would corrupt
    val keys = Seq(0L, 1L, 4095L, 4096L, -1L, -4096L, -4097L,
      1L << 40, (1L << 40) + 1, 7L, 7L, 7L, -1L)
    val expected = keys.distinct.size.toLong
    def cnt(parts: Int): Long = keys.toDF("k").repartition(parts)
      .agg(expr("bitmap_distinct(k)")).collect().head.getLong(0)
    assert(cnt(1) == expected && cnt(13) == expected)
    val withNull = (keys.map(Option(_)) :+ (None: Option[Long])).toDF("k")
    assert(withNull.repartition(5).agg(expr("bitmap_distinct(k)"))
      .collect().head.getLong(0) == expected)
    // and it equals count(DISTINCT) on the real fixture, per group
    val ev = graft.tables.Tables(spark, sfDir, "events")
    val native = ev.groupBy("event_type")
      .agg(expr("bitmap_distinct(user_id)").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = ev.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(native.nonEmpty && native == exact)
  }

  test("vector_sumq is EXACTLY partition-invariant (integer sums, no float drift)") {
    val e = graft.tables.Tables(spark, sfDir, "embeddings")
      .select(col("label"), expr("cast(embedding as array<double>)").as("emb"))
    def sums(parts: Int): Map[Long, Seq[Long]] =
      e.repartition(parts).groupBy("label")
        .agg(expr("vector_sumq(emb)").as("s"))
        .collect().map(r => r.getAs[Number](0).longValue() -> r.getSeq[Long](1)).toMap
    val a = sums(3)
    val b = sums(17)
    // == on the Long arrays: bit-exact equality, the property vector_avg
    // cannot give and the SemDeDup keep/drop ordering depends on
    assert(a.nonEmpty && a == b)
    // and it matches the composed quantize-explode-regroup spelling exactly
    val composed = e
      .select(col("label"),
        posexplode(expr("transform(emb, x -> CAST(floor(x * 1e6 + 0.5) AS BIGINT))"))
          .as(Seq("idx", "v")))
      .groupBy("label", "idx").agg(sum(col("v")).as("s"))
      .groupBy("label")
      .agg(array_sort(collect_list(struct(col("idx"), col("s")))).as("l"))
      .select(col("label"), expr("transform(l, p -> p.s)").as("s"))
      .collect().map(r => r.getAs[Number](0).longValue() -> r.getSeq[Long](1)).toMap
    assert(a == composed)
  }

  test("vector_sumq of an empty group is null") {
    val r = spark.sql(
      "SELECT vector_sumq(v) AS s FROM (SELECT cast(null as array<double>) AS v)"
    ).collect().head
    assert(r.isNullAt(0))
  }
}
