package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.BitmapDistinctRewrite — the injected optimizer rule
  * must swap count(DISTINCT <integral>) for the bitmap aggregate without
  * changing a single result value, widen int keys, leave non-integral
  * and multi-column distincts alone, and honor its kill switch. */
class RewriteRuleSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def session() = {
    val s = spark.newSession()
    s.experimental.extraOptimizations = Seq(graft.functions.BitmapDistinctRewrite)
    s
  }

  test("count(DISTINCT long) plans as bitmap_distinct with identical results") {
    val s2 = session()
    val df = s2.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("u"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("bitmap_distinct"), s"rewrite did not fire:\n$p")
    assert(!p.toLowerCase.contains("count(distinct"),
      s"distinct count survived the rewrite:\n$p")
    val rewritten = df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val plain = spark.read.parquet(s"$sfDir/orders.parquet")
      .groupBy("o_orderstatus")
      .agg(countDistinct(col("o_custkey")).as("u"), count(lit(1)).as("n"))
      .orderBy("o_orderstatus")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rewritten.toSeq == plain.toSeq)
  }

  test("int keys widen; string keys and multi-column distincts are untouched") {
    val s2 = session()
    val cust = s2.read.parquet(s"$sfDir/customer.parquet")
    val intKey = cust.groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n"))
      .orderBy("c_mktsegment")
    assert(intKey.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
    val expected = spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy("c_mktsegment")
      .agg(countDistinct(col("c_nationkey")).as("n"))
      .orderBy("c_mktsegment")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(intKey.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      expected.toSeq)
    // string key: not bitmap-able, plan must keep the distinct count
    val strKey = cust.groupBy("c_nationkey")
      .agg(countDistinct(col("c_mktsegment")).as("n"))
    assert(!strKey.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
    // multi-column distinct: different semantics, must not rewrite
    val multi = cust.agg(countDistinct(col("c_nationkey"), col("c_mktsegment")).as("n"))
    assert(!multi.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
    assert(multi.collect().head.getLong(0) ==
      cust.select("c_nationkey", "c_mktsegment").distinct().count())
  }

  test("the session kill switch disables the rewrite") {
    val s2 = session()
    s2.conf.set("spark.graft.bitmapDistinct.enabled", "false")
    val df = s2.read.parquet(s"$sfDir/orders.parquet")
      .agg(countDistinct(col("o_custkey")))
    assert(!df.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
    s2.conf.set("spark.graft.bitmapDistinct.enabled", "true")
    val df2 = s2.read.parquet(s"$sfDir/orders.parquet")
      .agg(countDistinct(col("o_custkey")))
    assert(df2.queryExecution.executedPlan.toString.contains("bitmap_distinct"))
  }
}
