package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** graft.functions.VectorDot — the native codegen'd dot product must be
  * bit-identical to the HOF fold it replaced (same left-to-right
  * summation), on both the codegen and interpreted eval paths, and must
  * keep the surrounding projection inside whole-stage codegen. */
class VectorExprSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def embs = graft.tables.Tables(spark, sfDir, "embeddings")
    .select(col("vec_id"), expr("cast(embedding as array<double>)").as("emb"))

  private val hofDot =
    "aggregate(zip_with(emb, reverse(emb), (x, y) -> x * y), cast(0 as double), (acc, v) -> acc + v)"

  test("vector_dot is bit-identical to the HOF fold") {
    val rows = embs
      .select(expr("vector_dot(emb, reverse(emb))").as("native"), expr(hofDot).as("hof"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("vector_dot interpreted path (codegen off) matches codegen path") {
    val expected = embs.select(expr("vector_dot(emb, emb)")).collect().map(_.getDouble(0))
    val key = "spark.sql.codegen.wholeStage"
    val prev = spark.conf.get(key)
    spark.conf.set(key, "false")
    try {
      val interp = embs.select(expr("vector_dot(emb, emb)")).collect().map(_.getDouble(0))
      assert(interp.sameElements(expected))
    } finally spark.conf.set(key, prev)
  }

  test("vector_dot propagates null arrays and handles length mismatch") {
    val r = spark.sql(
      "SELECT vector_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d)) AS prefix, " +
        "vector_dot(cast(null as array<double>), array(1.0d)) AS n").collect().head
    assert(r.getDouble(0) == 1.0 * 4.0 + 2.0 * 5.0)
    assert(r.isNullAt(1))
  }

  test("vector_sumq and vector_avg fail loudly on ragged dimensions") {
    // ADVICE r7: min-truncating ragged vectors would make the result
    // depend on which row a partition saw first — the aggregates' whole
    // contract is layout-invariance, so mismatch must throw, not truncate.
    for (fn <- Seq("vector_sumq", "vector_avg")) {
      val e = intercept[Exception] {
        spark.sql(
          s"""SELECT $fn(v) FROM VALUES (array(1.0d, 2.0d)), (array(1.0d)) AS t(v)"""
        ).collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("ragged vector dimensions")),
        s"$fn: expected ragged-dimension error, got: ${msgs(e).mkString(" | ")}")
    }
  }

  test("vector_dot casts float arrays and stays inside whole-stage codegen") {
    val df = graft.tables.Tables(spark, sfDir, "embeddings")
      .select(expr("vector_dot(embedding, embedding)").as("d")) // array<float> input
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)"), s"projection fell out of whole-stage codegen:\n$p")
  }
}
