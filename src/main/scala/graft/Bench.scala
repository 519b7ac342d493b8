package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional comma-separated subset for local iteration (default: all).
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSet)
    val selected = only.fold(SparkEntry.queries)(s => SparkEntry.queries.filter(q => s(q._1)))
    // JIT/codegen warmup outside the timed loop so the first measured query
    // isn't charged for one-time JVM work. Best-effort: a bad sfDir must
    // surface as per-query failures below, not kill the run here.
    try spark.read.parquet(s"$sfDir/region.parquet")
      .groupBy("r_name").count().count()
    catch { case _: Throwable => () }
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] WARNING: unknown query names in SPARK_GRAFT_ONLY: ${unknown.mkString(", ")}")
    }
    // A failed query reports -1 (excluded from the total) instead of a
    // plausible-looking elapsed time — a regression that makes queries fail
    // fast must not read as a speedup.
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false
        }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    val nFailed = results.values.count(_ < 0)
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
