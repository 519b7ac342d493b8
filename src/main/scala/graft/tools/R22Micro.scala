package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-22 micro-decomposition of the Tables.apply per-call cost (guide
  * §1 — measure first): times N repetitions of (a) the full Tables.apply
  * path, (b) the bare read.schema().parquet() relation build, (c) a plan
  * action (schema touch) on the result — so the ADVICE r21 cache redesign
  * rides a measured split, not a guess. Not part of the driver contract. */
object R22Micro {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", graft.util.Scratch.resetKeep("spark_local"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = sys.env.getOrElse("SPARK_GRAFT_MICRO_REPS", "50").toInt
    def bench(tag: String)(f: => Unit): Unit = {
      f // warm once
      val t0 = System.nanoTime()
      (1 to n).foreach(_ => f)
      val ms = (System.nanoTime() - t0) / 1e6 / n
      println(f"[micro] $tag%-45s ${ms}%8.3f ms/call (n=$n)")
    }
    for (tbl <- Seq("orders", "events", "lineitem")) {
      val schema = graft.tables.Tables(spark, sfDir, tbl).schema
      bench(s"Tables.apply($tbl)") {
        graft.tables.Tables(spark, sfDir, tbl)
      }
      bench(s"read.schema.parquet($tbl)") {
        spark.read.schema(schema).parquet(s"$sfDir/$tbl.parquet")
      }
      bench(s"read.schema.parquet($tbl).select(first)") {
        spark.read.schema(schema).parquet(s"$sfDir/$tbl.parquet")
          .select(schema.fieldNames.head)
      }
      bench(s"inferred read.parquet($tbl)") {
        spark.read.parquet(s"$sfDir/$tbl.parquet")
      }
    }
    // a representative cheap op end to end, for the fixed-cost floor item
    val fn = graft.SparkEntry.queries("fn_year_month")
    bench("fn_year_month plan construction") { fn(spark, sfDir) }
    val df = fn(spark, sfDir)
    bench("fn_year_month executedPlan (analyze+optimize)") {
      fn(spark, sfDir).queryExecution.executedPlan
    }
    spark.stop()
  }
}
