package graft.util

import org.apache.spark.sql.SparkSession

/** Ad-hoc local profiling main (not part of the driver contract). */
object Debug {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val sig = timed("sigIndex build+count") {
      val s = graft.llm.DedupOps.sigIndex(spark, sfDir); s.count(); s
    }
    timed("sigIndex reread count")(sig.count())
    println("[debug] avg shingles: " +
      sig.selectExpr("avg(size(shingles))").collect().head)
    timed("banded index count")(println("[debug] banded rows: " +
      graft.llm.DedupOps.bandedIndex(spark, sfDir).count()))
    timed("candidate pairs count")(println("[debug] candidates: " +
      graft.llm.DedupOps.minhashCandidates(spark, sfDir).count()))
    timed("minhash full")(println("[debug] minhash rows: " +
      graft.llm.DedupOps.llmDedupMinhash(spark, sfDir).count()))
    timed("ngram full")(println("[debug] ngram rows: " +
      graft.llm.DedupOps.llmDedupNgramJaccard(spark, sfDir).count()))
    timed("simhash full")(println("[debug] simhash rows: " +
      graft.llm.DedupOps.llmDedupSimhash(spark, sfDir).count()))
    spark.stop()
  }
}
