package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage decomposition for round-21 targets (scratch tool). */
object R21Stage {
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
    graft.llm.Warmup.indexes(spark, sfDir)
    graft.tables.Tables.registerAll(spark, sfDir)
    def t(label: String)(body: => Long): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val n = body
        println(f"[stage] $label%-30s rep$i ${(System.nanoTime() - t0) / 1e9}%7.3f s  n=$n")
      }
    }
    import graft.llm.DedupOps
    val groups = DedupOps.rareGramGroups(spark, sfDir)
    t("rareGramGroups.count") { groups.count() }
    val cand = DedupOps.rarePairs(groups)
    t("rarePairs.count") { cand.count() }
    t("rarePairs.distinct.count") { cand.distinct().count() }
    t("gramSets.count") { DedupOps.gramSets(spark, sfDir).count() }
    t("containment full") {
      graft.SparkEntry.queries("llm_dedup_containment")(spark, sfDir).count()
    }
    t("cluster_incr contraction") {
      DedupOps.clusterContraction(spark, sfDir).count()
    }
    t("cluster_incr full") {
      graft.SparkEntry.queries("llm_dedup_cluster_incremental")(spark, sfDir).count()
    }
    t("cluster full") {
      graft.SparkEntry.queries("llm_dedup_cluster")(spark, sfDir).count()
    }
    spark.stop()
  }
}
