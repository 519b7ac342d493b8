package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decomposition probe for the minhash-indexed ×128 residual (round 18:
  * the bucket curve left minhash_indexed at ~13× for 4× data even after
  * shuffle followed volume, while its candidate COUNTS are known-linear
  * from the width section). For each scale it builds the stored signature
  * table with the session's bucket config, then separates the three
  * possible cost carriers:
  *
  *   - cells: the (band, bhash) collision structure — n_rows, distinct
  *     cells, max cell size, and Σ C(cell,2) (= exactly the rows the
  *     banded self-join emits). Superlinear joined-pairs growth here
  *     would mean quadratic hot-cell structure (an LSH/corpus problem);
  *   - scan_sec: one full pass over the stored table (payload volume);
  *   - join_sec: the bucketed self-join + doc_a<doc_b filter, COUNT only
  *     (no signature comparison) — merge-join machinery + payload;
  *   - consume_sec: the full registered consumer (adds the K-element
  *     zip_with estimate per joined row + the pair aggregate).
  *
  * Warm medians of 3, each rep on a freshly built frame (the stage-skip
  * trap, BASELINE r18). Scales via SPARK_GRAFT_SIG_PROBE_SCALES
  * (default 32,128); bucket/shuffle config via the usual env knobs so
  * the probe runs under exactly the curve's configuration.
  * Run: sbt -batch "runMain graft.tools.SigScaleProbe [sfDir]". */
object SigScaleProbe {

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = graft.util.EnvKnobs
      .positiveInt("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus.toInt)
    val scales = graft.util.EnvKnobs
      .positiveIntList("SPARK_GRAFT_SIG_PROBE_SCALES", Seq(32, 128))
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("sig-scale-probe")
      .config("spark.sql.shuffle.partitions", shuffle.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def med3(f: => Unit): Double =
      Seq(time(f), time(f), time(f)).sorted.apply(1)

    scales.foreach { scale =>
      val dir = graft.util.Replicas.docsDir(spark, base, scale, "sigprobe")
      val tBuild = time(graft.llm.DedupOps.sigTable(spark, dir))
      def idx = spark.table(graft.llm.DedupOps.sigTable(spark, dir))

      val cells = idx.groupBy("band", "bhash").count()
        .agg(count(lit(1)).as("n_cells"), max(col("count")).as("max_cell"),
          sum(col("count") * (col("count") - 1) / 2).cast("long").as("joined_pairs"))
        .head
      val nRows = idx.count()

      val scanSec = med3(idx.agg(sum(size(col("sig")))).head)
      def joinOnly = {
        val a = idx.select(col("band"), col("bhash"), col("doc_id").as("doc_a"))
        val b = idx.select(col("band"), col("bhash"), col("doc_id").as("doc_b"))
        a.hint("merge").join(b, Seq("band", "bhash"))
          .filter(col("doc_a") < col("doc_b"))
      }
      val joinSec = med3(joinOnly.count())
      val consumeSec =
        med3(graft.llm.DedupOps.llmDedupMinhashIndexed(spark, dir).count())

      println(s"""{"metric":"sig_scale_probe","scale":$scale,""" +
        s""""build_sec":${f2(tBuild)},"n_rows":$nRows,""" +
        s""""n_cells":${cells.getAs[Long]("n_cells")},""" +
        s""""max_cell":${cells.getAs[Long]("max_cell")},""" +
        s""""joined_pairs":${cells.getAs[Long]("joined_pairs")},""" +
        s""""scan_sec":${f2(scanSec)},"join_sec":${f2(joinSec)},""" +
        s""""consume_sec":${f2(consumeSec)}}""")
      graft.llm.DedupOps.clearCaches()
    }
    spark.stop()
  }
}
