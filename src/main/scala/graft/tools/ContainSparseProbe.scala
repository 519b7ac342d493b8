package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sparse-candidate containment probe (round 20, VERDICT r19 queue #6):
  * the candidate-doc restriction in llm_dedup_containment_indexed
  * (ContainRestrictFloor) semi-joins the gram scan down to docs that can
  * appear in a candidate pair BEFORE the per-doc collect_set aggregate.
  * On the fixture it barely restricts — the r19 ContainScaleProbe noted
  * 99.5% of fixture docs are candidates — so its win has never been
  * shown on the corpus shape it was DESIGNED for: a mostly-unique corpus
  * with a small planted-duplicate minority (the realistic web-crawl
  * shape, where boilerplate pairs are a few percent of docs).
  *
  * This probe synthesizes exactly that corpus: n docs of doc-unique
  * sha2-token text; a `pairfrac` minority comes in CONSECUTIVE PAIRS
  * that additionally share a 96-char boilerplate run (→ ~84 shared
  * 13-grams of df=2 — rare by the df∈[2,5] rule — so both pair members
  * become candidates and nobody else does). It then times the shipped
  * llm_dedup_containment_indexed with the restriction ON (natural: n is
  * above the 50k floor) vs OFF (containRestrictFloorOverride, the same
  * test hook PlanSpec uses), and reports the measured candidate-doc
  * fraction so the corpus shape is on record.
  *
  * Run: SPARK_DRIVER_MEM=48g sbt -batch "runMain graft.tools.ContainSparseProbe". */
object ContainSparseProbe {

  def main(args: Array[String]): Unit = {
    val n = graft.util.EnvKnobs.positiveInt("SPARK_GRAFT_SPARSE_N", 200000)
    // 1/pairEvery docs start a boilerplate pair → 2/pairEvery of docs are
    // candidates (default 40 → 5%)
    val pairEvery = graft.util.EnvKnobs.positiveInt("SPARK_GRAFT_SPARSE_PAIR_EVERY", 40)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val shuffle = graft.util.EnvKnobs
      .positiveInt("SPARK_GRAFT_SHUFFLE_PARTITIONS", 64)
    val reps = graft.util.EnvKnobs.positiveInt("SPARK_GRAFT_SPARSE_REPS", 3)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("contain-sparse-probe")
      .config("spark.sql.shuffle.partitions", shuffle.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.ensure(spark)
    import graft.llm.DedupOps

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // ---- the sparse corpus ----------------------------------------------
    // body: 20 doc-unique 16-hex tokens (sha2-derived, deterministic) —
    // every 13-gram has df=1, invisible to rare-gram blocking. Pair
    // members (doc_id ≡ 0,1 mod pairEvery) append a 96-char boilerplate
    // derived from the PAIR key floor(doc_id/2): shared by exactly 2 docs,
    // so its grams have df=2 — candidates by construction.
    val dir = graft.util.Scratch.dir("sparse_contain")
    spark.range(n.toLong)
      .select(col("id").as("doc_id"),
        concat_ws(" ", expr(
          "transform(sequence(1, 20), i -> " +
            "substr(sha2(concat(cast(id as string), '-', cast(i as string)), 256), 1, 16))"))
          .as("body"))
      .withColumn("text",
        when(pmod(col("doc_id"), lit(pairEvery)) < 2,
          concat(col("body"), lit(" "), expr(
            "substr(concat(sha2(concat('bp', cast(floor(doc_id / 2) as string)), 256), " +
              "sha2(concat('bq', cast(floor(doc_id / 2) as string)), 256)), 1, 96)")))
          .otherwise(col("body")))
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    graft.util.Settle.drain() // sync + poll Dirty/Writeback down (round 20)

    // untimed: the stored gram table both paths read (the once-per-corpus
    // offline build, same as Warmup)
    val tbl = DedupOps.gramTable(spark, dir)
    // measured corpus shape: candidate-doc fraction under rare-gram
    // blocking (distinct docs in any rare pair / n)
    val grams = spark.table(tbl).select("doc_id", "g")
    val cand = DedupOps.rarePairs(DedupOps.rareGroups(grams, "g")).distinct()
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .unionByName(cand.select(col("doc_b").as("doc_id"))).distinct().count()

    def runOp(): Unit = DedupOps.llmDedupContainmentIndexed(spark, dir).count()
    // restriction ON — natural at n ≥ the 50k floor (assert, don't assume)
    require(n >= DedupOps.ContainRestrictFloor,
      s"corpus n=$n below ContainRestrictFloor — the ON leg would not restrict")
    val onReps = (1 to reps).map(_ => time(runOp()))
    // restriction OFF — floor forced above n via the test hook
    DedupOps.containRestrictFloorOverride = Some(Long.MaxValue)
    val offReps =
      try (1 to reps).map(_ => time(runOp()))
      finally DedupOps.containRestrictFloorOverride = None

    println(s"""{"metric":"contain_sparse_probe","n_docs":$n,""" +
      s""""cand_docs":$candDocs,"cand_frac":${f2(candDocs.toDouble / n)},""" +
      s""""restricted_sec":${f2(median(onReps))},""" +
      s""""restricted_reps":[${onReps.map(f2).mkString(",")}],""" +
      s""""unrestricted_sec":${f2(median(offReps))},""" +
      s""""unrestricted_reps":[${offReps.map(f2).mkString(",")}]}""")

    DedupOps.clearCaches()
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    graft.util.Scratch.wipeWhere(n => n == "sparse_contain" || n.startsWith("gram_index_"))
    spark.stop()
  }
}
