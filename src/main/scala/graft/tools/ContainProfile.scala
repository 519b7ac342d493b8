package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Profiling probe for `llm_dedup_containment_indexed`'s 2.3× gap over
  * its in-memory twin (VERDICT r16 queue #6): the suspicion on record is
  * that the df-profile and the posting self-join each re-scan the
  * bucketed gram table per call where fewer scans would serve. The op's
  * current plan reads the table in FOUR subtrees: the df aggregate
  * (rare), both sides of the posting self-join (each also re-running the
  * left_semi against rare), and the per-doc set assembly (sets).
  *
  * The probe times, over the real sf dir's stored gram table:
  *   a) the registered op as-is (warm, 3 reps);
  *   b) its stages in isolation (df profile / candidates / set assembly);
  *   c) a ONE-SCAN candidate variant: groupBy(g).collect_list(doc_id)
  *      with size ∈ [2,5] exploded into ordered pairs — candidate
  *      generation collapses three bucketed-table subtrees into one
  *      exchange-free aggregate (df ≤ 5 caps the explode at C(5,2)=10
  *      rows per gram), then the same set-verification join;
  *   d) (round 18) the candidate stage of the registered op itself —
  *      the same one-scan shape with the STATE-BOUNDED collect_upto
  *      aggregate (ADVICE r17): timing (c) vs (d) prices the state cap
  *      on this corpus, and the equality gate below proves the cap is
  *      result-invisible;
  * and asserts (a) and (c) produce IDENTICAL rows before printing the
  * comparison. Run: sbt -batch "runMain graft.tools.ContainProfile [sfDir]".
  *
  * Results recorded in BASELINE.md (round 17): op 4.98 s warm vs 1.28 s
  * for the one-scan variant (identical 254 rows at sf0.1) — so the
  * registered op was SWAPPED to the one-scan shape the same round;
  * `candCurrent` below preserves the pre-swap candidate plan so the
  * comparison stays re-runnable. Round 18: the registered twins (both
  * in-memory and indexed) moved to collect_upto via the shared
  * DedupOps.rareGroups generator; this probe's equality gate now also
  * pins capped-vs-uncapped equivalence. */
object ContainProfile {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("contain-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
    def med3(f: => Unit): Double = {
      val ts = Seq(time(f), time(f), time(f)).sorted
      ts(1)
    }

    // build + warm the stored table (untimed, as Bench's warmup does)
    graft.llm.DedupOps.llmDedupContainmentIndexed(spark, sfDir).count()

    val grams = spark.table(graft.llm.DedupOps.gramTable(spark, sfDir))
      .select("doc_id", "g")

    // ---- (a) the registered op, warm
    val opSec = med3(
      graft.llm.DedupOps.llmDedupContainmentIndexed(spark, sfDir).count())

    // ---- (b) stage isolation
    val dfProfileSec = med3(
      grams.groupBy("g").agg(count(lit(1)).as("nd"))
        .filter(col("nd").between(2, 5)).count())
    def candCurrent = {
      val rare = grams.groupBy("g").agg(count(lit(1)).as("nd"))
        .filter(col("nd").between(2, 5)).select("g")
      val posting = grams.join(rare, Seq("g"), "left_semi")
      posting.hint("merge")
        .join(posting.withColumnRenamed("doc_id", "doc_b"), Seq("g"))
        .filter(col("doc_id") < col("doc_b"))
        .select(col("doc_id").as("doc_a"), col("doc_b"))
        .distinct()
    }
    val candSec = med3(candCurrent.count())
    val setsSec = med3(
      grams.groupBy("doc_id")
        .agg(collect_set(col("g")).as("gs"), count(lit(1)).as("n")).count())

    // ---- (c) one-scan candidate variant + same verification
    def candOneScan = grams
      .groupBy("g").agg(collect_list(col("doc_id")).as("ds"))
      .filter(size(col("ds")).between(2, 5))
      .select(explode(col("ds")).as("doc_a"), col("ds"))
      .select(col("doc_a"), explode(col("ds")).as("doc_b"))
      .filter(col("doc_a") < col("doc_b"))
      .distinct()
    val candOneScanSec = med3(candOneScan.count())

    // ---- (d) the registered candidate stage: one-scan with BOUNDED state
    def candCapped = graft.llm.DedupOps
      .rarePairs(graft.llm.DedupOps.rareGroups(grams, "g")).distinct()
    val candCappedSec = med3(candCapped.count())

    def variantFull = {
      val sets = grams.groupBy("doc_id")
        .agg(collect_set(col("g")).as("gs"), count(lit(1)).as("n"))
      candOneScan
        .join(sets.select(col("doc_id").as("doc_a"), col("gs").as("gs_a"),
          col("n").as("n_a")), Seq("doc_a"))
        .join(sets.select(col("doc_id").as("doc_b"), col("gs").as("gs_b"),
          col("n").as("n_b")), Seq("doc_b"))
        .withColumn("n_shared",
          size(array_intersect(col("gs_a"), col("gs_b"))).cast("long"))
        .filter(greatest(col("n_shared") / col("n_a"),
          col("n_shared") / col("n_b")) >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("n_shared"), col("n_a"),
          col("n_b"),
          round(col("n_shared").cast("double") / col("n_a"), 4).as("cont_a"),
          round(col("n_shared").cast("double") / col("n_b"), 4).as("cont_b"))
        .orderBy("doc_a", "doc_b")
    }
    variantFull.count() // JIT warm
    val variantSec = med3(variantFull.count())

    // ---- equality gate: the variant must be a pure plan change
    val a = graft.llm.DedupOps.llmDedupContainmentIndexed(spark, sfDir)
      .collect().map(_.toString).sorted
    val c = variantFull.collect().map(_.toString).sorted
    require(a.sameElements(c),
      s"variant diverges: op=${a.length} rows, variant=${c.length} rows; " +
        s"first diff=${a.zip(c).find(p => p._1 != p._2)}")

    println(s"""{"metric":"contain_profile","sf":"$sfDir",""" +
      s""""op_sec":${f2(opSec)},"df_profile_sec":${f2(dfProfileSec)},""" +
      s""""cand_current_sec":${f2(candSec)},"sets_sec":${f2(setsSec)},""" +
      s""""cand_onescan_sec":${f2(candOneScanSec)},""" +
      s""""cand_capped_sec":${f2(candCappedSec)},""" +
      s""""variant_full_sec":${f2(variantSec)},"rows":${a.length},""" +
      s""""equal":true}""")
    spark.stop()
  }
}
