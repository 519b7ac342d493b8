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
    // Shared-index warmup (untimed, duration reported separately below):
    // the MinHash/SimHash/embedding/IVF indexes are built once per session
    // and consumed by many llm_* queries — without this, whichever query
    // runs first absorbs the whole build cost and per-query regressions
    // aren't attributable. Skipped when no selected query touches them.
    val warmupSec: Double = {
      val w0 = System.nanoTime()
      if (selected.keys.exists(_.startsWith("llm_")))
        try graft.llm.Warmup.indexes(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] index warmup failed: ${e.getMessage}")
        }
      // star stats are a separate warmup so a star-only selection does not
      // pay for llm_* index materializations it never touches
      if (selected.contains("agg_sales_by_category_star"))
        try graft.llm.Warmup.starStats(spark, sfDir)
        catch { case e: Throwable =>
          System.err.println(s"[bench] star-stats warmup failed: ${e.getMessage}")
        }
      // one-time Derby OLTP seed (test scaffolding — at scale the source
      // database exists before the extract runs)
      if (selected.contains("scan_jdbc_export"))
        graft.etl.Ingest.derbyUrl(spark, sfDir)
      (System.nanoTime() - w0) / 1e9
    }
    only.foreach { s =>
      val unknown = s -- SparkEntry.queries.keySet
      if (unknown.nonEmpty)
        System.err.println(s"[bench] WARNING: unknown query names in SPARK_GRAFT_ONLY: ${unknown.mkString(", ")}")
    }
    // Fixed-workload host calibration: a deterministic CPU-bound job whose
    // cost is independent of the query set and scale factor. Cross-round
    // totals can only be compared after normalizing by this — round 3
    // measured the identical warmup workload 4-5× slower than round 2 with
    // ~0% hypervisor steal (slower per-core host), which would otherwise
    // read as a regression.
    // collect() (not count()) forces the aggregate — count() on an agg
    // result prunes the whole computation to an empty Range loop. The fold
    // is bit_xor, not sum: summing 200M xxhash64 longs overflows and ANSI
    // mode turns that into an error.
    val calibSec: Double = {
      val t0 = System.nanoTime()
      spark.range(0, 200000000L, 1, cpus.toInt)
        .selectExpr("xxhash64(id) AS h")
        .selectExpr("bit_xor(h) AS x").collect()
      (System.nanoTime() - t0) / 1e9
    }
    // Second calibration with a real shuffle: the round-3 host showed
    // episodes where pure-CPU throughput (calib above) stayed flat while
    // shuffle-heavy fixed workloads ran 4-5× slower — the two numbers
    // together tell a reader WHICH regime a given bench total ran under.
    val calibShuffleSec: Double = {
      val t0 = System.nanoTime()
      spark.range(0, 5000000L, 1, cpus.toInt)
        .selectExpr("pmod(xxhash64(id), 100000) AS k")
        .groupBy("k").count()
        .agg(org.apache.spark.sql.functions.sum("count")).collect()
      (System.nanoTime() - t0) / 1e9
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
    // Per-query detail on its OWN line, then a short machine-parseable
    // total as the FINAL line: the driver tail-captures stdout and a single
    // multi-KB line got its head (the metric/value prefix) truncated in
    // round 1 (BENCH_r01.json parsed:null).
    def f3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f3(v) }
      .mkString("{", ",", "}")
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    val nFailed = results.values.count(_ < 0)
    // Self-normalized totals so a bench line is comparable across host
    // regimes WITHOUT forensic reads of BASELINE.md: divide by the ratio of
    // this run's calibration to the recorded clean-regime nominal (calib
    // 0.50 CPU / 1.15 shuffle — BASELINE.md round-2/4 fast regime). A run
    // on a 10×-slower host then reports total_normalized ≈ what the clean
    // host would have measured. Normalization can only be as honest as the
    // calibration workload's resemblance to the query mix, so both raw and
    // normalized values are emitted — the raw total stays the ground truth.
    val calibNominal = 0.50
    val calibShuffleNominal = 1.15
    val hostFactor = math.max(calibSec / calibNominal, 1e-9)
    val hostShuffleFactor = math.max(calibShuffleSec / calibShuffleNominal, 1e-9)
    // ADVICE r6: normalization is only honest near the recorded regime —
    // a far-off calibration (host episode, or a future edit to the
    // calibration workload itself) must be FLAGGED, not silently divided
    // through. The nominals are emitted too, so a reader can re-derive
    // the factor without BASELINE.md forensics; when abnormal, trust the
    // raw total and the calib pair, not total_normalized.
    val calibAbnormal = hostFactor > 3.0 || hostFactor < 1.0 / 3.0 ||
      hostShuffleFactor > 3.0 || hostShuffleFactor < 1.0 / 3.0
    // Family subtotals: ~18-20% of the total is the four streaming ops'
    // SF-invariant checkpoint/state-commit floor — splitting it out lets
    // cross-round reads track the analytic band directly.
    def famSum(p: String => Boolean): Double =
      results.collect { case (k, v) if p(k) && v >= 0 => v }.sum
    val streamingSec = famSum(_.startsWith("stream_"))
    val analyticSec = total - streamingSec
    val qsNorm = results.map { case (k, v) =>
      "\"" + k + "\":" + f3(if (v >= 0) v / hostFactor else v)
    }.mkString("{", ",", "}")
    // Twin-comparison footnote (VERDICT r8 #6), emitted with the data so a
    // reader of BENCH_rN alone cannot misread the indexed-vs-in-memory
    // rows: the in-memory dedup twins consume frames PERSISTED during the
    // untimed warmup (their steady-state at test scale — a luxury 100 TB
    // removes), while their *_indexed twins re-run the consume join from
    // the stored bucketed table on every call (their steady-state at any
    // scale). The rows are each honest for their own architecture but are
    // NOT a like-for-like pair; BASELINE.md's round-8 profile records the
    // leveled comparison (indexed simhash beats its twin outright; indexed
    // minhash 0.26-0.35 s vs a 0.12 s cache read).
    // ASCII only: println encodes with the JVM default charset, and a
    // non-UTF8 locale would turn an em-dash into '?' inside the JSON.
    // The four actual twin PAIRS are named (review finding r9: the first
    // draft listed ops with no *_indexed twin and omitted decontaminate);
    // ngram_jaccard/cluster are persisted-frame consumers without twins.
    val twinNote = "twin pairs (llm_dedup_minhash, llm_dedup_simhash, " +
      "llm_dedup_embedding, llm_decontaminate vs their *_indexed forms) are " +
      "not like-for-like: the in-memory side reads warmup-persisted frames, " +
      "the *_indexed side re-runs its stored-table join per call; " +
      "llm_dedup_ngram_jaccard/llm_dedup_cluster also ride persisted frames " +
      "(no indexed twin); see BASELINE.md r8 profile"
    println(s"""{"metric":"queries","sf":"$sfDir","twin_note":"$twinNote","detail":$qs}""")
    println(s"""{"metric":"queries_normalized","sf":"$sfDir","host_factor":${f3(hostFactor)},"detail":$qsNorm}""")
    println(s"""{"metric":"total","value":${f3(total)},"unit":"sec","n_queries":${results.size},"failed":$nFailed,"streaming_sec":${f3(streamingSec)},"analytic_sec":${f3(analyticSec)},"warmup_sec":${f3(warmupSec)},"calib_sec":${f3(calibSec)},"calib_shuffle_sec":${f3(calibShuffleSec)},"calib_nominal":${f3(calibNominal)},"calib_shuffle_nominal":${f3(calibShuffleNominal)},"calib_abnormal":$calibAbnormal,"total_normalized":${f3(total / hostFactor)},"host_factor":${f3(hostFactor)},"host_shuffle_factor":${f3(hostShuffleFactor)},"sf":"$sfDir"}""")
    spark.stop()
  }
}
