package graft.llm

import org.apache.spark.sql.functions._
import graft.QFn
import graft.tables.Tables

/** SURVEY.md §2.10 extension — corpus sampling for training-data mixes.
  * Rebalancing a multilingual corpus ("cap en at 25%, keep all zh") is a
  * per-stratum Bernoulli sample; at 100 TB it must be a stateless per-row
  * decision — no counters, no shuffle, reproducible across retries. The
  * hash-threshold rule here gives exactly that: keep iff
  * (doc_id mod 100) < quota(lang). The quota map is shared between the
  * plan and the DuckDB oracle (the TextOps.markerWords pattern).
  */
object SampleOps {

  /** Percent quota per language stratum. */
  val quotas: Seq[(String, Int)] =
    Seq("en" -> 25, "de" -> 50, "es" -> 50, "fr" -> 75, "zh" -> 100)

  /** Stratified sample: deterministic per-language downsampling. Output is
    * the surviving rows plus their stratum quota, so the oracle hash pins
    * the exact membership, not just counts. */
  val llmSampleStratified: QFn = (spark, sfDir) => {
    val quota = quotas.tail.foldLeft(
      when(col("lang") === quotas.head._1, quotas.head._2)) {
      case (acc, (l, q)) => acc.when(col("lang") === l, q)
    }.otherwise(0)
    Tables(spark, sfDir, "documents")
      .withColumn("quota_pct", quota)
      .filter(pmod(col("doc_id"), lit(100)) < col("quota_pct"))
      .select("doc_id", "lang", "quota_pct", "n_chars")
      .orderBy("doc_id")
  }

  /** Temperature-rebalanced source mixing (the data-mix pass of a training
    * pipeline): per-source share p_s is flattened to p_s^(1/T) (T=2 →
    * sqrt), renormalized, and converted to a keep-rate against a corpus
    * budget of half the docs — over-represented sources are downsampled
    * hardest, tiny sources kept whole. The per-row decision stays a
    * stateless hash threshold (reproducible, shuffle-free); the per-source
    * rates come from ONE tiny aggregate (n_sources rows) broadcast back —
    * at 100 TB that is a metadata-sized join, the corpus is still scanned
    * once. Integer thresholds (floor(r·10000 + 0.5)) keep the borderline
    * comparison integral on both engines. */
  val llmSampleTemperature: QFn = (spark, sfDir) => {
    val d = Tables(spark, sfDir, "documents")
    val bySource = d.groupBy("source").agg(count(lit(1)).as("n_docs"))
    val withW = bySource.withColumn("w", sqrt(col("n_docs").cast("double")))
    val tot = withW.agg(sum(col("n_docs")).as("n_total"), sum(col("w")).as("w_total"))
    val rates = withW.crossJoin(broadcast(tot))
      .withColumn("keep_rate",
        least(lit(1.0), (col("w") / col("w_total")) * (col("n_total") * 0.5) / col("n_docs")))
      .withColumn("thr", floor(col("keep_rate") * 10000 + 0.5).cast("int"))
      .select("source", "n_docs", "thr")
    // doc_id is folded mod 1000003 BEFORE the LCG multiply: an unguarded
    // doc_id * 1103515245 overflows Long for 64-bit ids >= ~8.4e9 (a 100 TB
    // corpus scale), and Spark 4's ANSI mode turns that into a job-killing
    // error. 1e6 * 1.1e9 stays far inside Long range on both engines.
    d.join(broadcast(rates), Seq("source"))
      .filter(pmod(pmod(col("doc_id"), lit(1000003L)) * 1103515245L + 12345L,
        lit(10000)) < col("thr"))
      .groupBy("source")
      .agg(max(col("n_docs")).as("n_docs"), count(lit(1)).as("n_kept"),
        max(col("thr")).as("thr"))
      .orderBy("source")
  }

  /** Deterministic train/val/test split (90/5/5) — the assignment every
    * training pipeline makes exactly once and must never change: a Lehmer
    * mix of doc_id (multiplier 16807, deliberately DIFFERENT from
    * llm_shuffle_shards' 48271 so split membership is uncorrelated with
    * shuffle order) buckets each doc into [0,100); bucket ranges become
    * split labels. Stateless per-row arithmetic — no shuffle, no sampling
    * state, identical on every retry and every engine; eval membership is
    * a pure function of doc_id, which is what makes downstream
    * decontamination auditable. The doc_id mod-fold before the multiply is
    * the same ANSI-overflow guard as sample_temperature. */
  val llmTrainTestSplit: QFn = (spark, sfDir) => {
    val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * 16807L,
      lit(2147483647L)) % 100
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), bucket.cast("int").as("bucket"),
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
          .as("split"))
      .orderBy("doc_id")
  }

  /** Exact-k uniform sample — "give me exactly 200 docs, uniformly,
    * reproducibly": rank by a Lehmer hash of doc_id and keep the k
    * smallest. Rate-based sampling (stratified/temperature) yields a
    * BINOMIAL size; pipelines that need a fixed eval-set or
    * annotation-batch size need top-k-by-hash instead. Spark plans the
    * limit as TakeOrderedAndProject: each partition keeps its local top-k
    * and only k rows per partition reach the driver-side merge — a
    * reservoir sample in disguise, never a global sort of the corpus. */
  val SampleK = 200

  val llmSampleExactK: QFn = (spark, sfDir) => {
    val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 69621L,
      lit(2147483647L))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), h.as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(SampleK)
  }

  /** WEIGHTED exact-k sample without replacement (Efraimidis–Spirakis
    * A-ES): each row draws priority key −ln(u)/w and the k SMALLEST keys
    * win — inclusion probability proportional to weight w, here n_chars
    * (the "sample by content volume" policy a token-budgeted eval set or
    * annotation batch wants: a 500-char doc is ~10× likelier than a
    * 50-char one, without any per-group bookkeeping). u comes from the
    * same deterministic Lehmer machinery as the uniform sampler
    * (multiplier 45991 — fresh, so weighted membership is uncorrelated
    * with every other sampling/split hash; +1 keeps u in (0,1] so ln
    * never sees 0). The plan is the identical distributed reservoir:
    * TakeOrderedAndProject keeps a local top-k per partition, only
    * k·partitions rows ever move — the ONE scan + no shuffle shape a
    * 100 TB weighted sample requires. The key is ROUNDED to 9 decimals
    * before ranking on BOTH sides of the oracle so the selection can
    * never hinge on a last-ulp ln() disagreement between engines (values
    * sit in [1e-12, 0.5]; a 1-ulp ~1e-16-relative wobble cannot cross a
    * 1e-9 rounding boundary except on exact hits that the fixed corpus
    * is verified not to contain); rounded-key ties break on doc_id. */
  val llmSampleWeightedK: QFn = (spark, sfDir) => {
    val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 45991L,
      lit(2147483647L))
    val u = (h + lit(1L)).cast("double") / lit(2147483648.0)
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        round(-log(u) / col("n_chars"), 9).as("key"))
      .orderBy(col("key"), col("doc_id"))
      .limit(SampleK)
  }

  /** Target-driven domain mixture (the DoReMi/Pile-style "web 40%, books
    * 30%, code 30%" rebalance, by chars as the token proxy): given a target
    * weight per source, find the LARGEST corpus whose source shares match
    * the targets with every keep-rate ≤ 1, then keep-sample each source at
    * its rate. The math collapses to one quantity per source,
    * q_s = chars_s / weight_s: the binding source is argmin q (kept whole,
    * rate exactly 1.0 by construction — same-double division), every other
    * source keeps qmin/q_s of its chars. Differs from
    * `llm_sample_temperature` in direction: temperature DERIVES the mix
    * from the data; this ENFORCES an external policy. Plan shape is the
    * same metadata-sized pattern — per-source aggregate (tiny), min as a
    * broadcast scalar, rates broadcast-joined back, corpus scanned once
    * with a stateless hash-threshold decision per row. Target weights are
    * a FORMULA of the source name ((idx % 4) + 1) shared with the oracle
    * SQL, the markerWords pattern. */
  val llmDomainMixture: QFn = (spark, sfDir) => {
    val tgtOf = (s: org.apache.spark.sql.Column) =>
      (substring(s, 4, 10).cast("int") % 4 + 1)
    val d = Tables(spark, sfDir, "documents")
    val q = d.groupBy("source").agg(sum(col("n_chars")).as("chars"))
      .withColumn("q",
        col("chars").cast("double") / tgtOf(col("source")).cast("double"))
    val qmin = q.agg(min(col("q")).as("qmin"))
    val rates = q.crossJoin(broadcast(qmin))
      .select(col("source"),
        floor(least(lit(1.0), col("qmin") / col("q")) * 10000 + 0.5)
          .cast("int").as("thr"))
    d.join(broadcast(rates), Seq("source"))
      // fresh Lehmer multiplier (40692) so mixture membership is
      // uncorrelated with the split/shard/sample hashes; same mod-fold
      // ANSI-overflow guard as the other sampling ops
      .filter(pmod(pmod(pmod(col("doc_id"), lit(1000003L)) * 40692L,
        lit(2147483647L)), lit(10000L)) < col("thr"))
      .groupBy("source")
      .agg(max(tgtOf(col("source"))).as("tgt_w"), max(col("thr")).as("thr"),
        count(lit(1)).as("n_kept"), sum(col("n_chars")).as("kept_chars"))
      .orderBy("source")
  }

  /** Exact-k PER-STRATUM sample — the eval-set builder's contract ("20
    * docs per language, uniformly, reproducibly"): rate-based stratified
    * sampling gives binomial per-stratum sizes and a global exact-k gives
    * no per-stratum guarantee; this op ranks by a Lehmer hash WITHIN each
    * language and keeps the k smallest. The rank-filter idiom plans as
    * TWO WindowGroupLimits (the window_topn_per_group shape): each map
    * task keeps its local top-k per language BEFORE the exchange, so the
    * shuffle carries ≤ k rows per (task, stratum) — per-stratum
    * reservoir sampling as a plan property, linear at 100 TB. Multiplier
    * 39373 (a classic Lehmer alternative) is decorrelated from every
    * other sampling hash in this module, so stratum-sample membership is
    * independent of split/shard/mixture membership; same mod-fold
    * ANSI-overflow guard as the rest. */
  val PerGroupK = 20

  val llmSamplePerGroupK: QFn = (spark, sfDir) => {
    import org.apache.spark.sql.expressions.Window
    val h = pmod(pmod(col("doc_id"), lit(1000003L)) * 39373L,
      lit(2147483647L))
    val w = Window.partitionBy("lang").orderBy(col("h"), col("doc_id"))
    Tables(spark, sfDir, "documents")
      .select(col("doc_id"), col("lang"), h.as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= PerGroupK)
      .orderBy("lang", "rk")
  }

  /** Leakage-safe train/val/test split — the hash split with the eval
    * contamination rule applied: any val/test document with an
    * exact-verified near-dup (5-gram Jaccard ≥ 0.5, the corpus's
    * verified-pair graph) in TRAIN is reassigned to train, because an
    * eval set containing near-copies of training docs inflates every
    * metric it was built to measure. Composition, not new machinery:
    * the split rule is [[llmTrainTestSplit]]'s Lehmer gate verbatim and
    * the pair graph is the shared [[DedupOps.verifiedPairs]] (built once
    * per corpus, reused by jaccard/cluster/pipeline) — the reassignment
    * itself is one semi-join against train partners, linear in the pair
    * count at any corpus size. Full DuckDB oracle: split CASE + the
    * jaccard-pair CTE replayed on raw substrings. */
  val llmSplitDecontaminated: QFn = (spark, sfDir) => {
    val bucket = pmod(pmod(col("doc_id"), lit(1000003L)) * 16807L,
      lit(2147483647L)) % 100
    val split = Tables(spark, sfDir, "documents")
      .select(col("doc_id"),
        when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test")
          .as("split"))
    val pairs = DedupOps.verifiedPairs(spark, sfDir)
    val edges = pairs.select(col("doc_a").as("doc_id"), col("doc_b").as("p"))
      .unionByName(pairs.select(col("doc_b").as("doc_id"), col("doc_a").as("p")))
    val trainPartners = edges
      .join(split.filter(col("split") === "train")
        .select(col("doc_id").as("p")), Seq("p"), "left_semi")
      .select("doc_id").distinct()
      .withColumn("leaky", lit(1))
    split.join(trainPartners, Seq("doc_id"), "left")
      .select(col("doc_id"), col("split"),
        when(col("split") =!= "train" && col("leaky") === 1, "train")
          .otherwise(col("split")).as("final_split"))
      .orderBy("doc_id")
  }

  val queries: Map[String, QFn] = Map(
    "llm_split_decontaminated" -> llmSplitDecontaminated,
    "llm_sample_per_group_k" -> llmSamplePerGroupK,
    "llm_domain_mixture" -> llmDomainMixture,
    "llm_sample_stratified" -> llmSampleStratified,
    "llm_sample_temperature" -> llmSampleTemperature,
    "llm_train_test_split" -> llmTrainTestSplit,
    "llm_sample_exact_k" -> llmSampleExactK,
    "llm_sample_weighted_k" -> llmSampleWeightedK,
  )

  private def quotaCaseSql: String =
    "CASE lang " + quotas.map { case (l, q) => s"WHEN '$l' THEN $q" }
      .mkString(" ") + " ELSE 0 END"

  val oracleSql: Map[String, String] = Map(
    "llm_sample_per_group_k" ->
      (s"SELECT doc_id, lang, ((doc_id % 1000003) * 39373) % 2147483647 AS h, " +
        "CAST(row_number() OVER (PARTITION BY lang " +
        "ORDER BY ((doc_id % 1000003) * 39373) % 2147483647, doc_id) AS INT) AS rk " +
        s"FROM documents QUALIFY rk <= $PerGroupK ORDER BY lang, rk"),
    "llm_domain_mixture" ->
      ("WITH s AS (SELECT source, sum(n_chars) AS chars FROM documents GROUP BY 1), " +
        "q AS (SELECT source, CAST(chars AS DOUBLE) / " +
        "CAST((CAST(substr(source, 4) AS INT) % 4) + 1 AS DOUBLE) AS q FROM s), " +
        "m AS (SELECT min(q) AS qmin FROM q), " +
        "r AS (SELECT source, CAST(floor(least(1.0, qmin / q) * 10000 + 0.5) AS INT) AS thr " +
        "FROM q, m) " +
        "SELECT d.source, CAST(max((CAST(substr(d.source, 4) AS INT) % 4) + 1) AS INT) AS tgt_w, " +
        "max(r.thr) AS thr, count(*) AS n_kept, CAST(sum(d.n_chars) AS BIGINT) AS kept_chars " +
        "FROM documents d JOIN r USING (source) " +
        "WHERE ((d.doc_id % 1000003) * 40692) % 2147483647 % 10000 < r.thr " +
        "GROUP BY d.source ORDER BY d.source"),
    "llm_sample_stratified" ->
      (s"SELECT doc_id, lang, CAST($quotaCaseSql AS INT) AS quota_pct, n_chars " +
        s"FROM documents WHERE doc_id % 100 < $quotaCaseSql ORDER BY doc_id"),
    "llm_sample_temperature" ->
      ("WITH s AS (SELECT source, count(*) AS n_docs, sqrt(count(*)) AS w " +
        "FROM documents GROUP BY source), " +
        "t AS (SELECT sum(n_docs) AS n_total, sum(w) AS w_total FROM s), " +
        "r AS (SELECT source, n_docs, CAST(floor(least(1.0, " +
        "(w / w_total) * (n_total * 0.5) / n_docs) * 10000 + 0.5) AS INT) AS thr " +
        "FROM s, t) " +
        "SELECT d.source, max(r.n_docs) AS n_docs, count(*) AS n_kept, " +
        "max(r.thr) AS thr FROM documents d JOIN r ON d.source = r.source " +
        "WHERE ((d.doc_id % 1000003) * 1103515245 + 12345) % 10000 < r.thr " +
        "GROUP BY d.source ORDER BY d.source"),
    "llm_split_decontaminated" ->
      ("WITH s AS (SELECT doc_id, CASE WHEN ((doc_id % 1000003) * 16807) % 2147483647 % 100 < 90 THEN 'train' " +
        "WHEN ((doc_id % 1000003) * 16807) % 2147483647 % 100 < 95 THEN 'val' ELSE 'test' END AS split " +
        "FROM documents), " +
        "d AS (SELECT doc_id, lower(trim(text)) AS t FROM documents), " +
        "g AS (SELECT DISTINCT doc_id, substr(t, CAST(i AS BIGINT), 5) AS gram " +
        "FROM d, unnest(range(1, greatest(length(t) - 4, 1) + 1)) AS u(i)), " +
        "n AS (SELECT doc_id, count(*) AS n_sh FROM g GROUP BY doc_id), " +
        "c AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i " +
        "FROM g a JOIN g b ON a.gram = b.gram AND a.doc_id < b.doc_id GROUP BY 1, 2), " +
        "pr AS (SELECT doc_a, doc_b FROM c JOIN n na ON na.doc_id = doc_a " +
        "JOIN n nb ON nb.doc_id = doc_b " +
        "WHERE ROUND(CAST(i AS DOUBLE) / (na.n_sh + nb.n_sh - i), 4) >= 0.5), " +
        "e AS (SELECT doc_a AS doc_id, doc_b AS p FROM pr " +
        "UNION ALL SELECT doc_b, doc_a FROM pr), " +
        "leaky AS (SELECT DISTINCT e.doc_id FROM e " +
        "JOIN s ts ON e.p = ts.doc_id AND ts.split = 'train') " +
        "SELECT s.doc_id, s.split, " +
        "CASE WHEN s.split <> 'train' AND s.doc_id IN (SELECT doc_id FROM leaky) " +
        "THEN 'train' ELSE s.split END AS final_split " +
        "FROM s ORDER BY s.doc_id"),
    "llm_train_test_split" ->
      ("SELECT doc_id, CAST(((doc_id % 1000003) * 16807) % 2147483647 % 100 AS INT) AS bucket, " +
        "CASE WHEN ((doc_id % 1000003) * 16807) % 2147483647 % 100 < 90 THEN 'train' " +
        "WHEN ((doc_id % 1000003) * 16807) % 2147483647 % 100 < 95 THEN 'val' " +
        "ELSE 'test' END AS split FROM documents ORDER BY doc_id"),
    "llm_sample_exact_k" ->
      (s"SELECT doc_id, lang, source, ((doc_id % 1000003) * 69621) % 2147483647 AS h " +
        s"FROM documents ORDER BY h, doc_id LIMIT $SampleK"),
    "llm_sample_weighted_k" ->
      (s"SELECT doc_id, lang, source, n_chars, " +
        "ROUND(-ln((((doc_id % 1000003) * 45991) % 2147483647 + 1) " +
        "/ 2147483648.0) / n_chars, 9) AS key " +
        s"FROM documents ORDER BY key, doc_id LIMIT $SampleK"),
  )
}
