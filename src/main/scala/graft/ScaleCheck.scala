package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.tables.Tables

/** Empirical no-n² evidence for the dedup pipeline: replicate the sf0.1
  * documents corpus ×1/×2/×4 and time index build + each dedup operator at
  * every scale. If candidate generation were pairwise, ×4 data would cost
  * ×16 — the table this prints (recorded in BASELINE.md) shows whether
  * growth stays ~linear.
  *
  * Replica r > 0 gets doc_id + r·10⁷ and a per-replica alphabet rotation
  * (translate), so cross-replica texts share no 5-gram shingles: the
  * near-dup pair structure grows linearly with scale, as in a real corpus
  * growing by new content — NOT quadratically as naive duplication of
  * identical texts would force regardless of algorithm.
  */
object ScaleCheck {
  private val Alpha = "abcdefghijklmnopqrstuvwxyz"

  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // JVM/codegen warmup (untimed): run the whole pipeline once on the base
    // corpus, then drop its indexes — otherwise scale-1 absorbs the one-time
    // JIT/codegen cost of the HOF-heavy expressions and growth between
    // scales is not attributable to data size.
    graft.llm.DedupOps.llmDedupMinhash(spark, base).count()
    graft.llm.DedupOps.llmDedupNgramJaccard(spark, base).count()
    graft.llm.DedupOps.llmDedupCluster(spark, base).count()
    graft.llm.DedupOps.llmDecontaminate(spark, base).count()
    graft.llm.DedupOps.clearCaches()

    val ops: Seq[(String, QFn)] = Seq(
      "minhash" -> graft.llm.DedupOps.llmDedupMinhash,
      "ngram_jaccard" -> graft.llm.DedupOps.llmDedupNgramJaccard,
      "cluster" -> graft.llm.DedupOps.llmDedupCluster,
      "decontaminate" -> graft.llm.DedupOps.llmDecontaminate,
    )

    Seq(1, 2, 4, 8).foreach { scale =>
      val dir =
        if (scale == 1) base
        else {
          val d = graft.util.Scratch.dir(s"scale_x$scale")
          val docs = spark.read.parquet(s"$base/documents.parquet")
          (0 until scale).map { r =>
            val rot = Alpha.drop(r % 26) + Alpha.take(r % 26)
            docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
              .withColumn("text", translate(col("text"), Alpha, rot))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$d/documents.parquet")
          d
        }
      val tIndex = time {
        graft.llm.DedupOps.sigIndex(spark, dir).count()
        graft.llm.DedupOps.minhashCandidates(spark, dir).count()
      }
      // fn(...) must sit INSIDE the timed block: cluster's convergence loop
      // executes eagerly when the query is constructed, not at count()
      val timed = ops.map { case (name, fn) =>
        name -> time(fn(spark, dir).count())
      }
      def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      println(s"""{"metric":"scale_check","scale":$scale,"index_sec":${f2(tIndex)},""" +
        timed.map { case (n, t) => s""""${n}_sec":${f2(t)}""" }.mkString(",") + "}")
      // release this scale's persisted indexes before the next one
      graft.llm.DedupOps.clearCaches()
    }

    // ---- similarity path: the same no-n² evidence for the embedding ops.
    // Replica r gets vec_id + r·10⁷ and its vector rotated by r dimensions
    // — norm-preserving but direction-new, so replicas add new points (as a
    // growing corpus does), not duplicate ones. The knn-join query set
    // (label=0, vec_id<200) lives only in the base replica, so its cost
    // curve isolates per-query corpus-scan growth.
    graft.llm.SimilarityOps.llmSimilarityAnn(spark, base).count()
    graft.llm.SimilarityOps.llmSimilarityKnnJoin(spark, base).count()
    graft.llm.DedupOps.llmDedupEmbedding(spark, base).count()
    graft.llm.DedupOps.clearCaches()
    graft.llm.SimilarityOps.clearCaches()

    Seq(1, 2, 4, 8).foreach { scale =>
      val dir =
        if (scale == 1) base
        else {
          val d = graft.util.Scratch.dir(s"scale_emb_x$scale")
          val emb = spark.read.parquet(s"$base/embeddings.parquet")
          (0 until scale).map { r =>
            val rot = r % 64
            emb.withColumn("vec_id", col("vec_id") + lit(r * 10000000L))
              .withColumn("embedding",
                expr(s"concat(slice(embedding, $rot + 1, 64 - $rot), " +
                  s"slice(embedding, 1, $rot))"))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$d/embeddings.parquet")
          d
        }
      val tIndex = time { graft.llm.DedupOps.embIndex(spark, dir).count() }
      val timed = Seq(
        "dedup_embedding" ->
          time(graft.llm.DedupOps.llmDedupEmbedding(spark, dir).count()),
        "similarity_ann" ->
          time(graft.llm.SimilarityOps.llmSimilarityAnn(spark, dir).count()),
        "knn_join" ->
          time(graft.llm.SimilarityOps.llmSimilarityKnnJoin(spark, dir).count()))
      def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      println(s"""{"metric":"scale_check_sim","scale":$scale,"index_sec":${f2(tIndex)},""" +
        timed.map { case (n, t) => s""""${n}_sec":${f2(t)}""" }.mkString(",") + "}")
      graft.llm.DedupOps.clearCaches()
      graft.llm.SimilarityOps.clearCaches()
    }

    // ---- text path (round 5): chunking, TF-IDF, bigram counts, packing,
    // shard shuffle. All are scan→explode→agg/window shapes with no
    // candidate generation, so the exposure is different: the explode
    // multiplies rows and a missing map-side combine or a global sort
    // would show up here as super-linear growth.
    val textOps: Seq[(String, QFn)] = Seq(
      "chunk" -> graft.llm.TextOps.llmChunkDocuments,
      "tfidf" -> graft.llm.TextOps.llmTfidfTopterms,
      "bigram" -> graft.llm.TextOps.llmBigramCounts,
      "pack" -> graft.llm.TextOps.llmPackSequences,
      "shuffle" -> graft.llm.TextOps.llmShuffleShards,
      // round-5 additions: the unigram LM pays one model build per corpus
      // (persisted index — cleared between scales so each scale pays its
      // own build) and the mixture is a metadata join — both should track
      // corpus size linearly
      "unigram" -> graft.llm.TextOps.llmUnigramLogprob,
      "mixture" -> graft.llm.SampleOps.llmDomainMixture,
    )
    textOps.foreach { case (_, fn) => fn(spark, base).count() } // warmup
    graft.llm.TextOps.clearCaches()

    Seq(1, 2, 4, 8).foreach { scale =>
      val dir =
        if (scale == 1) base
        else {
          val d = graft.util.Scratch.dir(s"scale_text_x$scale")
          val docs = spark.read.parquet(s"$base/documents.parquet")
          (0 until scale).map { r =>
            val rot = Alpha.drop(r % 26) + Alpha.take(r % 26)
            docs.withColumn("doc_id", col("doc_id") + lit(r * 10000000L))
              .withColumn("text", translate(col("text"), Alpha, rot))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$d/documents.parquet")
          d
        }
      val timed = textOps.map { case (name, fn) =>
        name -> time(fn(spark, dir).count())
      }
      def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      println(s"""{"metric":"scale_check_text","scale":$scale,""" +
        timed.map { case (n, t) => s""""${n}_sec":${f2(t)}""" }.mkString(",") + "}")
      graft.llm.TextOps.clearCaches()
    }

    // ---- analytics/window path (round 5): sessionize, z-score, as-of,
    // percent_rank, decile assignment. Replica r shifts event/order AND
    // user/customer ids, so partition COUNT grows with scale while
    // per-partition size stays constant — how a real warehouse grows (more
    // users, same history depth). The exposure here is a window that
    // accidentally single-partitions (xN growth serializing through one
    // task) or a join that degrades to pairwise; healthy shapes grow
    // ~linearly in rows.
    val winOpsEvents: Seq[(String, QFn)] = Seq(
      "sessionize" -> graft.analytics.Temporal.windowSessionize,
      "zscore" -> graft.analytics.Advanced.windowZscoreAnomaly,
      "asof" -> graft.analytics.Temporal.joinAsofPurchase,
      // round-5 additions: the grid-bucketed interval join (sessions × a
      // FIXED promo set — growth must stay linear in sessions, pairwise
      // would be x64 at x8) and two more user-keyed shapes
      "interval_overlap" -> graft.analytics.Temporal.joinIntervalOverlap,
      "gaps_islands" -> graft.analytics.Temporal.windowGapsIslands,
      "mode_frequent" -> graft.analytics.Advanced.aggModeFrequent,
    )
    val winOpsOrders: Seq[(String, QFn)] = Seq(
      "percent_rank" -> graft.analytics.Advanced.windowPercentRank,
      "decile" -> graft.analytics.Advanced.windowNtileDecile,
      // full-outer snapshot diff: one key-partitioned join, linear growth
      "snapshot_diff" -> graft.etl.Upsert.upsertSnapshotDiff,
    )
    (winOpsEvents ++ winOpsOrders).foreach { case (_, fn) => fn(spark, base).count() }

    Seq(1, 2, 4, 8).foreach { scale =>
      val dir =
        if (scale == 1) base
        else {
          val d = graft.util.Scratch.dir(s"scale_win_x$scale")
          val ev = Tables(spark, base, "events")
          (0 until scale).map { r =>
            ev.withColumn("event_id", col("event_id") + lit(r * 10000000L))
              .withColumn("user_id", col("user_id") + lit(r * 1000000L))
          }.reduce(_ unionByName _)
            // back to long nanos so Tables' ns-rewrite applies on re-read
            .withColumn("ts", expr("unix_micros(ts) * 1000"))
            .write.mode("overwrite").parquet(s"$d/events.parquet")
          val o = spark.read.parquet(s"$base/orders.parquet")
          (0 until scale).map { r =>
            o.withColumn("o_orderkey", col("o_orderkey") + lit(r * 10000000L))
              .withColumn("o_custkey", col("o_custkey") + lit(r * 1000000L))
          }.reduce(_ unionByName _)
            .write.mode("overwrite").parquet(s"$d/orders.parquet")
          d
        }
      val timed = (winOpsEvents ++ winOpsOrders).map { case (name, fn) =>
        name -> time(fn(spark, dir).count())
      }
      def f2(v: Double) = "%.2f".formatLocal(java.util.Locale.ROOT, v)
      println(s"""{"metric":"scale_check_window","scale":$scale,""" +
        timed.map { case (n, t) => s""""${n}_sec":${f2(t)}""" }.mkString(",") + "}")
    }
    spark.stop()
  }
}
