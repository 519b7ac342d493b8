package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off tuning harness for the IVF coarse quantizer (not a test):
  * measures mean recall@20 vs exact cosine over 50 queries for
  * (normalize, nlist, nprobe) configs, plus the scanned-corpus fraction.
  * Run: sbt "Test/runMain graft.IvfTune"
  */
object IvfTune {
  /** PREFIX of the cosine-ranked cell list whose cumulative occupancy
    * stays <= frac*n (>= 1 cell) — the shape a window cumsum filter
    * expresses in a DataFrame plan (cumsum is monotone, so the filter
    * keeps a prefix; no skip-the-big-cell cherry-picking). */
  private[graft] def cumPolicy(frac: Double, cellSizes: Map[Int, Long], n: Long)
      : Seq[(Int, Double)] => Seq[Int] = ranked => {
    val budget = frac * n
    var cum = 0L
    val out = Seq.newBuilder[Int]
    var taken = 0
    var stopped = false
    for ((c, _) <- ranked if !stopped) {
      val sz = cellSizes.getOrElse(c, 0L)
      if (taken == 0 || cum + sz <= budget) { out += c; cum += sz; taken += 1 }
      else stopped = true
    }
    out.result()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector

    val e = graft.tables.Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), expr("cast(embedding as array<double>)").as("emb"))
      .withColumn("norm", sqrt(expr("aggregate(zip_with(emb, emb, (x,y) -> x*y), cast(0 as double), (a,v) -> a+v)")))
      .withColumn("unit", expr("transform(emb, x -> x / norm)"))
      .persist()
    val n = e.count()
    val nq = 50

    // exact top-20 per query (brute force, queries = vec_id < nq)
    val q = e.filter(col("vec_id") < nq)
      .select(col("vec_id").as("qid"), col("emb").as("qv"), col("norm").as("qnorm"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (expr("aggregate(zip_with(emb, qv, (x,y) -> x*y), cast(0 as double), (a,v) -> a+v)") /
          (col("norm") * col("qnorm"))).as("sim"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 20)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).map { case (k, v) => k -> v.map(_.getLong(1)).toSet }

    for (useUnit <- Seq(false, true); nlist <- Seq(64, 128)) {
      val fcol = if (useUnit) "unit" else "emb"
      val fitted = new KMeans().setK(nlist).setSeed(42).setMaxIter(10)
        .setFeaturesCol("fv").setPredictionCol("cell")
        .fit(e.withColumn("fv", array_to_vector(col(fcol))))
      val assigned = fitted.transform(e.withColumn("fv", array_to_vector(col(fcol))))
        .select("vec_id", "emb", "norm", "cell").persist()
      assigned.count()
      val centers = fitted.clusterCenters.map(_.toArray)
      val cellSizes = assigned.groupBy("cell").count().collect()
        .map(r => r.getInt(0) -> r.getLong(1)).toMap
      // per query: rank cells by cosine(query, centroid), probe top-p
      val qs = e.filter(col("vec_id") < nq).select("vec_id", "emb").collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      // Probe policies under comparison (round 9, VERDICT r8 #5):
      //  fixed-<p>: top-p cells by centroid cosine (the shipped r7 policy)
      //  cum-<f>:   cosine-ranked cells taken while the CUMULATIVE row
      //             count stays <= f*n (>= 1 cell) — occupancy-aware, so
      //             the scan budget is spent on many small centroid-close
      //             cells instead of cut off mid-list by populous ones
      val fixedP = math.round(nlist * 0.4375).toInt
      val policies: Seq[(String, Seq[(Int, Double)] => Seq[Int])] = Seq(
        s"fixed-$fixedP" -> ((ranked: Seq[(Int, Double)]) => ranked.take(fixedP).map(_._1)),
        "cum-0.40" -> cumPolicy(0.40, cellSizes, n),
        "cum-0.35" -> cumPolicy(0.35, cellSizes, n))
      for ((pname, pick) <- policies) {
        var recallSum = 0.0; var scannedSum = 0.0; var cellsSum = 0
        for ((qid, qv) <- qs) {
          val qn = math.sqrt(qv.map(x => x * x).sum)
          val rankedAll = centers.zipWithIndex.map { case (c, i) =>
            val dot = c.zip(qv).map { case (a, b) => a * b }.sum
            val cn = math.sqrt(c.map(x => x * x).sum)
            (i, dot / (cn * qn))
          }.sortBy { case (i, s) => (-s, i) }.toSeq
          val rankedSet = pick(rankedAll).toSet
          val scanned = rankedSet.toSeq.map(c => cellSizes.getOrElse(c, 0L)).sum
          cellsSum += rankedSet.size
          val got = assigned.filter(col("cell").isin(rankedSet.toSeq: _*) && col("vec_id") =!= qid)
            .crossJoin(broadcast(e.filter(col("vec_id") === qid)
              .select(col("emb").as("qv"), col("norm").as("qnorm"))))
            .select(col("vec_id"),
              (expr("aggregate(zip_with(emb, qv, (x,y) -> x*y), cast(0 as double), (a,v) -> a+v)") /
                (col("norm") * col("qnorm"))).as("sim"))
            .orderBy(col("sim").desc, col("vec_id")).limit(20)
            .collect().map(_.getLong(0)).toSet
          recallSum += got.intersect(exact(qid)).size / 20.0
          scannedSum += scanned.toDouble / n
        }
        println(f"RESULT unit=$useUnit nlist=$nlist policy=$pname recall=${recallSum / qs.length}%.3f scanned=${scannedSum / qs.length}%.3f cells=${cellsSum.toDouble / qs.length}%.1f")
      }
      assigned.unpersist()
    }
    spark.stop()
  }
}
