package graft.tables

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loads the driver-generated parquet tables (TESTDATA.md) and stands in
  * for the reference's three catalogs — RDS MySQL, Redshift, and the Glue
  * Data Catalog (reference README.md:9-10,23). In Spark all three collapse
  * into one SparkSession; federation is a same-session join (SURVEY.md §1.4).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // every operator loads its inputs here, so this is the one chokepoint
    // where the session reliably picks up the graft native functions
    graft.functions.GraftFunctions.ensure(spark)
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
      // natively: read the raw nanos as long, truncate to micros in-plan
      // (same truncation DuckDB applies when casting ns→µs). The legacy flag
      // is only needed while the relation's schema is resolved (the eager
      // part of read.parquet), so restore it immediately — leaving it set
      // would silently change how OTHER ns-timestamp parquet reads behave
      // for the rest of the session.
      // synchronized: the set/restore races if two threads resolve reads on
      // the same session concurrently (conf is session-global mutable state)
      this.synchronized {
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        try spark.read.parquet(s"$sfDir/$name.parquet")
          .withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
        finally prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
      }
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every table as a temp view (Glue-Data-Catalog analog). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => apply(spark, sfDir, n).createOrReplaceTempView(n))
}
