package graft.tools

import org.apache.spark.sql.SparkSession

/** Cross-JVM catalog persistence (VERDICT r14 queue #6) — the full Glue
  * Data Catalog analog (reference README.md:10,78-83): the crawler
  * registers an inferred schema ONCE in a PERSISTENT metastore and every
  * later engine process queries the table by name with no re-registration.
  *
  * `scan_catalog_second_session` (etl/Ingest.scala) proves the
  * session-boundary half inside one JVM (newSession = own temp-view
  * namespace + analyzer, shared external catalog); this tool proves the
  * PROCESS boundary: `write` registers the external table in a
  * Derby-backed Hive metastore and exits; `read` is a brand-new JVM that
  * resolves the table by NAME ALONE from the same metastore dir and runs
  * the consumer aggregate. CatalogPersistSpec forks both modes as real
  * child processes and checks the read-side result against the same
  * aggregate computed directly over the parquet.
  *
  * At scale this is exactly the Hive-metastore/Glue deployment shape: the
  * metastore URI is cluster config, table registration is a one-time
  * crawler/DDL step, and every Spark job resolves schemas by name. The
  * local spelling swaps the metastore RDBMS for embedded Derby — same
  * catalog code path (HiveExternalCatalog), different JDBC URL. */
object CatalogPersist {

  /** Table data lives at the read-only driver parquet; the metastore and
    * warehouse live under baseDir (caller-owned scratch). */
  def main(args: Array[String]): Unit = args.toSeq match {
    case Seq("write", sfDir, baseDir) =>
      val spark = session(baseDir)
      try {
        spark.sql("DROP TABLE IF EXISTS cat_orders_persist")
        // USING PARQUET + LOCATION = external datasource table: schema
        // inferred once at DDL time and stored in the metastore; DROP
        // never touches the read-only data files.
        spark.sql(
          s"""CREATE TABLE cat_orders_persist
             |USING PARQUET LOCATION '$sfDir/orders.parquet'""".stripMargin)
        // prove the registration is queryable before declaring success
        val n = spark.sql("SELECT count(*) FROM cat_orders_persist")
          .head().getLong(0)
        println(s"[catalog-persist] registered cat_orders_persist ($n rows)")
      } finally spark.stop()
    case Seq("read", baseDir, outFile) =>
      val spark = session(baseDir)
      try {
        // name-only resolution: no paths, no registration, no temp views —
        // the schema comes from the metastore written by the OTHER process
        val rows = spark.sql(
          s"""SELECT o_orderstatus, count(*) AS n_orders,
             |  round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double), 2) AS revenue
             |FROM cat_orders_persist
             |GROUP BY 1 ORDER BY 1""".stripMargin)
          .collect()
          .map(r => s"${r.getString(0)},${r.getLong(1)},${r.getDouble(2)}")
        java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
          rows.mkString("\n").getBytes("UTF-8"))
        println(s"[catalog-persist] read ${rows.length} groups by name only")
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
