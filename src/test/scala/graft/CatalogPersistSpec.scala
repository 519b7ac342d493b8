package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Cross-JVM catalog persistence (VERDICT r14 queue #6): forks
  * CatalogPersist's write and read modes as two REAL child JVM processes
  * sharing only a Derby-backed Hive metastore directory — the table
  * registered by the first process must resolve by name alone in the
  * second, surviving the process restart the in-JVM
  * `scan_catalog_second_session` op cannot cross. The read-side aggregate
  * is checked against the same aggregate computed directly over the
  * parquet in THIS process. */
class CatalogPersistSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private def forkCatalogPersist(args: Seq[String]): String = {
    val javaBin = System.getProperty("java.home") + "/bin/java"
    // inherit this (forked, add-opens-equipped) test JVM's module flags —
    // Spark 4 on JDK 17 dies without them when launched outside
    // spark-submit
    val jvmArgs = java.lang.management.ManagementFactory.getRuntimeMXBean
      .getInputArguments.asScala
      .filter(a => a == "--add-opens" || a.endsWith("=ALL-UNNAMED"))
    val cmd = Seq(javaBin) ++ jvmArgs ++ Seq(
      "-Xmx4g", "-Dspark.ui.enabled=false",
      "-Dspark.sql.session.timeZone=UTC",
      "-cp", System.getProperty("java.class.path"),
      "graft.tools.CatalogPersist") ++ args
    val p = new ProcessBuilder(cmd.asJava).redirectErrorStream(true).start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    val rc = p.waitFor()
    assert(rc == 0,
      s"CatalogPersist ${args.head} exited $rc:\n${out.takeRight(3000)}")
    out
  }

  test("full lake registered by one JVM resolves by name in a fresh JVM: " +
      "tables, partitioned table via metastore, persistent view") {
    val base = graft.util.Scratch.dir("catalog_persist")
    val outFile = s"$base/read_result.csv"
    val wOut = forkCatalogPersist(Seq("write", sfDir, base))
    assert(wOut.contains("registered 9 tables") &&
      wOut.contains("view sales_by_category_persist"), wOut.takeRight(500))
    // metastore_db must exist on disk between the two processes — the
    // artifact that IS the persistence
    assert(new java.io.File(s"$base/metastore_db").isDirectory,
      "no metastore directory written")
    val rOut = forkCatalogPersist(Seq("read", base, outFile))
    assert(rOut.contains("catalog facts by name only"), rOut.takeRight(500))
    val got = scala.io.Source.fromFile(outFile, "UTF-8").mkString.trim
      .split("\n").toSeq

    // expected: every fact recomputed straight off the parquet, this process
    import org.apache.spark.sql.functions._
    val rawTables = Seq("region", "nation", "customer", "supplier",
      "part", "orders", "lineitem", "documents", "embeddings")
    val exp = scala.collection.mutable.ArrayBuffer.empty[String]
    rawTables.foreach { t =>
      exp += s"table,$t,${graft.tables.Tables(spark, sfDir, t).count()}"
    }
    val sales = graft.tables.Tables(spark, sfDir, "lineitem")
      .join(graft.tables.Tables(spark, sfDir, "part"),
        col("l_partkey") === col("p_partkey"))
      .join(graft.tables.Tables(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("p_type"), year(col("o_orderdate")).as("o_year"))
      .agg(count(lit(1)).as("sold_cnt"))
    val v = sales.agg(count(lit(1)), sum(col("sold_cnt"))).head()
    exp += s"view,sales_by_category,${v.getLong(0)},${v.getLong(1)}"
    val ev = graft.tables.Tables(spark, sfDir, "events")
      .select(year(col("ts")).as("y"), month(col("ts")).as("m"))
    val partsDf = ev.distinct().collect()
      .map(r => (r.getInt(0), r.getInt(1))).sorted
    // SHOW PARTITIONS specs sort lexicographically (month=10 < month=2);
    // replicate that ordering for the pruned-partition pick
    val specs = partsDf.map { case (y, m) => (s"year=$y/month=$m", y, m) }
      .sortBy(_._1)
    exp += s"partitions,${specs.length}"
    val (_, py, pm) = specs.head
    val pruned = ev.filter(col("y") === py && col("m") === pm).count()
    exp += s"pruned,$py,$pm,$pruned"
    graft.tables.Tables(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"))
      .orderBy("o_orderstatus")
      .collect()
      .foreach(r => exp += s"orders_agg,${r.getString(0)},${r.getLong(1)},${r.getDouble(2)}")

    assert(got == exp.toSeq,
      s"cross-JVM catalog read diverges from direct parquet facts:\n" +
        s" got=${got.mkString(" | ")}\n exp=${exp.mkString(" | ")}")
  }
}
