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

  test("catalog table registered by one JVM resolves by name in a fresh JVM") {
    val base = graft.util.Scratch.dir("catalog_persist")
    val outFile = s"$base/read_result.csv"
    val wOut = forkCatalogPersist(Seq("write", sfDir, base))
    assert(wOut.contains("registered cat_orders_persist"), wOut.takeRight(500))
    // metastore_db must exist on disk between the two processes — the
    // artifact that IS the persistence
    assert(new java.io.File(s"$base/metastore_db").isDirectory,
      "no metastore directory written")
    val rOut = forkCatalogPersist(Seq("read", base, outFile))
    assert(rOut.contains("read") && rOut.contains("by name only"),
      rOut.takeRight(500))
    val got = scala.io.Source.fromFile(outFile, "UTF-8").mkString.trim
      .split("\n").toSeq
    // expected: the same aggregate straight off the parquet, this process
    import org.apache.spark.sql.functions._
    val expected = graft.tables.Tables(spark, sfDir, "orders")
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,4)")).cast("double"), 2)
          .as("revenue"))
      .orderBy("o_orderstatus")
      .collect()
      .map(r => s"${r.getString(0)},${r.getLong(1)},${r.getDouble(2)}")
      .toSeq
    assert(got == expected,
      s"cross-JVM read diverges from direct parquet aggregate:\n got=$got\n exp=$expected")
  }
}
