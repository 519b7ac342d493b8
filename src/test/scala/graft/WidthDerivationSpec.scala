package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round 6 — the adaptive index widths exist twice by design (Scala for
  * the plan, SQL for the DuckDB oracle); this spec is the anti-drift
  * gate. The SQL chains use only functions Spark and DuckDB share
  * (CASE/greatest/pow with integer-exact operands), so Spark can evaluate
  * the ORACLE's strings over a dense range of corpus sizes and compare
  * them to the Scala derivations the plans use — any future edit that
  * changes one side but not the other fails here, not at the verify gate
  * (where it would only surface for the one n the driver happens to run). */
class WidthDerivationSpec extends AnyFunSuite {
  import SparkFixture.spark

  test("projBitsFor boundary table (integer thresholds, occupancy 8)") {
    val f = graft.llm.DedupOps.projBitsFor _
    assert(f(1) == 4 && f(128) == 4, "floor: n <= 8·2^4 stays at MinProjBits")
    assert(f(129) == 5)
    assert(f(500) == 6, "the verified-tier count must derive the tuned width")
    assert(f(512) == 6 && f(513) == 7, "exact power-of-two boundary")
    assert(f(2000) == 8)
    assert(f(Long.MaxValue) == 24, "cap at MaxProjBits")
  }

  test("probeRadiusFor reproduces the tuned points and tightens with n") {
    val r = graft.llm.SimilarityOps.probeRadiusFor _
    assert(r(6, 500) == 2, "verified tier: radius 2 over 6 bits (22/64 buckets)")
    assert(r(8, 2000) == 1)
    assert(r(9, 4025) == 2, "AnnScaleSpec geometry: 46/512 = 9%")
    assert(r(14, 131072) == 4, "wide indexes afford radius 4 inside 10%")
  }

  test("ivfGeometry derives the measured 128-cell point at n=500 and scales ~sqrt(n)") {
    // round 9: nlist = sqrt(32n) rounded up to a power of two — the
    // measured +0.07-recall-at-equal-scan refinement over sqrt(8n)
    // (BASELINE.md round-9 IVF table); nprobe stays the 43.75% fixed-count
    // reference label (the probe CUTOFF is IvfScanBudget, tested below)
    val g = graft.llm.SimilarityOps.ivfGeometry _
    assert(g(500) == ((128, 56)))
    assert(g(512) == ((128, 56)), "sqrt(32·512) = 128 exactly — no pow2 round-up")
    assert(g(513) == ((256, 112)))
    assert(g(2000) == ((256, 112)))
    assert(g(100000000L)._1 == 4096, "nlist capped by the fit-sample bound")
    assert(graft.llm.SimilarityOps.IvfScanBudget == 0.40,
      "probe row-budget is the measured 40% point")
  }

  test("the oracle's SQL width/radius chains equal the Scala derivations for every n to 131072") {
    // exhaustive to 131072 (the old oracle cap); the next test probes the
    // remaining thresholds of the now-full-depth chain to 2^24
    val pbSql = graft.llm.DedupOps.projBitsSqlDuck("nn")
    val rSql = graft.llm.SimilarityOps.radiusSqlDuck("pb", "nn")
    val rows = spark.range(1, 131073)
      .select(col("id").as("nn"))
      .withColumn("pb", expr(pbSql))
      .withColumn("r", expr(rSql))
      .collect()
    rows.foreach { row =>
      val n = row.getLong(0)
      val pbScala = graft.llm.DedupOps.projBitsFor(n)
      assert(row.getInt(1) == pbScala, s"pb drift at n=$n")
      assert(row.getInt(2) == graft.llm.SimilarityOps.probeRadiusFor(pbScala, n),
        s"radius drift at n=$n")
    }
  }

  test("the SQL chain matches Scala at every remaining threshold up to the 24-bit cap and beyond") {
    // ADVICE r6 #2: the oracle chain now renders to MaxProjBits, so no
    // corpus size can make plan and oracle disagree on bucket width. Probe
    // every threshold boundary (8·2^b ± 1) for the bits the exhaustive
    // test doesn't reach, plus corpus sizes far past the shared cap.
    import spark.implicits._
    val probes = (14 to 24).flatMap { b =>
      val t = 8L * (1L << b); Seq(t - 1, t, t + 1)
    } ++ Seq(1000000000L, Long.MaxValue / 4)
    val pbSql = graft.llm.DedupOps.projBitsSqlDuck("nn")
    val rSql = graft.llm.SimilarityOps.radiusSqlDuck("pb", "nn")
    probes.toDF("nn")
      .withColumn("pb", expr(pbSql))
      .withColumn("r", expr(rSql))
      .collect().foreach { row =>
        val n = row.getLong(0)
        val pbScala = graft.llm.DedupOps.projBitsFor(n)
        assert(row.getInt(1) == pbScala, s"pb drift at n=$n")
        assert(row.getInt(2) == graft.llm.SimilarityOps.probeRadiusFor(pbScala, n),
          s"radius drift at n=$n")
      }
  }

  test("emb append guard: a stale RP width is refused, naming the rebuild trigger (round 20)") {
    // VERDICT r19 #8 (stretch): the emb generation-append is sound ONLY
    // while projBitsFor(corpus) stays on the width the base generation was
    // bucketed under. The builder stamps that width as a table property;
    // this test proves the guard (a) passes for the stamped width and (b)
    // REJECTS a drifted width — the scenario where a later-session append
    // derives its width from a corpus that crossed an occupancy boundary.
    val ops = graft.llm.DedupOps
    val tbl = ops.embAppendTable(spark, SparkFixture.sfDir)
    val bits = ops.embBits(spark, SparkFixture.sfDir)
    val stamped = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(tbl))
      .properties.get(ops.EmbBitsProperty)
    assert(stamped.contains(bits.toString),
      s"builder must stamp ${ops.EmbBitsProperty}=$bits, found $stamped")
    ops.embAppendGuard(spark, tbl, bits) // the sound case is silent
    val ex = intercept[IllegalArgumentException] {
      ops.embAppendGuard(spark, tbl, bits + 1)
    }
    assert(ex.getMessage.contains("REBUILD trigger"), ex.getMessage)
    assert(ex.getMessage.contains(s"proj_bits=$bits"), ex.getMessage)
  }
}
