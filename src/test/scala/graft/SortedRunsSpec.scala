package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Ground truth for `sink_sorted_runs` (Bucketing.scala): range-partitioned
  * sort-on-write must give every output file a disjoint date run, so a
  * date-range query's matching rows concentrate in few files (parquet
  * footer stats skip the rest at scan time). Results are oracle-checked by
  * the driver; this spec measures the LAYOUT property against a
  * round-robin baseline of the same file count — the ZOrderSpec idiom in
  * one dimension. */
class SortedRunsSpec extends AnyFunSuite {
  import SparkFixture.{spark, sfDir}

  private val q1 = col("o_orderdate") >= lit("1996-01-01") &&
    col("o_orderdate") < lit("1996-04-01")

  private def filesTouched(dir: String): Long =
    spark.read.parquet(dir).filter(q1)
      .select(input_file_name()).distinct().count()

  test("a quarter's rows live in a strict subset of sorted files") {
    val res = graft.etl.Bucketing.sinkSortedRuns(spark, sfDir)
    assert(res.count() > 0, "Q1-1996 must match rows at this SF")
    val sortedDir = graft.util.Scratch.keep(
      s"sorted_runs_${graft.util.Scratch.pathTag(sfDir)}")
    val rrDir = graft.util.Scratch.dir("sorted_runs_roundrobin_baseline")
    graft.tables.Tables(spark, sfDir, "orders")
      .repartition(8)
      .write.mode("overwrite").parquet(rrDir)
    val sortedFiles = filesTouched(sortedDir)
    val rrFiles = filesTouched(rrDir)
    info(s"Q1 rows live in $sortedFiles sorted files vs $rrFiles round-robin files")
    // the fixture spans 1995-01..2001-08 (~80 months); one quarter is
    // ~4% of the range, so the sorted layout should confine it to 1-2 of
    // the 8 range files while round-robin spreads it over nearly all
    assert(rrFiles >= 6, s"baseline should spread Q1 across most files, got $rrFiles")
    assert(sortedFiles <= 2,
      s"a quarter spans ~4% of the date range — expected <= 2 of 8 sorted files, got $sortedFiles")
  }

  test("each sorted file covers a disjoint date run") {
    graft.etl.Bucketing.sinkSortedRuns(spark, sfDir).count()
    val dir = graft.util.Scratch.keep(
      s"sorted_runs_${graft.util.Scratch.pathTag(sfDir)}")
    // epoch micros sidestep the NTZ/LocalDateTime vs Timestamp row type
    val ranges = spark.read.parquet(dir)
      .groupBy(input_file_name().as("f"))
      .agg(min(unix_micros(col("o_orderdate").cast("timestamp"))).as("lo"),
        max(unix_micros(col("o_orderdate").cast("timestamp"))).as("hi"))
      .orderBy("lo")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(ranges.length >= 2)
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB,
          s"file date runs overlap: $hiA > $loB — the range partitioner leaked")
      case _ =>
    }
  }
}
