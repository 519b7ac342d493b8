package graft.etl

/** Spread factor for partitioned writes (VERDICT r9 #2).
  *
  * `df.repartition(partCol)` alone funnels each partition directory
  * through ONE task — invisible at fixture scale, a serialization point
  * when a partition holds terabytes. The fix at the three funnel sites
  * (sink_orc_roundtrip, upsert_partition_overwrite ×2, plus the DPP
  * fixture table) is `repartition(partCol, pmod(key, N))`: each directory
  * gets up to N parallel writers with files/dir bounded at N.
  *
  * N is a deployment decision — 8 suits the 32-core fixture (writers per
  * dir × |partitions| stays near core count); a 1000-executor cluster
  * sizes it executor-count-ish. Hence the env knob rather than a literal:
  * `SPARK_GRAFT_WRITE_SPREAD=16` A/Bs the write shape without a code
  * edit, and BASELINE.md records the quiet-disk sweep that picked the
  * default.
  */
private[graft] object WriteSpread {
  val n: Int = sys.env.get("SPARK_GRAFT_WRITE_SPREAD").map { raw =>
    val v = scala.util.Try(raw.trim.toInt).toOption
    require(v.exists(_ > 0),
      s"SPARK_GRAFT_WRITE_SPREAD must be a positive int, got '$raw'")
    v.get
  }.getOrElse(8)
}
