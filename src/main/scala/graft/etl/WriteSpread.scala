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
  * dir × |partitions| stays near core count; BASELINE.md round 10 records
  * the 1/8/32 sweep that confirmed it); a 1000-executor cluster sizes it
  * executor-count-ish. Hence the env knob rather than a literal:
  * `SPARK_GRAFT_WRITE_SPREAD=16` A/Bs the write shape without a code
  * edit. A `def`, not an object-init `val`: a malformed knob then throws
  * the clean IllegalArgumentException from EnvKnobs at the call site
  * instead of an ExceptionInInitializerError + opaque NoClassDefFoundError
  * cascade across every later query (review r10). */
private[graft] object WriteSpread {
  def n: Int = graft.util.EnvKnobs.positiveInt("SPARK_GRAFT_WRITE_SPREAD", 8)
}
