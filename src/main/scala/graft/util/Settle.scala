package graft.util

/** Probe-tool settle: sync, then wait for the page cache to actually
  * DRAIN before timing anything. A fixed sleep was not enough at probe
  * volumes — the round-20 gram run's first rebuild rep read 132 s vs
  * 30-37 s warm after a 5 s settle, the same dirty-page flush artifact
  * the round-19 build probe pinned (BASELINE.md round-20 coda #2). The
  * wait polls /proc/meminfo Dirty+Writeback down to a floor, bounded at
  * 60 s so a busy host degrades to the old fixed-sleep behavior instead
  * of hanging; on a platform without /proc the poll reads 0 and only the
  * fixed sleeps apply. Measurement-tool-only code — never on a query
  * path. */
object Settle {

  private def dirtyKb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines()
        .filter(l => l.startsWith("Dirty:") || l.startsWith("Writeback:"))
        .map(_.split("\\s+")(1).toLong).sum
      finally src.close()
    } catch { case _: Throwable => 0L }

  def drain(floorKb: Long = 65536, maxWaitSec: Int = 60): Unit = {
    try { new ProcessBuilder("sync").start().waitFor() }
    catch { case _: Throwable => () }
    val deadline = System.nanoTime() + maxWaitSec * 1000L * 1000 * 1000
    Thread.sleep(2000)
    while (dirtyKb > floorKb && System.nanoTime() < deadline) Thread.sleep(2000)
    Thread.sleep(3000)
  }
}
