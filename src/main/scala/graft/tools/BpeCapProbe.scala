package graft.tools

/** Driver-side timing probe for BPE merge induction at the vocab-collect
  * cap (VERDICT r15 queue #5): `induceMerges`' correctness is pinned past
  * 1000 merges by BpeSpec, but its TIME at the 2M-word
  * SPARK_GRAFT_BPE_VOCAB_CAP ceiling was unmeasured — the per-merge argmax
  * is a linear scan of the live pair map, and "plausibly minutes at the
  * cap" needed a number before someone discovers it in production.
  *
  * Pure driver work (induceMerges takes an Array — no Spark session), so
  * the probe synthesizes a deterministic heavy vocabulary shaped like a
  * real web corpus' pruned tail: Zipf-ish counts, 4–12-char words over a
  * 26-letter alphabet from a seeded LCG. Run manually:
  *
  *   sbt -batch "runMain graft.tools.BpeCapProbe [nWords] [nMerges]"
  *
  * Results are recorded in BASELINE.md (round 17): 70.6 s total =
  * 70.6 ms/merge at nWords=2,000,000, nMerges=1000 — the linear argmax
  * stays; no heap needed. The structural
  * argument for why the argmax scan is NOT the quadratic threat it reads
  * as: initial symbols are single code points, so the live pair map
  * starts at ≤ |alphabet|² entries and each merge adds only the new
  * pair types its fold creates — the map stays thousands-to-tens-of-
  * thousands of entries at ANY vocab size; the real per-merge cost is
  * rewriting the words that contain the merged pair (the `where`
  * fan-out), which the probe reports separately. */
object BpeCapProbe {

  def main(args: Array[String]): Unit = {
    val nWords = args.headOption.map(_.toInt).getOrElse(2000000)
    val nMerges = args.drop(1).headOption.map(_.toInt).getOrElse(1000)

    // seeded LCG → deterministic vocabulary across runs/hosts
    var seed = 0x5DEECE66DL
    def nextInt(bound: Int): Int = {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 33) % bound).toInt + bound) % bound
    }
    val sb = new java.lang.StringBuilder(16)
    val seen = new java.util.HashSet[String](nWords * 2)
    val words = new Array[(String, Long)](nWords)
    var i = 0
    while (i < nWords) {
      sb.setLength(0)
      val len = 4 + nextInt(9)
      var j = 0
      while (j < len) { sb.append(('a' + nextInt(26)).toChar); j += 1 }
      val w = sb.toString
      if (seen.add(w)) {
        // Zipf-ish: count ~ nWords / rank, floor 1 (the minCount survivors)
        words(i) = (w, math.max(1L, (nWords.toLong * 10) / (i + 1)))
        i += 1
      }
    }
    println(s"[bpe-cap] vocab=$nWords merges=$nMerges (seeded synthetic)")

    val t0 = System.nanoTime()
    val model = graft.llm.TextOps.induceMerges(words, nMerges)
    val tTotal = (System.nanoTime() - t0) / 1e9
    val nDone = model.merges.length
    println(f"[bpe-cap] induceMerges: $tTotal%.1f s total, " +
      f"${tTotal * 1000 / math.max(1, nDone)}%.1f ms/merge over $nDone merges")
    // top-of-sequence sanity so a probe run is also a smoke check
    val (s1, l1, r1, c1) = model.merges.head
    println(s"[bpe-cap] first merge: step=$s1 pair=($l1,$r1) count=$c1")
  }
}
