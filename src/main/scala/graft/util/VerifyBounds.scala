package graft.util

/** Single source of truth for every weak-form verification bound (ADVICE
  * r15): the sketch/iterative ops' verification frames compute bound
  * booleans engine-side and the driver's DuckDB oracle pins them TRUE, so
  * the CONTRACT lives in these constants — if a frame builder and its
  * documentation (BASELINE.md) or its production sketch config disagreed,
  * the check would weaken silently. Every frame builder references these
  * by name, the one bound constant that must equal a production sketch
  * parameter ([[CmsEps]]) is interpolated into the production expression
  * string itself, and ContractSpec asserts the cross-site invariants so
  * the two sides cannot drift independently.
  *
  * Rationale for each value is documented at the USE site (the frame
  * builder's scaladoc carries the measured margins per tier).
  */
object VerifyBounds {

  /** KLL/GK percentile frames: estimate within 1% relative of exact. */
  val PctRelTol = 0.01

  /** Rank-slack band for the median/MAD frames: the sketch guarantees
    * rank error, so value tolerance is the data's value width across
    * ±0.5% ranks around the target quantile. */
  val RankSlackLo = 0.495
  val RankSlackHi = 0.505

  /** HLL-family relative error band (profile distinct counts, mergeable
    * daily HLL, set-algebra overlap): 5% ≈ 3–5σ at the default
    * lgConfigK used by the DataSketches/Spark HLL implementations. */
  val HllRelErr = 0.05

  /** CMS epsilon — MUST equal the production sketch's configured eps
    * (Advanced.aggHeavyHittersCms interpolates this constant into its
    * `count_min_sketch` expression, so equality holds by construction). */
  val CmsEps = 1e-4

  /** Slack multiplier on the eps·N CMS overcount band (the w.p.-0.99
    * guarantee is probabilistic; seeds are fixed so 2× is deterministic
    * headroom for this data, same factor ApproxSpec uses). */
  val CmsSlack = 2.0

  /** MinHash frame: K=32 signature estimate within this of exact Jaccard
    * (binomial σ at J=0.5 is 0.088 → 0.25 ≈ 2.8σ; measured max |est−exact|
    * across tiers: 0.17 at sf0.1). */
  val MinhashEstTol = 0.25

  /** MinHash frame precision gate (round 16): spurious detections
    * (est ≥ threshold, exact < threshold) are bounded by
    * max(FpFloor, ceil(FpFrac · n_true_pairs)). Measured: 1 spurious at
    * sf0.1's 256 true pairs, 0 at the smaller tiers — the floor gives
    * 4× headroom at fixture scale, the fraction takes over past 80
    * true pairs with ~13× headroom at sf0.1. */
  val MinhashFpFloor = 4L
  val MinhashFpFrac = 0.05

  /** Near-dup Jaccard detection threshold shared by the production LSH
    * gate, the exact verification join, and the oracle replays. */
  val JaccardThreshold = 0.5

  /** SimHash ranking cap — must equal the production `.limit(n)` on both
    * the in-memory and indexed pair rankings (ContractSpec cross-checks
    * the frame's `pairs_bounded` upper bound against this). */
  val SimhashPairCap = 200

  /** SimHash reported distance bound: midpoint of the 128-bit space
    * (measured max across tiers: 17). */
  val SimhashHamBound = 64

  /** Signature-index frame: distinct band-hash count ≥ this fraction of
    * distinct normalized texts (measured floor 0.83 at sf0.1). */
  val SigBucketFloorNum = 3L
  val SigBucketFloorDen = 5L

  /** SimHash-index frame: distinct chunk values ≥ n_texts / this
    * (measured min ratio 0.21 at sf0.1 under the 31-word fixture's
    * fingerprint correlation). */
  val SimCvalFloorDiv = 8L

  /** Winnow-posting density envelope: selection picks ≥1 min per
    * 16-window so density ∈ [1/16, 1/5] with ~2× headroom both ways
    * (measured 10.5–10.6% at every tier). */
  val SpanDensityLoDiv = 16L
  val SpanDensityHiDiv = 5L
}
