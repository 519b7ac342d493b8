package graft.util

/** Shared parsing for positive-int environment knobs (review r10: the
  * scalar and comma-list variants had drifted into two hand-rolled
  * copies in WriteSpread and ScaleCheck). Throws IllegalArgumentException
  * with the offending raw value — callers expose `def`s rather than
  * object-initializer `val`s so a bad knob surfaces as this clean message,
  * not an ExceptionInInitializerError swallowed by a per-query catch. */
object EnvKnobs {
  def positiveInt(key: String, default: Int): Int =
    sys.env.get(key).map { raw =>
      val v = scala.util.Try(raw.trim.toInt).toOption
      require(v.exists(_ > 0), s"$key must be a positive int, got '$raw'")
      v.get
    }.getOrElse(default)

  def positiveIntList(key: String, default: Seq[Int]): Seq[Int] =
    sys.env.get(key).map { raw =>
      val toks = raw.split(",").map(_.trim).filter(_.nonEmpty).toSeq
      val parsed = toks.map(t => scala.util.Try(t.toInt).toOption)
      require(toks.nonEmpty && parsed.forall(_.exists(_ > 0)),
        s"$key must be a comma list of positive ints, got '$raw'")
      parsed.flatten
    }.getOrElse(default)
}
