package graft.operators

/** The tombstone-fraction fold policy shared by the near-dup and IVF
  * index families ([[Dedup.neardupFoldDue]], [[Similarity.ivfFoldDue]]
  * — one predicate so the policy arithmetic cannot drift between
  * them; bm25's segment-count budget is a genuinely different knob
  * and stays in [[TextAnalysis]]).
  */
private[operators] object IndexPolicy {

  /** DUE once live tombstones exceed `maxFrac` of stored rows.
    * `total` is by-name: the dead == 0 fast path (the common,
    * pristine-index case) never reads the stored table's footers.
    * The denominator is stored ROWS, not distinct entities — the
    * cheap, slightly-conservative choice (re-admitted ids add rows
    * until the fold).
    */
  def tombstoneFoldDue(dead: Long, total: => Long, maxFrac: Double): Boolean =
    dead > 0L && {
      val t = total
      t > 0L && dead.toDouble / t > maxFrac
    }
}
