package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text primitives shared by the word-count and
  * text-analysis operators. All are built from codegen'd
  * `org.apache.spark.sql.functions` — no UDFs — so they stay inside
  * whole-stage codegen and push down where possible.
  *
  * Tokenization semantics mirror the reference engine:
  *  - alpha runs: maximal `[a-zA-Z]+` runs, case preserved, empties
  *    dropped (reference internal/worker/worker.go:24-38).
  *  - whitespace: `StringTokenizer`-style split on whitespace,
  *    punctuation kept (reference legacy/.../hw01/WordCount.java:44).
  */
object TextFns {

  /** Array of alphabetic tokens; empties removed. */
  def alphaTokens(c: Column): Column =
    filter(split(c, "[^a-zA-Z]+"), t => length(t) > 0)

  /** Array of whitespace-delimited tokens; empties removed. */
  def wsTokens(c: Column): Column =
    filter(split(c, "\\s+"), t => length(t) > 0)

  /** Token count without materializing an explode. */
  def nTokens(c: Column): Column = size(wsTokens(c))

  /** Word w-shingles (space-joined n-grams of whitespace tokens).
    * Distinct set per document is the MinHash/Jaccard input.
    */
  def wordShingles(c: Column, n: Int): Column = {
    val toks = wsTokens(c)
    // slide an n-window over the token array; drop the short tail
    filter(
      transform(toks, (_, i) => array_join(slice(toks, i + 1, lit(n)), " ")),
      (_, i) => i <= size(toks) - n
    )
  }

  /** Normalized text for fingerprinting: lowercase, collapse all
    * whitespace runs to single spaces, trim.
    */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Deterministic 128-bit document fingerprint (hex md5 of the
    * normalized text) — portable: identical in DuckDB (`md5(...)`).
    */
  def fingerprint(c: Column): Column = md5(normalizeText(c))
}
