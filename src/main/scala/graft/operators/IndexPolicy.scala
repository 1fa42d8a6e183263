package graft.operators

import org.apache.spark.sql.SparkSession

/** Policy and bookkeeping shared by the index families: the
  * tombstone-fraction fold predicate ([[Dedup.neardupFoldDue]],
  * [[Similarity.ivfFoldDue]] — one predicate so the policy arithmetic
  * cannot drift; bm25's segment-count budget is a genuinely different
  * knob and stays in [[TextAnalysis]]) and the mutation-generation
  * counter behind the as-of reads (near-dup and IVF tag every
  * mutation; bm25's generations are its segment ordinals and need no
  * counter).
  */
private[operators] object IndexPolicy {

  /** Current mutation generation of an index (0 = freshly built;
    * every mutation bumps it). A plain one-line text file at
    * `idx/meta` — raw FileSystem I/O, NOT a Spark job: the counter
    * rides every mutation, and two driver jobs for one long would be
    * measurable fixture-scale overhead on the check-in family.
    * Single-writer like every index mutation here. None = the index
    * predates generation tracking (or the dir is not an index).
    */
  def genOf(spark: SparkSession, idx: String): Option[Long] = {
    val p = new org.apache.hadoop.fs.Path(s"$idx/meta")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val buf = new Array[Byte](fs.getFileStatus(p).getLen.toInt)
      val in = fs.open(p)
      try in.readFully(0L, buf) finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8)
        .trim.toLong)
    }
  }

  /** Temp-write + checked rename (the bm25 dir-swap discipline): an
    * in-place truncate would destroy the counter on a crash
    * mid-write. A crash between the delete and the rename leaves no
    * meta — genOf returns None and everything fails FAST instead of
    * reading a torn value.
    */
  def writeGen(spark: SparkSession, idx: String, g: Long): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$idx/meta")
    val tmp = new org.apache.hadoop.fs.Path(s"$idx/.meta_tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(g.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(!fs.exists(p) || fs.delete(p, false),
      s"writeGen: could not clear $p")
    require(fs.rename(tmp, p), s"writeGen: rename $tmp -> $p failed")
  }

  /** Allocate the generation the next mutation tags its rows with —
    * and COMMIT it to meta before any row lands. Meta-first ordering
    * means a crashed mutation leaves at worst a partial (or empty)
    * generation pinned at its OWN number; commit-after-rows would let
    * the next mutation re-allocate the number and silently merge the
    * orphan rows into an unrelated generation.
    */
  def bumpGen(spark: SparkSession, idx: String): Long =
    genOf(spark, idx) match {
      case Some(g) =>
        writeGen(spark, idx, g + 1L)
        g + 1L
      case None => throw new IllegalArgumentException(
        s"$idx predates generation tracking (no meta) — rebuild the " +
          "index to enable mutations and as-of reads")
    }

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
