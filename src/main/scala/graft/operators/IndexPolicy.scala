package graft.operators

import org.apache.spark.sql.SparkSession

/** Policy and bookkeeping shared by the index families: the
  * tombstone-fraction fold predicate ([[Dedup.neardupFoldDue]],
  * [[Similarity.ivfFoldDue]] — one predicate so the policy arithmetic
  * cannot drift; bm25's segment-count budget is a genuinely different
  * knob and stays in [[TextAnalysis]]) and the POINTER-COMMIT protocol
  * every index mutation publishes through.
  *
  * ==Pointer-commit protocol== (r16 verdict #1 — the port of the old
  * rename-swap design note): each index root holds exactly ONE small
  * mutable object, the manifest file `current`. Everything else is
  * IMMUTABLE once referenced: rewrites (build, refresh, compact,
  * retrain) write their output under fresh uniquely-named epoch dirs
  * (`idx/ep/e-<token>/...`), appends add rows/files to dirs the
  * manifest already references (made visible only by the generation
  * watermark the manifest carries), and the single commit step of any
  * mutation is an atomic replace of `current`. Consequences:
  *
  *  - READERS NEVER FAIL during healthy mutations: a serve resolves
  *    the manifest once and reads the immutable dirs it names; a
  *    mutation that commits mid-serve cannot touch those dirs. A crash
  *    mid-mutation leaves a stale pointer — the last committed
  *    generation keeps serving (no sentinel, no fail-fast window).
  *  - OBJECT-STORE SAFE: the only atomicity requirement is replacing
  *    one small object. On HDFS/local that is the temp-write+rename of
  *    [[writeAtomicFile]]; on S3-style stores it maps to a single
  *    conditional PUT (or a catalog swap — the Iceberg/Delta model).
  *    No multi-object rename window exists anywhere.
  *  - GC is decoupled from commit: dirs a crashed or superseded
  *    mutation left behind are unreferenced by the current manifest
  *    and reclaimed by [[sweep]] at the START of the next mutation
  *    (single-writer), giving in-flight readers of the previous
  *    manifest a full mutation interval of grace; a production
  *    deployment widens that to a time-based expiry (the Iceberg
  *    expire-snapshots discipline).
  *
  * The manifest carries the layout stamp (validated by every read — an
  * index written under different directory-hash constants would be
  * silently misread), the mutation-generation watermarks behind
  * in-place appends and as-of reads, the per-table epoch pointers, and
  * (bm25) the bucket→epoch map and committed segment list.
  */
private[graft] object IndexPolicy {

  // ---------------------------------------------------------------
  // atomic small-file I/O — the ONE mutable object per index
  // ---------------------------------------------------------------

  /** Bare absolute local path (no URI scheme) — the replace-in-place
    * primitive differs per store; see [[writeAtomicFile]].
    */
  private def isBareLocal(s: String): Boolean =
    s.startsWith("/") && !s.matches("[A-Za-z][A-Za-z0-9+.\\-]*:.*")

  /** READ of the one mutable object. Local filesystems (every fixture
    * and test) go through raw nio so writes and reads agree on the
    * no-checksum-sidecar representation of [[writeAtomicFile]]'s
    * atomic replace. Recovery branch (non-local stores, or a manually
    * restored dir): if the main file is missing but a fully-written
    * `.{name}_tmp` exists, the VALUE is recovered from the tmp and
    * the reinstating rename is best-effort only — a read must never
    * fail because a concurrent reader won the rename race or the
    * index lives on a read-only snapshot.
    */
  private def readAtomicFile(spark: SparkSession, idx: String,
                             name: String): Option[String] = {
    if (isBareLocal(idx)) {
      import java.nio.file.{Files, Paths}
      val p = Paths.get(s"$idx/$name")
      val tmp = Paths.get(s"$idx/.${name}_tmp")
      // the replace is one atomic rename(2): the main file is the
      // complete old or complete new value. A leftover COMPLETE tmp
      // with no main file can only be a manual restore — recover it.
      if (Files.exists(p))
        return Some(new String(Files.readAllBytes(p),
          java.nio.charset.StandardCharsets.UTF_8).trim)
      if (Files.exists(tmp)) {
        val v = new String(Files.readAllBytes(tmp),
          java.nio.charset.StandardCharsets.UTF_8).trim
        try Files.move(tmp, p)
        catch { case _: java.io.IOException => } // lost the race: fine
        return Some(v)
      }
      return None
    }
    val p = new org.apache.hadoop.fs.Path(s"$idx/$name")
    val tmp = new org.apache.hadoop.fs.Path(s"$idx/.${name}_tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readAll(q: org.apache.hadoop.fs.Path): String = {
      val buf = new Array[Byte](fs.getFileStatus(q).getLen.toInt)
      val in = fs.open(q)
      try in.readFully(0L, buf) finally in.close()
      new String(buf, java.nio.charset.StandardCharsets.UTF_8).trim
    }
    if (fs.exists(p)) Some(readAll(p))
    else if (fs.exists(tmp)) {
      val v =
        try readAll(tmp)
        catch { // lost a recovery race: the winner reinstated p
          case e: java.io.IOException if fs.exists(p) => readAll(p)
        }
      try fs.rename(tmp, p) catch { case _: java.io.IOException => }
      Some(v)
    } else None
  }

  /** Temp-write + ATOMIC REPLACE — the pointer swing every mutation
    * commits through. On a local filesystem the replace is one
    * rename(2) with REPLACE_EXISTING + ATOMIC_MOVE (raw nio, so no
    * Hadoop checksum sidecar can go stale): a concurrent reader sees
    * the complete old or complete new value, NEVER an absence — the
    * reads-never-fail contract holds for readers of the pointer
    * itself, not just of the epoch dirs (r17 review: the previous
    * delete-then-rename had a window where a racing read of `current`
    * threw, and a reader's tmp recovery could abort a committed
    * mutation). On HDFS the equivalent primitive is
    * FileContext.rename(OVERWRITE) (atomic rename2); on an object
    * store, one conditional PUT. The non-local fallback here keeps
    * delete+rename with the reader-side tmp recovery closing the
    * crash (not the race) window.
    */
  private def writeAtomicFile(spark: SparkSession, idx: String,
                              name: String, content: String): Unit = {
    if (isBareLocal(idx)) {
      import java.nio.file.{Files, Paths, StandardCopyOption}
      Files.createDirectories(Paths.get(idx))
      val tmp = Paths.get(s"$idx/.${name}_tmp")
      Files.write(tmp,
        content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(s"$idx/$name"),
        StandardCopyOption.REPLACE_EXISTING,
        StandardCopyOption.ATOMIC_MOVE)
      return
    }
    val p = new org.apache.hadoop.fs.Path(s"$idx/$name")
    val tmp = new org.apache.hadoop.fs.Path(s"$idx/.${name}_tmp")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(tmp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    require(!fs.exists(p) || fs.delete(p, false),
      s"writeAtomicFile: could not clear $p")
    require(fs.rename(tmp, p), s"writeAtomicFile: rename $tmp -> $p failed")
  }

  // ---------------------------------------------------------------
  // the manifest
  // ---------------------------------------------------------------

  /** Flat key→value map, serialized one `k=v` line per key (values may
    * contain '=' — parsing splits on the first only). Raw FS I/O, NOT
    * a Spark job: it rides every read and mutation.
    */
  type Manifest = Map[String, String]

  private val ManifestName = "current"

  private[graft] def readManifest(spark: SparkSession,
                                  idx: String): Option[Manifest] =
    readAtomicFile(spark, idx, ManifestName).map(_.split("\n")
      .map(_.trim).filter(_.nonEmpty).map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v }.toMap)

  /** The committed state of an index — fails only when the dir has no
    * manifest at all (a build that crashed before its publish, or a
    * dir that is not an index): there is no committed state to serve.
    */
  def manifestOf(spark: SparkSession, idx: String): Manifest =
    readManifest(spark, idx).getOrElse(
      throw new IllegalArgumentException(
        s"$idx has no manifest — either the build crashed before " +
          "committing or the dir is not an index: (re)build it"))

  /** THE pointer swing — the single atomic commit step of every index
    * mutation. Everything the new manifest references must already be
    * fully written; everything it stops referencing becomes garbage
    * for the next mutation's [[sweep]].
    */
  private[graft] def publish(spark: SparkSession, idx: String,
                             m: Manifest): Unit =
    writeAtomicFile(spark, idx, ManifestName,
      m.toSeq.sortBy(_._1).map { case (k, v) => s"$k=$v" }.mkString("\n"))

  // ---------------------------------------------------------------
  // epochs — immutable generation-addressed data dirs
  // ---------------------------------------------------------------

  private val EpochPat = "e-[0-9a-f]{12}".r

  def newEpoch(): String =
    "e-" + java.util.UUID.randomUUID().toString.replace("-", "").take(12)

  def epochDir(idx: String, tok: String): String = s"$idx/ep/$tok"

  /** Reclaim dirs no longer reachable from the committed manifest:
    * epoch dirs whose token appears nowhere in it (a crashed
    * mutation's partial output, or a superseded rewrite's old data)
    * and — when the family keeps a `segments` list — segment dirs the
    * list no longer names. Called at the START of each mutation under
    * the single-writer assumption.
    *
    * Reader-grace guarantee, stated precisely (r17 review): a reader
    * that resolved manifest M keeps its dirs at least until the NEXT
    * mutation after the one that dereferences them — and only
    * REWRITES (refresh/compact/retrain) ever dereference; the
    * high-frequency mutations (check-ins, appends, removals) add
    * references without dropping any, so their sweeps reclaim only
    * crash orphans. A serve can therefore lose files only if it is
    * still scanning when a SECOND rewrite lands — and rewrites are the
    * scheduled, periodic folds. Deployments whose serves may span two
    * folds set `spark.graft.index.sweep.grace.ms`: unreferenced dirs
    * younger than the window are kept (time-based expiry, the
    * expire-snapshots discipline); the default 0 keeps fixture GC
    * deterministic.
    */
  def sweep(spark: SparkSession, idx: String, m: Manifest): Unit = {
    import org.apache.hadoop.fs.Path
    val fs = new Path(idx)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val grace =
      spark.conf.get("spark.graft.index.sweep.grace.ms", "0").toLong
    val cutoff = System.currentTimeMillis() - grace
    val serialized = m.toSeq.map { case (k, v) => s"$k=$v" }.mkString("\n")
    val refs = EpochPat.findAllIn(serialized).toSet
    val ep = new Path(s"$idx/ep")
    if (fs.exists(ep)) fs.listStatus(ep).foreach { st =>
      if (!refs.contains(st.getPath.getName) &&
          st.getModificationTime < cutoff)
        require(fs.delete(st.getPath, true),
          s"sweep: could not delete ${st.getPath}")
    }
    val segRefs = m.get("segments")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val segRoot = new Path(s"$idx/segments")
    if (fs.exists(segRoot)) fs.listStatus(segRoot).foreach { st =>
      if (!segRefs.contains(st.getPath.getName) &&
          st.getModificationTime < cutoff)
        require(fs.delete(st.getPath, true),
          s"sweep: could not delete ${st.getPath}")
    }
  }

  /** Resolved physical dir of an index table under the committed
    * manifest — tombstones resolve through their own epoch key, every
    * other table through the family's shared `data` epoch. ONE
    * implementation (r17 review: Dedup and Similarity carried
    * verbatim copies).
    */
  private[graft] def resolvedTable(spark: SparkSession, idx: String,
                                   name: String): Option[String] = {
    val m = manifestOf(spark, idx)
    val key = if (name == "tombstones") "tombstones" else "data"
    m.get(key).map(tok => s"${epochDir(idx, tok)}/$name")
  }

  /** The tombstones epoch for a removal: reuse the manifest's, or
    * mint a fresh one whose key lands ONLY in the commit swing — a
    * crash after the rows but before the commit leaves the dir
    * unreferenced (swept later) instead of half-visible. ONE
    * implementation of the mint-or-reuse subtlety (r17 review).
    */
  def tombstoneEpoch(m: Manifest): (String, Manifest) =
    m.get("tombstones") match {
      case Some(t) => (t, Map.empty[String, String])
      case None => val t = newEpoch(); (t, Map("tombstones" -> t))
    }

  // ---------------------------------------------------------------
  // layout stamp — carried IN the manifest: an index written under
  // different directory-hash constants (nPb/nDb/nTk) would otherwise
  // be silently MISREAD (a delta's pb computed mod 8 misses rows
  // stored under pb 8..15 — partial results, no error). Because the
  // manifest is published LAST at build, its presence doubles as the
  // build-commit marker.
  // ---------------------------------------------------------------

  def layoutEntry(params: Seq[(String, Long)]): (String, String) =
    "layout" -> params.map { case (k, v) => s"$k=$v" }.mkString(",")

  /** Validate the params this reader depends on against the build's
    * stamp — SUBSET semantics, so an operator that only uses the
    * directory-hash constants (compact, remove) needn't know the
    * query-family params (n/k/bands) to validate its own.
    */
  def checkLayout(m: Manifest, idx: String,
                  expected: Seq[(String, Long)]): Unit = {
    val line = m.getOrElse("layout",
      throw new IllegalArgumentException(
        s"$idx manifest has no layout stamp — rebuild the index"))
    val found = line.split(",").map(_.split("=", 2))
      .collect { case Array(k, v) => k -> v.toLong }.toMap
    expected.foreach { case (k, v) =>
      require(found.get(k).contains(v),
        s"$idx layout mismatch on '$k': index was built with " +
          s"${found.get(k).fold("no value")(_.toString)} but this " +
          s"reader expects $v — results would be silently partial; " +
          "rebuild the index (or run a binary built with its constants)")
    }
  }

  // ---------------------------------------------------------------
  // generation watermarks (near-dup / IVF in-place appends) — both
  // counters live IN the manifest, so a compact's epoch swap and its
  // timeline reset commit in the same pointer swing.
  // ---------------------------------------------------------------

  def genOf(m: Manifest): Long = m.get("gen").map(_.toLong).getOrElse(0L)

  def committedOf(m: Manifest): Long =
    m.get("gen_committed").map(_.toLong).getOrElse(genOf(m))

  /** Read ceiling for a torn index: Some(committed) iff some allocated
    * generation never committed — readers cap visible rows there, so a
    * torn mutation reads as "never happened" instead of serving
    * partial state (e.g. buckets rows whose docsets twins are
    * missing). None (the healthy, common case) adds no filter to any
    * live read path.
    */
  def tornCeiling(m: Manifest): Option[Long] = {
    val g = genOf(m); val c = committedOf(m)
    if (c < g) Some(c) else None
  }

  /** Allocate the generation the next mutation tags its rows with —
    * published to the manifest BEFORE any row lands, so a crashed
    * mutation's orphan rows can never share a tag with (and merge
    * into) a later mutation's. REFUSES a torn index: committing past
    * an uncommitted generation would raise the watermark over the
    * orphan's rows and resurrect them — the repair is the family's
    * fold (compact/retrain), which rewrites only committed rows and
    * resets both watermarks.
    */
  def allocGen(spark: SparkSession, idx: String,
               m: Manifest): (Long, Manifest) = {
    val g = genOf(m)
    tornCeiling(m).foreach(c =>
      throw new IllegalStateException(
        s"$idx generations ${c + 1}..$g never committed (crashed " +
          "mutation left partial rows) — fold/compact the index " +
          "to repair before mutating"))
    val m2 = m + ("gen" -> (g + 1L).toString)
    publish(spark, idx, m2)
    (g + 1L, m2)
  }

  /** Commit generation `g` (and any manifest changes the mutation
    * carries — a freshly-minted tombstones epoch, a new stats epoch)
    * in ONE pointer swing.
    */
  def commitGen(spark: SparkSession, idx: String, m: Manifest, g: Long,
                extra: Manifest = Map.empty): Unit =
    publish(spark, idx, m ++ extra + ("gen_committed" -> g.toString))

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
