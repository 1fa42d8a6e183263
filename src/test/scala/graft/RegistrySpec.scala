package graft

/** Guards on the driver contract itself: every oracle key must have a
  * query, and every query must pass Catalyst analysis (schema
  * resolution — catches missing columns/type errors without paying
  * execution time for all 63 queries).
  */
class RegistrySpec extends SparkSpec {

  test("every oracleSql key has a matching queries entry") {
    val orphan = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(orphan.isEmpty, s"oracle entries without queries: $orphan")
  }

  test("query names are unique and non-empty") {
    assert(SparkEntry.queries.keySet.forall(_.nonEmpty))
    assert(SparkEntry.queries.size >= 60)
  }

  // builders whose plan CONSTRUCTION runs driver-side actions (the
  // label-propagation loop must execute per-round jobs to converge) —
  // excluded here so this stays an analysis-only smoke test; they get
  // full execution coverage in their own specs and in Verify
  // (kv_roundtrip's builder executes the writeKV sink job up front)
  private val eagerBuilders = Set("dedup_clusters", "dedup_clusters_star",
    "dedup_keep_longest", // same label-propagation loop as dedup_clusters
    "kv_roundtrip", "bloom_join", "bpe_vocab", "bpe_encode", "ivf_index_topk",
    "ivf_serve_topk", "ivf_append_topk", // same Lloyd build jobs at plan construction
    "contamination_bloom", "stream_window_contract", "stream_dedup_contract", // count + Bloom build over the eval side up front
    "stream_neardup_contract", // full streaming near-dup replay at plan build
    "graph_pagerank", // localCheckpoint iterations run at plan build
    "mixture_temperature") // collects the 5-row quota map up front

  test("all queries analyze (schema resolves) at sf0.001") {
    val failures = SparkEntry.queries
      .filterNot { case (name, _) => eagerBuilders(name) }
      .flatMap { case (name, fn) =>
        try { fn(spark, sf).schema; None }
        catch { case e: Throwable => Some(s"$name: ${e.getMessage.take(120)}") }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("entry() returns rows (driver smoke parity)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  /** The FINAL SELECT's projection list: the text between the first
    * parenthesis-depth-0 SELECT and its depth-0 FROM. CTE bodies and
    * subqueries sit at depth ≥ 1, so only the outermost projection —
    * the one whose names the driver hashes — is scanned. Quoted
    * string literals are skipped so parens inside regex/format
    * literals can't skew the depth count.
    */
  private def finalSelectList(sqlLower: String): Option[String] = {
    val s = sqlLower
    def word(at: Int, w: String): Boolean =
      s.regionMatches(at, w, 0, w.length) &&
        (at + w.length == s.length ||
          { val c = s(at + w.length); !c.isLetterOrDigit && c != '_' }) &&
        (at == 0 || { val c = s(at - 1); !c.isLetterOrDigit && c != '_' })
    var depth = 0; var i = 0; var selStart = -1
    while (i < s.length) {
      s(i) match {
        case '\'' => // skip the literal (DuckDB escapes ' as '')
          i += 1
          while (i < s.length && s(i) != '\'') i += 1
        case '(' => depth += 1
        case ')' => depth -= 1
        case _ if depth == 0 =>
          if (selStart < 0 && word(i, "select")) selStart = i + 6
          else if (selStart >= 0 && word(i, "from"))
            return Some(s.substring(selStart, i))
        case _ =>
      }
      i += 1
    }
    if (selStart >= 0) Some(s.substring(selStart)) else None
  }

  test("every Spark output column name appears in its oracle SQL (alias drift)") {
    // the driver's compare sorts columns BY NAME before hashing, so a
    // renamed alias on one side hash-mismatches even when values are
    // identical — catch the drift at test time, not driver time.
    // r12 tightening (ADVICE): the name must appear in the FINAL
    // SELECT's projection list (bare, qualified, or AS-bound) — the
    // r11 rule still let short names like `n` ride on any comma-
    // adjacent token anywhere in the SQL (CTE aliases, lambda vars).
    // A final `SELECT *` (names flow from a CTE) falls back to
    // requiring an explicit `AS name` binding somewhere in the SQL.
    val failures = SparkEntry.oracleSql.keySet.toSeq.sorted
      .filterNot(eagerBuilders)
      .flatMap { name =>
        val sql = SparkEntry.oracleSql(name).toLowerCase
        // star-projection only when the list LEADS with `*` (or
        // `t.*`): a `*` inside count(*) or a multiplication is not
        // one. `SELECT *[, extras]` pulls names from a CTE, so those
        // queries keep the r11 positional rule over the whole SQL.
        val scope = finalSelectList(sql) match {
          case Some(list) if !list.trim.matches("""(?s)([a-z0-9_]+\.)?\*([,\s].*)?""") =>
            list
          case _ => sql
        }
        val starFallback = scope eq sql
        val missing = SparkEntry.queries(name)(spark, sf).schema.fieldNames
          .filterNot { c =>
            val ident = java.util.regex.Pattern.quote(c.toLowerCase)
            val pat =
              if (starFallback)
                s"""(?:\\bas\\s+|\\bselect\\s+(?:distinct\\s+)?|,\\s*)""" +
                  s"""(?:[a-z0-9_]+\\.)?$ident(?![a-z0-9_])"""
              else s"""(^|[\\s,(.])$ident(?![a-z0-9_])"""
            pat.r.findFirstIn(scope).isDefined
          }
        if (missing.isEmpty) None else Some(s"$name: ${missing.toList}")
      }
    assert(failures.isEmpty,
      s"spark columns absent from oracle SQL final select:\n${failures.mkString("\n")}")
  }
}
