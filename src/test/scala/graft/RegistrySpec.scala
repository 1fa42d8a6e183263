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
    "contamination_bloom", "stream_window_contract", "stream_dedup_contract", // count + Bloom build over the eval side up front
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

  test("every Spark output column name appears in its oracle SQL (alias drift)") {
    // the driver's compare sorts columns BY NAME before hashing, so a
    // renamed alias on one side hash-mismatches even when values are
    // identical — catch the drift at test time, not driver time.
    // r11 tightening: the name must appear in ALIAS/SELECT-LIST
    // position (after AS, after SELECT [DISTINCT], or after a
    // list comma, optionally table-qualified) — a bare anywhere-match
    // let short names like `n` or `pos` ride on incidental CTE
    // aliases or lambda variables elsewhere in the SQL
    val failures = SparkEntry.oracleSql.keySet.toSeq.sorted
      .filterNot(eagerBuilders)
      .flatMap { name =>
        val sql = SparkEntry.oracleSql(name).toLowerCase
        val missing = SparkEntry.queries(name)(spark, sf).schema.fieldNames
          .filterNot { c =>
            val ident = java.util.regex.Pattern.quote(c)
            (s"""(?i)(?:\\bas\\s+|\\bselect\\s+(?:distinct\\s+)?|,\\s*)""" +
              s"""(?:[a-z0-9_]+\\.)?$ident(?![a-z0-9_])""").r
              .findFirstIn(sql).isDefined
          }
        if (missing.isEmpty) None else Some(s"$name: $missing")
      }
    assert(failures.isEmpty,
      s"spark columns absent from oracle SQL:\n${failures.mkString("\n")}")
  }
}
