package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Co-occurrence analytics over order baskets: association pairs
  * (market-basket support/confidence) and PageRank on the resulting
  * item graph. The reference has no joins at all (SURVEY.md §2b) —
  * these are engine-provided surface on the north-star side, and the
  * two classic shapes a recommendation / data-curation pipeline runs
  * at scale.
  *
  * 100 TB posture:
  *  - pair generation is the quadratic step; it is bounded BEFORE it
  *    runs by (a) apriori pruning — items below min support cannot
  *    appear in a frequent pair, so they are dropped first — and (b)
  *    a deterministic per-basket item cap, so a pathological basket
  *    contributes at most cap²/2 pairs instead of |basket|².
  *  - there is NO self-join: baskets are collected once (groupBy on
  *    the basket key) and pairs expand map-side from the capped
  *    array — the plan is scan → distinct → basket-agg → explode →
  *    pair-agg, with no corpus-sized build side anywhere.
  *  - PageRank is the iterative driver-loop shape (same as
  *    Dedup.dedupClusters): each round is one join + one partial-agg
  *    shuffle over (edge, rank) with lineage cut by localCheckpoint;
  *    the driver never sees per-node state.
  */
object Cooccur {

  private val MinSupport = 5   // apriori: item must appear in ≥5 baskets
  private val BasketCap  = 30  // per-basket item cap (by part key order)
  private val MinPair    = 2   // emit pairs co-occurring in ≥2 baskets

  /** Co-occurring item pairs (part_a < part_b, with both items'
    * basket counts) — the shared pair-generation core. Shape: one
    * distinct pass, a broadcast of the (tiny) frequent-item list,
    * one groupBy that collects each basket as a sorted capped array,
    * then pair expansion entirely MAP-SIDE via array transform — no
    * self-join, no window. The capped array bounds memory (≤ cap
    * structs per basket) and the quadratic step (≤ cap²/2 pairs) runs
    * inside the row it came from, so the only shuffles are the three
    * key-partitioned aggregations.
    */
  private def pairGen(spark: SparkSession, dir: String): DataFrame = {
    val items0 = Tables.lineitem(spark, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val freq = items0.groupBy("pk").agg(count(lit(1)).as("cnt"))
    items0
      .join(broadcast(freq.where(col("cnt") >= MinSupport)), "pk")
      .groupBy("ok")
      .agg(slice(sort_array(collect_list(struct(col("pk"), col("cnt")))),
        1, BasketCap).as("arr"))
      .select(expr(
        """explode(flatten(transform(arr, (x, i) ->
          |  transform(slice(arr, i + 2, size(arr)), y ->
          |    struct(x.pk AS part_a, x.cnt AS cnt_a,
          |           y.pk AS part_b, y.cnt AS cnt_b))))) AS p""".stripMargin))
      .select(col("p.part_a"), col("p.cnt_a"), col("p.part_b"), col("p.cnt_b"))
      .groupBy("part_a", "part_b")
      .agg(
        count(lit(1)).as("pair_cnt"),
        min("cnt_a").as("cnt_a"),
        min("cnt_b").as("cnt_b"))
      .where(col("pair_cnt") >= MinPair)
  }

  /** Association pairs (a < b) with co-occurrence count and
    * confidence P(b|a): the support-pruned, basket-capped
    * market-basket core.
    */
  def assocPairs(spark: SparkSession, dir: String): DataFrame =
    pairGen(spark, dir)
      .select(
        col("part_a"), col("part_b"), col("pair_cnt"),
        col("cnt_a"), col("cnt_b"),
        round(col("pair_cnt").cast("double") / col("cnt_a"), 4).as("conf_a_b"))
      .orderBy("part_a", "part_b")

  /** PageRank (damping 0.85, exactly 3 iterations) over the
    * undirected co-occurrence graph from [[assocPairs]]. The graph is
    * symmetric by construction (each pair contributes both
    * directions), so every node has out-degree ≥ 1 and there is no
    * dangling-mass term to redistribute. Ranks are rounded to 12
    * decimals per iteration so the DuckDB oracle (the same three
    * iterations unrolled as CTEs) sees bit-identical inputs each
    * round regardless of float summation order.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val pairs = pairGen(spark, dir)
      .select(col("part_a").as("u"), col("part_b").as("v"))
    // LAZY setup checkpoints fused with the n count right below (r21):
    // localCheckpoint persists its blocks on FIRST compute regardless
    // of eagerness, so the single count job materializes edges AND deg
    // — two fewer driver jobs than eager-ckpt + eager-ckpt + count.
    // (Distinct from the reverted per-ROUND lazy experiment noted in
    // the loop: here the materializing action runs immediately, so no
    // uncheckpointed chain ever feeds AQE replanning.)
    val edges = pairs
      .union(pairs.select(col("v"), col("u")))
      .localCheckpoint(eager = false) // reused every iteration: cut the pair-gen lineage
    val deg = edges.groupBy("u")
      .agg(count(lit(1)).cast("double").as("d"))
      .localCheckpoint(eager = false)
    // degree is static across iterations — join it into the edge set
    // ONCE (r22, guide §2.4 shared work): each of the 3 iterations
    // then pays a single rank join instead of re-joining deg every
    // round; the lazy checkpoint materializes inside round 1's rank
    // checkpoint job (no extra driver action).
    val wDeg = edges.join(deg, "u")
      .select(col("u"), col("v"), col("d"))
      .localCheckpoint(eager = false)
    val n = deg.count().toDouble // one scalar to the driver, not per-node state

    var rank = deg.select(col("u"), lit(1.0 / n).as("r"))
    for (_ <- 1 to 3) {
      val contribs = wDeg
        .join(rank, "u")
        .select(col("v"), (col("r") / col("d")).as("c"))
        .groupBy("v").agg(sum("c").as("cs"))
      // EAGER checkpoint, deliberately (r21 tried lazy here to fold
      // the three iteration jobs into the caller's one action; the
      // full bench REGRESSED 3.9 → 5.1 s — the lazy form re-enters the
      // uncheckpointed iteration chain through AQE's per-stage
      // replanning, costing more than the three driver round-trips it
      // saves. Recorded so the next round doesn't retry it.)
      rank = deg.select(col("u"))
        .join(contribs.withColumnRenamed("v", "u"), Seq("u"), "left")
        .select(
          col("u"),
          round(lit(0.15 / n) + lit(0.85) * coalesce(col("cs"), lit(0.0)), 12).as("r"))
        .localCheckpoint()
    }
    rank
      .select(col("u").as("part"), round(col("r") * 1000, 6).as("rank_x1000"))
      .orderBy("part")
  }

  /** Triangle census of the co-occurrence graph: node/edge/wedge/
    * triangle counts and the global clustering coefficient
    * 3·T / Σ C(deg,2). Uses DEGREE-ORDERED ORIENTATION — each
    * undirected edge points from its (degree, id)-smaller endpoint to
    * the larger — which makes the orientation a DAG where every
    * out-degree is O(√m), so the quadratic wedge step expands at most
    * out-deg² pairs per node instead of deg² (the difference between
    * feasible and not on a power-law graph: a hub with degree 10⁶
    * contributes ZERO wedges from its own adjacency — its triangles
    * are counted at their low-degree corners). Each triangle is
    * counted exactly once, at its (degree,id)-minimal corner.
    *
    * Shape: wedges expand MAP-SIDE from each source's collected
    * out-neighbor array (same capped-array idiom as [[pairGen]], with
    * the √m structural bound instead of a cap), then one join of
    * wedges against the oriented edge set confirms closure. No
    * corpus-sized build side; the count is a 1-row aggregate.
    */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    val pairs = pairGen(spark, dir)
      .select(col("part_a").as("a"), col("part_b").as("b"))
      .localCheckpoint(eager = false) // reused 3x: edges, degrees, closure
    val deg = pairs.select(col("a").as("u"))
      .union(pairs.select(col("b").as("u")))
      .groupBy("u").agg(count(lit(1)).as("d"))
    val withDeg = pairs
      .join(deg.select(col("u").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("u").as("b"), col("d").as("db")), "b")
    // orient (degree, id)-ascending: src strictly precedes dst
    val oriented = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("src"), col("b").as("dst")))
        .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val wedges = oriented
      .groupBy("src")
      .agg(sort_array(collect_list(col("dst"))).as("out"))
      .select(expr(
        """explode(flatten(transform(out, (x, i) ->
          |  transform(slice(out, i + 2, size(out)), y ->
          |    struct(x AS w1, y AS w2))))) AS w""".stripMargin))
      .select(col("w.w1").as("w1"), col("w.w2").as("w2"))
    // closure: a wedge (w1, w2) is a triangle iff the edge exists in
    // EITHER orientation (w1/w2 order is by id, orientation by degree)
    val closed = wedges.join(
      oriented.select(
        least(col("src"), col("dst")).as("w1"),
        greatest(col("src"), col("dst")).as("w2")),
      Seq("w1", "w2"), "left_semi")
    val totals = pairs.agg(count(lit(1)).as("n_edges"))
    // integer div keeps the wedge sum exact past 2^53 (Spark's `/` on
    // longs is double division; d·(d−1) is even so `div 2` is lossless)
    val wedgeTotal = deg.agg(
      count(lit(1)).as("n_nodes"),
      sum(expr("(d * (d - 1)) div 2")).as("n_wedges"))
    closed.agg(count(lit(1)).as("n_triangles"))
      .crossJoin(broadcast(totals))
      .crossJoin(broadcast(wedgeTotal))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 6)
          .as("clustering"))
  }
}
