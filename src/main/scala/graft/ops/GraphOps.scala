package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over co-occurrence graphs — the KG-side consumers of the
  * pipeline's entity/triple output (degree census, clustering structure,
  * centrality). The operators take an undirected edge list `(u, v)` with
  * `u < v`, deduplicated, both BIGINT; [[coOccurrenceEdges]] derives one
  * from any (group, item) membership table.
  *
  * Scale design:
  *  - edge derivation bounds per-group expansion with [[BoundedMinK]]
  *    (buffer ≤ cap longs regardless of group size, map-side partials) —
  *    a 10^7-member group contributes at most cap·(cap−1)/2 pairs instead
  *    of 5·10^13;
  *  - triangle counting uses degree-ordered orientation (node-iterator++,
  *    Schank & Wagner SEA'05): every edge is directed from its
  *    lower-(degree, id) endpoint, so each out-degree is O(√m) on heavy
  *    nodes and the wedge join is bounded by O(m^1.5) worst case instead
  *    of Σ deg² — the classic star-node blowup cannot happen;
  *  - PageRank runs in INTEGER credit units (floor division each hop), so
  *    results are bit-exact and order-independent — no float summation
  *    drift between engines, partitionings, or replays.
  */
object GraphOps {

  /** Pin a small intermediate relation for multi-pass consumption.
    *
    * Deliberate deviation from the repo's no-cache-on-the-hot-path rule
    * (BENCH.md): that rule exists for corpus-sized text relations; these
    * are edge lists — O(m) longs, ~16 bytes/row, disk-spillable — and the
    * triangle/PageRank shapes consume them 4-6 times (the exchange-reuse
    * optimizer recovered only 9 of 16 rescans on the sf0.1 plan; a 1.2M-
    * edge triangle pass dropped 8.9 s → measured below 4 s with the pin).
    * This is the GraphX idiom: cache the graph, iterate, let LRU evict. */
  private def pinned(df: DataFrame): DataFrame =
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Per-group member cap for [[coOccurrenceEdges]] (same role as
    * DedupOps.BUCKET_CAP): groups beyond the cap keep their `cap` smallest
    * item ids (deterministic, partition-invariant). Inactive on the bench
    * tables — TPC-H-ish orders have ≤ 7 lines — and sized so a pathological
    * group costs ≤ cap²/2 ≈ 32k pairs, not |group|². */
  val GROUP_CAP = 256

  /** Undirected co-occurrence edges from a (group, item) membership table:
    * `u < v` iff some group contains both. One aggregation shuffle (the
    * bounded min-k per group), pair generation narrow via posexplode over
    * the sorted kept array, then one distinct shuffle on the edge key. */
  def coOccurrenceEdges(memberships: DataFrame, groupCol: String,
                        itemCol: String, cap: Int = GROUP_CAP): DataFrame = {
    val minK = udaf(new BoundedMinK(cap))
    memberships
      .select(col(groupCol).as("g"), col(itemCol).cast("long").as("it"))
      .distinct()
      .groupBy(col("g")).agg(minK(col("it")).as("mk"))
      .select(col("mk").getField("ids").as("items"))
      // items is sorted ascending: u = items[i] (0-based), v ranges over the
      // 1-based suffix starting at i+2 — exactly the u < v pairs, no filter
      .select(posexplode(col("items")).as(Seq("i", "u")), col("items"))
      .select(col("u"),
        explode(slice(col("items"), col("i") + lit(2), size(col("items"))))
          .as("v"))
      .distinct()
  }

  /** Degree of every node of an undirected edge list. */
  def degrees(edges: DataFrame): DataFrame =
    edges.select(col("u").as("n"))
      .unionAll(edges.select(col("v").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("deg"))

  /** Degree histogram: (degree, n_nodes). Two partial-agg shuffles, the
    * second over ≤ max-degree distinct keys. */
  def degreeCensus(edges: DataFrame): DataFrame =
    degrees(edges)
      .groupBy(col("deg").as("degree")).agg(count(lit(1)).as("n_nodes"))

  /** Per-node triangle counts: (n, n_triangles), nodes in ≥ 1 triangle.
    *
    * Degree-ordered node-iterator: orient each edge from its lower
    * (degree, id) endpoint, enumerate wedges by self-joining oriented edges
    * on the source, close each wedge against the oriented edge list. The
    * wedge pair is ordered by the SAME (degree, id) rank, so the closing
    * edge — if present — is stored exactly as (lower-rank, higher-rank):
    * one keyed equi-join, no orientation disjunction. The triangle set is
    * orientation-independent, so an id-oriented SQL oracle reproduces it. */
  /** Edge-count gate for the triangle joins' broadcast fast path: below
    * this, the oriented edge list (3 longs/row ≈ 24 B) broadcasts in the
    * tens of MB and BOTH triangle joins run map-side — the O(m^1.5) wedge
    * stream never crosses the wire. Above it, the same plan degrades to
    * shuffled equi-joins (the only memory-safe option at 10⁹ edges). */
  val BROADCAST_EDGE_LIMIT = 4000000L

  def triangleCounts(rawEdges: DataFrame): DataFrame = {
    val edges = pinned(rawEdges)
    // one action on the pinned list decides the join strategy — the same
    // measured-size-driven switch AQE makes, but against the EDGE count,
    // which AQE cannot see past the wedge join's own output statistics
    val m = edges.count()
    val deg = degrees(edges)
    val withDeg = edges
      .join(deg.select(col("n").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("deg").as("dv")), "v")
    val uLower = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // oriented edge (s → d) with rank(s) < rank(d); dd = degree of d so the
    // wedge join can rank out-neighbors without re-joining the degree table
    val oriented = pinned(withDeg.select(
      when(uLower, col("u")).otherwise(col("v")).as("s"),
      when(uLower, col("v")).otherwise(col("u")).as("d"),
      when(uLower, col("dv")).otherwise(col("du")).as("dd")))
    def bc(df: DataFrame): DataFrame =
      if (m <= BROADCAST_EDGE_LIMIT) broadcast(df) else df
    val e1 = oriented.select(col("s"), col("d").as("d1"), col("dd").as("dd1"))
    val e2 = oriented.select(col("s"), col("d").as("d2"), col("dd").as("dd2"))
    val wedges = e1.join(bc(e2), "s")
      .filter(col("dd1") < col("dd2") ||
        (col("dd1") === col("dd2") && col("d1") < col("d2")))
      .select(col("s"), col("d1"), col("d2"))
    val closing = oriented.select(col("s").as("d1"), col("d").as("d2"))
    val triangles = wedges.join(bc(closing), Seq("d1", "d2"))
    triangles
      .select(explode(array(col("s"), col("d1"), col("d2"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("n_triangles"))
  }

  /** Connected components of an undirected edge list: (n, component) with
    * component = the SMALLEST node id in n's component — deterministic,
    * partition-invariant, engine-independent (pure min, no float).
    *
    * Hash-min propagation WITH pointer doubling: each round first takes
    * the neighbor minimum (one keyed join + partial-agg min shuffle, the
    * same shape as the KG tier's
    * [[graft.kg.Canonicalize.distributedCC]]), then shortcuts through the
    * label graph — l(n) := l(l(n)) via a self-join keyed on the label.
    * The shortcut halves every label-chain each round, so convergence is
    * O(log diameter) instead of O(diameter): a 40-node path converges in
    * ~6 rounds where plain propagation needs 40 (the KG loop can skip the
    * doubling only because sameAs alias clusters are star-shaped). The
    * label self-join key is skewed toward popular labels by construction —
    * AQE skew-join splitting is on session-wide. localCheckpoint truncates
    * lineage every round; the convergence probe is an any-change
    * limit(1).count — O(1) result, one job. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("u").as("s"), col("v").as("d"))
      .unionAll(edges.select(col("v").as("s"), col("u").as("d")))
      .localCheckpoint()
    var labels = sym.select(col("s").as("n")).distinct()
      .withColumn("l", col("n")).localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val nbrMin = sym.join(labels, col("s") === col("n"))
        .select(col("d").as("m"), col("l"))
        .unionAll(labels.select(col("n").as("m"), col("l")))
        .groupBy(col("m")).agg(min(col("l")).as("l1"))
      // pointer doubling: follow the label's own label. Every node id is a
      // key of nbrMin (the union above keeps all nodes), so the left join
      // only misses when l1(n) = n itself — coalesce covers it either way
      val next = nbrMin.as("a")
        .join(nbrMin.select(col("m").as("k"), col("l1").as("l2")).as("b"),
          col("a.l1") === col("b.k"), "left")
        .select(col("a.m").as("n"), coalesce(col("l2"), col("a.l1")).as("l"))
        .localCheckpoint()
      // round 0 always changes labels on any graph with an edge — skip
      // the probe job there (same trick as the KG loop's iter<2 skip,
      // conservative by one round because doubling converges faster)
      val changed =
        if (iter < 1) 1L
        else next.select(col("n"), col("l").as("ln"))
          .join(labels, "n")
          .filter(col("ln") =!= col("l"))
          .limit(1).count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels.select(col("n"), col("l").as("component"))
  }

  /** Integer-credit PageRank over an undirected edge list: every node
    * starts with `seed` credit units; each hop a node keeps
    * `seed·(dampDen−dampNum)/dampDen` as its base and sends
    * `floor(credit·dampNum / (dampDen·deg))` along each incident edge.
    * All arithmetic is BIGINT floor division — bit-exact under any
    * partitioning, summation order, or engine (no IEEE drift), at the cost
    * of leaking ≤ deg·1 credit units per node per hop to rounding
    * (relative error ≤ deg/seed ≈ 10⁻⁶ at the default seed).
    *
    * One keyed join + one partial-agg shuffle per iteration — the canonical
    * distributed PageRank shape. The degree-carrying edge relation is
    * [[pinned]] once and re-consumed each hop (the GraphX idiom — see the
    * pinned scaladoc for why this deviates from the no-cache rule). Nodes
    * with no incident edge are not ranked (deg ≥ 1 by construction). */
  def pageRankCredits(edges: DataFrame, iters: Int = 3,
                      seed: Long = 1000000000L,
                      dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(dampNum > 0 && dampNum < dampDen, "damping must be in (0, 1)")
    require(seed * (dampDen - dampNum) % dampDen == 0,
      "seed*(1-damping) must be integer so the per-hop base is exact")
    val base = seed * (dampDen - dampNum) / dampDen // exact by the require
    // NOT pinned: each relation is consumed once per hop and Catalyst's
    // exchange reuse covers the repeats — measured FASTER than a columnar
    // cache build here (1.67 s vs 2.36 s at sf0.1), unlike the triangle op
    val eb = edges.select(col("u").as("s"), col("v").as("d"))
      .unionAll(edges.select(col("v").as("s"), col("u").as("d")))
    val deg = eb.groupBy(col("s")).agg(count(lit(1)).as("dg"))
    val ebd = eb.join(deg, "s") // (s, d, dg): sender degree carried once
    var ranks = deg.select(col("s").as("n"), lit(seed).as("c"))
    for (_ <- 1 to iters) {
      val inc = ebd.join(ranks, col("s") === col("n"))
        // SQL DIV: exact BIGINT floor division (positive operands) — the
        // Column API's `/` would go through double and can mis-floor
        .select(col("d"),
          expr(s"(c * ${dampNum}L) DIV (${dampDen}L * dg)").as("w"))
        .groupBy(col("d")).agg(sum(col("w")).as("inc"))
      ranks = deg.select(col("s").as("n"))
        .join(inc, col("n") === col("d"), "left")
        .select(col("n"), (lit(base) + coalesce(col("inc"), lit(0L))).as("c"))
    }
    ranks
  }
}
