package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over pair tables (the near-dup pair
  * stream, cross-source dup edges, or any (id_a, id_b) frame).
  *
  * The corpus-quality use: PageRank-style centrality over a document/
  * host similarity graph is the classic "rank hosts by authority"
  * signal (Common Crawl publishes host-level ranks for exactly this
  * filtering purpose); here it runs over the engine's own near-dup
  * pair output, so heavily-duplicated hub documents surface with high
  * centrality and can be down-weighted at sampling time.
  *
  * Exactness discipline: ALL arithmetic is 64-bit integer — ranks
  * live in `unit` fixed-point units, per-edge contributions use
  * integer division — so results are bit-identical on any engine, any
  * partitioning, any row order (stronger than the micro-nat rounding
  * the entropy family uses: there is no floating point anywhere).
  */
object Graph {

  /** PageRank over the UNDIRECTED graph induced by `pairs`
    * (id_a, id_b), in exact integer fixed-point.
    *
    * Recurrence (all BIGINT, `div` = truncating division, every value
    * non-negative so truncation == floor on both Spark and DuckDB):
    * {{{
    *   base      = ((100 - damp) * unit div 100) div n
    *   r0(v)     = unit div n
    *   contrib(u)= (r(u) * damp div 100) div deg(u)
    *   r'(v)     = base + sum over neighbors u of contrib(u)
    * }}}
    * Truncation leaks a little probability mass per round (bounded by
    * (deg-sum + n) ulps of 1/unit) — deterministic and identical on
    * both engines, which is the point; raise `unit` when n grows so
    * unit/n keeps ≥6 digits of headroom (1e12 covers n up to ~1e6 at
    * micro-precision; a 100 TB host graph of ~1e8 nodes wants 1e15).
    *
    * Scale shape: one shuffle per iteration (groupBy dst over the edge
    * stream), edges symmetrized + materialized ONCE so the upstream
    * pair pipeline (shingle/LSH/verify) never re-runs per iteration;
    * ranks/deg are node-bounded. `checkpointDir = Some(dir)` switches
    * every truncation from executor-local blocks to reliable
    * checkpoints under `dir` — identical values, state survives
    * executor loss; see [[Checkpointing]] for the full contract. Degrees never ride the
    * shuffle — contributions are computed edge-side after a node-table
    * join. The node count is a one-scalar driver bootstrap (documented
    * constant class). Dangling nodes cannot exist (every node comes
    * from an edge, degree >= 1).
    *
    * `seeds = Some(df)` switches to PERSONALIZED PageRank: teleport
    * mass restarts only at the seed nodes (first column of `df`,
    * restricted to in-graph nodes) — proximity-to-seeds ranking, the
    * contamination-blast-radius score that weights by connectivity
    * where [[bfsDistances]] counts hops.
    *
    * Returns (id, rank_units BIGINT, rank DOUBLE = units/unit).
    */
  def pageRank(
      pairs: DataFrame,
      iters: Int = 5,
      damp: Long = 85L,
      unit: Long = 1000000000000L,
      checkpointDir: Option[String] = None,
      seeds: Option[DataFrame] = None): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damp >= 0 && damp <= 100, "damp is a percentage")
    val edges = pairs
      .select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      // edge hygiene, enforced rather than assumed: a self-loop or a
      // duplicate/reversed-duplicate input pair would silently
      // double-count degree AND contributions. The distinct is one
      // extra 16-byte-edge shuffle paid once before the
      // materialization (identity on the already-distinct id_a<id_b
      // pair streams the engine produces); the filter also drops
      // null-id edges, which carry no rankable endpoint.
      .filter(col("src") =!= col("dst"))
      .distinct()
      // one materialization feeds deg, r0 and all iterations;
      // checkpointDir picks executor-local blocks vs the reliable FS
      // (Checkpointing.scala for the executor-loss tradeoff)
      .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val n = deg.count()
    if (n == 0L)
      return pairs.sparkSession
        .range(0)
        .select(
          col("id"),
          col("id").as("rank_units"),
          col("id").cast("double").as("rank"))
    // Personalized mode (Haveliwala 2002, topic-sensitive PageRank):
    // teleport mass lands ONLY on the seed set — both the restart
    // term and r0. Seeds are restricted to graph nodes (a seed with
    // no edges can neither receive nor pass mass; documented
    // contract, enforced by the semi-join). Plain mode keeps the
    // uniform-teleport arithmetic byte-identical to before.
    val seedTbl = seeds.map { sd =>
      sd.select(col(sd.columns.head).as("id"))
        .distinct()
        .join(deg.select(col("id")), Seq("id"), "left_semi")
        .withColumn("is_seed", lit(true))
        .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    }
    val nBase = seedTbl.map(_.count()).getOrElse(n)
    require(nBase > 0L, "personalized pageRank needs at least one in-graph seed")
    val base = ((100L - damp) * unit / 100L) / nBase
    var ranks = seedTbl match {
      case None => deg.select(col("id"), lit(unit / n).as("r"))
      case Some(st) =>
        deg.join(st, Seq("id"), "left")
          .select(
            col("id"),
            when(col("is_seed"), lit(unit / nBase)).otherwise(lit(0L)).as("r"))
    }
    def restart(frame: DataFrame): DataFrame = seedTbl match {
      case None => frame.select(col("id"), (lit(base) + col("in_mass")).as("r"))
      case Some(st) =>
        frame.join(st, Seq("id"), "left")
          .select(
            col("id"),
            (when(col("is_seed"), lit(base)).otherwise(lit(0L)) + col("in_mass")).as("r"))
    }
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(
          ranks.join(deg, Seq("id"))
            .select(
              col("id").as("src"),
              expr(s"(r * $damp) div 100 div deg").as("c")),
          Seq("src"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_mass"))
      // lazy checkpoint: truncates lineage so the final single action
      // runs each iteration's join once, not a re-derivation per
      // downstream reference
      ranks = Checkpointing.truncate(restart(contrib), checkpointDir, eager = false)
      i += 1
    }
    ranks.select(
      col("id"),
      col("r").as("rank_units"),
      (col("r").cast("double") / lit(unit.toDouble)).as("rank"))
  }

  /** [[pageRank]] over a WEIGHTED undirected graph (id_a, id_b, w):
    * contributions split proportionally to edge weight instead of
    * uniformly — on a co-occurrence graph the natural weights are
    * co-occurrence counts, and a neighbor sharing 9 orders should
    * pull 9× the mass of one sharing 1. Same exact-integer
    * discipline: contrib(u→v) = ((r(u)·damp div 100)·w_uv) div
    * W(u) with W(u) = Σ_v w_uv — truncation per EDGE (bounded by
    * deg ulps per node per round, deterministic on both engines).
    * Edge hygiene: self-loops and null ids dropped; duplicate
    * (src, dst) rows SUM their weights (the multigraph collapse);
    * non-positive weights dropped (they carry no mass and would
    * corrupt W). One shuffle per iteration, 24-byte weighted edges.
    */
  def pageRankWeighted(
      pairsW: DataFrame,
      iters: Int = 5,
      damp: Long = 85L,
      unit: Long = 1000000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(damp >= 0 && damp <= 100, "damp is a percentage")
    val edges = Checkpointing.truncate(
      pairsW
        .select(col("id_a").as("src"), col("id_b").as("dst"), col("w").cast("long").as("w"))
        .union(pairsW.select(col("id_b").as("src"), col("id_a").as("dst"), col("w").cast("long").as("w")))
        .filter(col("src") =!= col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull && col("w") > 0L)
        .groupBy(col("src"), col("dst"))
        .agg(sum(col("w")).as("w")),
      checkpointDir,
      eager = true)
    val wdeg = edges.groupBy(col("src").as("id")).agg(sum(col("w")).as("wdeg"))
    val n = wdeg.count()
    if (n == 0L)
      return pairsW.sparkSession
        .range(0)
        .select(
          col("id"),
          col("id").as("rank_units"),
          col("id").cast("double").as("rank"))
    val base = ((100L - damp) * unit / 100L) / n
    var ranks = wdeg.select(col("id"), lit(unit / n).as("r"))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(
          ranks.join(wdeg, Seq("id"))
            .select(col("id").as("src"), expr(s"(r * $damp) div 100").as("m"), col("wdeg")),
          Seq("src"))
        .select(col("dst"), expr("(m * w) div wdeg").as("c"))
        .groupBy(col("dst").as("id"))
        .agg(sum(col("c")).as("in_mass"))
      ranks = Checkpointing.truncate(
        contrib.select(col("id"), (lit(base) + col("in_mass")).as("r")),
        checkpointDir,
        eager = false)
      i += 1
    }
    ranks.select(
      col("id"),
      col("r").as("rank_units"),
      (col("r").cast("double") / lit(unit.toDouble)).as("rank"))
  }

  /** Multi-source BFS distances, depth ≤ `maxDepth`: shortest hop
    * count from any seed over the undirected graph induced by
    * `pairs`. The contamination-taint use: seeds are flagged docs
    * (takedowns, benchmark leaks, poisoned feeds) and the output is
    * every document within r near-dup hops — the transitive blast
    * radius a direct-overlap check misses (a paraphrase of a
    * paraphrase of a leaked benchmark item). Unreached nodes are
    * absent; seeds report dist 0 whether or not they touch an edge.
    *
    * Scale shape: textbook frontier BFS — each round joins only the
    * CURRENT frontier against the edge list (frontier-proportional,
    * the delta-iteration discipline of [[graft.operators.Dedup
    * .clusterPairs]]), visited-set anti-join keeps rounds monotone,
    * lineage truncates per round, and an empty frontier exits early.
    * Edge hygiene as [[pageRank]].
    */
  def bfsDistances(
      pairs: DataFrame,
      seeds: DataFrame,
      maxDepth: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val edges = Checkpointing.truncate(
      pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .filter(col("src") =!= col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct(),
      checkpointDir,
      eager = false)
    var dist = seeds
      .select(col(seeds.columns.head).as("id"))
      .distinct()
      .withColumn("dist", lit(0L))
    var frontier = dist.select(col("id"))
    var d = 1
    var done = false
    while (d <= maxDepth && !done) {
      val next = Checkpointing.truncate(
        frontier
          .join(edges, frontier("id") === edges("src"))
          .select(col("dst").as("id"))
          .distinct()
          .join(dist, Seq("id"), "left_anti"),
        checkpointDir,
        eager = false)
      if (next.isEmpty) done = true
      else {
        dist = Checkpointing.truncate(
          dist.unionByName(next.withColumn("dist", lit(d.toLong))),
          checkpointDir,
          eager = false)
        frontier = next
        d += 1
      }
    }
    dist
  }

  /** k-core peeling, `rounds` fixed iterations: repeatedly drop
    * nodes of degree < k (with every edge they carry) from the
    * undirected graph induced by `pairs`; returns the survivors with
    * their residual degrees after exactly `rounds` peels. The
    * converged k-core (Seidman 1983; Batagelj & Zaveršnik's peeling)
    * is the fixpoint of this sequence — fixed rounds are the
    * oracle-checkable form (the DuckDB mirror unrolls the same
    * rounds; a converged graph makes later rounds no-ops on both
    * engines), and dedup/graph-quality consumers use the core as the
    * "dense template cluster" detector the way triangle counts flag
    * hubs.
    *
    * Scale shape per round: one degree hash-agg + two semi-joins on
    * node ids — edges shuffle 16 bytes each, the node table is
    * degree-bounded, and lineage truncates each round
    * ([[Checkpointing]], the pageRank/clusterPairs discipline).
    * Edge hygiene as [[pageRank]]: self-loops, duplicates and null
    * ids dropped.
    */
  def kCore(
      pairs: DataFrame,
      k: Int,
      rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(rounds >= 1, "rounds must be >= 1")
    var edges = pairs
      .select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
    edges = Checkpointing.truncate(edges, checkpointDir, eager = false)
    var i = 0
    while (i < rounds) {
      val deg = edges
        .select(col("u").as("id"))
        .unionAll(edges.select(col("v").as("id")))
        .groupBy(col("id"))
        .agg(count(lit(1)).as("deg"))
      val keep = deg.filter(col("deg") >= k).select(col("id"))
      edges = edges
        .join(keep.withColumnRenamed("id", "u"), Seq("u"), "left_semi")
        .join(keep.withColumnRenamed("id", "v"), Seq("v"), "left_semi")
      edges = Checkpointing.truncate(edges, checkpointDir, eager = false)
      i += 1
    }
    edges
      .select(col("u").as("id"))
      .unionAll(edges.select(col("v").as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("deg"))
  }

  /** Synchronous label propagation (Raghavan, Albert & Kumara 2007),
    * `rounds` fixed iterations: every node starts labeled with its own
    * id; each round every node adopts the most frequent label among
    * its neighbors, ties broken toward the SMALLEST label — a totally
    * ordered argmax, so the whole run is deterministic on any
    * partitioning and exactly mirrorable by an unrolled-CTE oracle
    * (the kCore fixed-rounds discipline: convergence state is
    * irrelevant to parity because both engines run identical rounds).
    * Communities on a near-dup/co-occurrence graph split the loose
    * bridges connected components merge — template families inside
    * one giant CC surface as separate labels.
    *
    * Scale shape per round: one (dst, label) hash-aggregate shuffle
    * over the edge stream (16-byte keys) + a node-bounded argmax
    * hash-agg (min over (-count, label) structs — no window, no
    * per-node sort); lineage truncates per round ([[Checkpointing]]).
    * Every node is edge-incident (labels0 derives from the edge
    * list), so no isolated-node coalesce path exists. Edge hygiene
    * as [[pageRank]]: self-loops, duplicates, null ids dropped.
    *
    * Returns (id, community) — community = the label held after
    * exactly `rounds` rounds.
    */
  def labelPropagation(
      pairs: DataFrame,
      rounds: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    val edges = Checkpointing.truncate(
      pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .filter(col("src") =!= col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct(),
      checkpointDir,
      eager = true)
    var labels = edges.select(col("src").as("id")).distinct()
      .select(col("id"), col("id").as("lbl"))
    var i = 0
    while (i < rounds) {
      val votes = edges
        .join(labels.withColumnRenamed("id", "src"), Seq("src"))
        .groupBy(col("dst"), col("lbl"))
        .agg(count(lit(1)).as("c"))
      labels = Checkpointing.truncate(
        votes
          .groupBy(col("dst").as("id"))
          .agg(min(struct((-col("c")).as("nc"), col("lbl").as("l"))).as("m"))
          .select(col("id"), col("m.l").as("lbl")),
        checkpointDir,
        eager = false)
      i += 1
    }
    labels.select(col("id"), col("lbl").as("community"))
  }

  /** Exact per-node triangle counts + local clustering coefficient
    * over the undirected graph induced by `pairs` (id_a, id_b).
    * Returns (id, deg BIGINT, n_tri BIGINT, lcc DOUBLE =
    * 2·tri / (deg·(deg−1)), 0.0 for deg 1) for every node incident to
    * an edge, a pure graph property — the dup-graph's clique-ness
    * audit (near-dup clusters should be near-cliques; low-lcc
    * high-degree nodes are template hubs) and the standard cohesion
    * metric on co-occurrence graphs.
    *
    * Scale shape: DEGREE-ORIENTED wedge join (the classic
    * O(m^{3/2}) bound — Schank & Wagner 2005, Suri & Vassilvitskii
    * "Counting Triangles and the Curse of the Last Reducer" WWW 2011):
    * each edge is directed from its lower (deg, id) endpoint to the
    * higher, so every node's OUT-degree is ≤ √(2m) no matter how
    * skewed the raw degrees — the wedge self-join explodes out×out
    * pairs, which orientation bounds at Σ d_out² ≤ m^{3/2}, where the
    * naive id-ordered orientation lets one low-id hub contribute
    * deg² wedges. Wedge pairs are normalized by the SAME (deg, id)
    * key, so closing edges join directly in their stored orientation.
    * All equi-joins and hash aggregates; triangle counts are
    * orientation-independent, so any implementation (the DuckDB
    * oracle uses plain id-ordered joins) must agree exactly.
    *
    * Edge hygiene matches [[pageRank]]: self-loops and duplicate /
    * reversed-duplicate pairs are dropped, null ids filtered.
    */
  def triangleCounts(pairs: DataFrame): DataFrame = {
    val und = pairs
      .select(
        least(col("id_a"), col("id_b")).as("u"),
        greatest(col("id_a"), col("id_b")).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()
      // one materialization feeds degrees, orientation and the wedge
      // joins — the upstream pair pipeline never re-runs
      .localCheckpoint()
    val deg = und
      .select(col("u").as("id"))
      .unionAll(und.select(col("v").as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("deg"))
    // orient by (deg, id): src = smaller key. κ rides the edge row so
    // wedge normalization below needs no further deg lookups.
    val oriented = und
      .join(deg.select(col("id").as("u"), col("deg").as("du")), "u")
      .join(deg.select(col("id").as("v"), col("deg").as("dv")), "v")
      .select(
        when(
          col("du") < col("dv") || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("src"), col("du").as("ks"), col("v").as("dst"), col("dv").as("kd")))
          .otherwise(
            struct(col("v").as("src"), col("dv").as("ks"), col("u").as("dst"), col("du").as("kd")))
          .as("e"))
      .select(col("e.src"), col("e.ks"), col("e.dst"), col("e.kd"))
    // wedges at each source: out-neighbor pairs, normalized by (deg, id)
    val w1 = oriented.select(col("src"), col("dst").as("b"), col("kd").as("kb"))
    val w2 = oriented.select(col("src"), col("dst").as("c"), col("kd").as("kc"))
    val wedges = w1
      .join(w2, Seq("src"))
      .filter(col("kb") < col("kc") || (col("kb") === col("kc") && col("b") < col("c")))
    val tris = wedges
      .join(
        oriented.select(col("src").as("b"), col("dst").as("c")),
        Seq("b", "c"))
      .select(col("src").as("x"), col("b").as("y"), col("c").as("z"))
    val triCnt = tris
      .select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tri"))
    deg
      .join(triCnt, Seq("id"), "left")
      .select(
        col("id"),
        col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") < 2, lit(0.0))
          .otherwise(
            lit(2.0) * coalesce(col("n_tri"), lit(0L)).cast("double") /
              (col("deg") * (col("deg") - 1)).cast("double"))
          .as("lcc"))
  }

  /** Degree assortativity (Newman, "Assortative mixing in networks",
    * PRL 2002): the Pearson correlation of endpoint degrees over the
    * symmetrized edge list — ONE number fingerprinting the graph's
    * structure: positive = hubs link hubs (collaboration-shaped),
    * negative = hubs link leaves (star/spam-shaped, the SEO-farm
    * signature on a link graph). Exact integer sums (n·Σxy − Σx·Σy
    * cross-multiplication, the crossCorrDaily discipline); the one
    * float step is the final IEEE sqrt+division, micro-rounded. A
    * degree-regular graph has zero variance — reported as assort6 = 0
    * by convention rather than a null. Edge hygiene as [[pageRank]]
    * (self-loops/dupes/nulls dropped). Overflow bound:
    * n_edges·deg_max² < 2^63. Returns one row:
    * (n_nodes, n_edges_directed, assort6).
    */
  def assortativity(pairs: DataFrame): DataFrame = {
    // one materialization feeds the degree table and the per-edge
    // join — without it each reference re-runs the upstream pair
    // pipeline (the triangleCounts storage rule)
    val edges = Checkpointing.truncate(
      pairs
        .select(col("id_a").as("src"), col("id_b").as("dst"))
        .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
        .filter(col("src") =!= col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct(),
      None, eager = true)
    val deg = edges.groupBy(col("src").as("id")).agg(count(lit(1)).as("deg"))
    val xy = edges
      .join(deg.select(col("id").as("src"), col("deg").as("x")), Seq("src"))
      .join(deg.select(col("id").as("dst"), col("deg").as("y")), Seq("dst"))
    val nNodes = broadcast(deg.agg(count(lit(1)).as("n_nodes")))
    xy
      .agg(
        count(lit(1)).as("n_edges_directed"),
        sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
      .crossJoin(nNodes)
      .select(
        col("n_nodes"),
        col("n_edges_directed"),
        when(
          // n = 0 first: the empty-graph agg row carries null sums,
          // and a null variance comparison would skip to a null
          // otherwise-branch instead of the 0 convention
          col("n_edges_directed") === 0L ||
            (col("n_edges_directed") * col("sxx") - col("sx") * col("sx")) <= 0L ||
            (col("n_edges_directed") * col("syy") - col("sy") * col("sy")) <= 0L,
          lit(0L))
          .otherwise(
            round(
              lit(1e6) *
                (col("n_edges_directed") * col("sxy") - col("sx") * col("sy")).cast("double") /
                sqrt(
                  (col("n_edges_directed") * col("sxx") - col("sx") * col("sx")).cast("double") *
                    (col("n_edges_directed") * col("syy") - col("sy") * col("sy")).cast("double")),
              0).cast("long"))
          .as("assort6"))
  }

  /** HITS hubs and authorities (Kleinberg, "Authoritative sources in
    * a hyperlinked environment", JACM 1999) over a DIRECTED edge
    * table (src, dst) — the mutually-recursive complement of
    * [[pageRank]]'s single centrality: a good hub points at good
    * authorities, a good authority is pointed at by good hubs. On the
    * corpus side this ranks a bipartite relation from both ends at
    * once (buyers↔suppliers, queries↔documents, sources↔entities).
    *
    * Same exact-integer discipline as pageRank — per round, all
    * BIGINT with truncating div (values non-negative, so truncation
    * == floor on both engines):
    * {{{
    *   a'(v) = Σ_{u→v} h(u);   a(v) = (a'(v) · unit) div Σ_w a'(w)
    *   h'(u) = Σ_{u→v} a(v);   h(u) = (h'(u) · unit) div Σ_w h'(w)
    * }}}
    * (L1 normalization — the integer-exact stand-in for the paper's
    * L2, same fixed-point direction). Overflow bound: deg_max · unit²
    * < 2^63, so the default unit 1e6 covers out/in-degrees to ~9e6;
    * shrink unit before raising a bigger graph. UNDERFLOW bound: the
    * truncating normalizer `score · unit div Σ` hands out ~unit total
    * mass per role, so a role with ≥ unit nodes would zero EVERY
    * score, the next normalizer sum would hit 0 and non-ANSI
    * div-by-zero would null (then na.fill-zero) the whole output —
    * the plan FAILS FAST (in-plan assert_true on the normalizer's
    * node count, the canary-guard idiom) when nodes-per-role ≥ unit;
    * raise unit for bigger graphs (jointly with the overflow bound
    * above). Node ids share ONE
    * universe — disambiguate a bipartite graph's sides upstream
    * (sign-flip one side) or the output conflates same-id rows.
    * Edge hygiene as pageRank: nulls dropped, duplicates collapsed;
    * self-loops are legal in a directed graph and kept.
    *
    * Scale shape: two (node, long) shuffles per iteration, each
    * normalizer a broadcast one-row agg (the documented 1-row
    * bounded-BNLJ class); edges materialized once
    * ([[Checkpointing]] contract). Returns (id, hub6, auth6) for
    * every node — zeros where a node has no out/in edges.
    */
  def hits(
      pairs: DataFrame,
      iters: Int = 5,
      unit: Long = 1000000L,
      checkpointDir: Option[String] = None): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    require(unit > 0L, "unit must be positive")
    val edges = pairs
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
      .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    val srcs = edges.select(col("src").as("id")).distinct()
    val dsts = edges.select(col("dst").as("id")).distinct()
    if (edges.isEmpty)
      return pairs.sparkSession
        .range(0)
        .select(col("id"), col("id").as("hub6"), col("id").as("auth6"))
    var h = srcs.select(col("id"), lit(unit).as("h"))
    var a: DataFrame = null
    var i = 0
    while (i < iters) {
      val aRaw = Checkpointing.truncate(
        edges
          .join(h.select(col("id").as("src"), col("h")), Seq("src"))
          .groupBy(col("dst").as("id"))
          .agg(sum(col("h")).as("ar")),
        checkpointDir,
        eager = false)
      a = aRaw
        .crossJoin(broadcast(aRaw.agg(sum(col("ar")).as("__sa"), count(lit(1)).as("__ca"))))
        .filter(
          assert_true(
            col("__ca") < lit(unit),
            concat(
              lit(s"hits: auth nodes must number < unit=$unit or the truncating " +
                "normalizer zeroes every score — raise unit; got "),
              col("__ca").cast("string"))).isNull)
        .select(col("id"), expr(s"CAST(CAST(ar AS DECIMAL(38,0)) * $unit div __sa AS BIGINT)").as("a"))
      val hRaw = Checkpointing.truncate(
        edges
          .join(a.select(col("id").as("dst"), col("a")), Seq("dst"))
          .groupBy(col("src").as("id"))
          .agg(sum(col("a")).as("hr")),
        checkpointDir,
        eager = false)
      h = hRaw
        .crossJoin(broadcast(hRaw.agg(sum(col("hr")).as("__sh"), count(lit(1)).as("__ch"))))
        .filter(
          assert_true(
            col("__ch") < lit(unit),
            concat(
              lit(s"hits: hub nodes must number < unit=$unit or the truncating " +
                "normalizer zeroes every score — raise unit; got "),
              col("__ch").cast("string"))).isNull)
        .select(col("id"), expr(s"CAST(CAST(hr AS DECIMAL(38,0)) * $unit div __sh AS BIGINT)").as("h"))
      i += 1
    }
    srcs
      .union(dsts)
      .distinct()
      .join(h.select(col("id"), col("h").as("hub6")), Seq("id"), "left")
      .join(a.select(col("id"), col("a").as("auth6")), Seq("id"), "left")
      .na
      .fill(0L, Seq("hub6", "auth6"))
  }

  /** Adamic–Adar link prediction (Adamic & Adar 2003) — the standard
    * upgrade of [[commonNeighbors]]: each shared neighbor counts
    * 1/ln(deg) instead of 1, so a promiscuous hub vouching for a
    * pair is discounted against a selective mutual friend.
    * Exactness: the per-MIDDLE weight round(1e6/ln(deg)) is computed
    * ONCE on the degree table (node-bounded) and the per-candidate
    * score is an exact integer SUM of those micro-weights — order-
    * free, the entropy-family discipline (ln's last-ulp variance
    * disappears in the rounding). A wedge middle has deg ≥ 2 by
    * construction, so ln > 0. Same wedge join and anti-join shape as
    * commonNeighbors. Returns (id_a, id_b, common, aa6) for
    * non-edges at distance 2, id_a < id_b.
    */
  /** Directed-graph reciprocity (Newman et al. 2002): the fraction of
    * directed edges whose reverse edge also exists — the mutual-
    * follow / mutual-citation fingerprint. Organic directed graphs
    * sit at characteristic levels (the web ~0.57, citation graphs
    * near 0, follower farms near 1.0), so a per-snapshot reciprocity
    * shift is a cheap structure-drift alarm next to [[assortativity]].
    *
    * Exactness: edges are deduplicated and self-loops dropped (a
    * self-loop is trivially its own reverse — counting it inflates
    * the score), reciprocated edges found by ONE self-join on the
    * flipped key, ratio published in exact ppm (one truncating
    * division). Returns one row (n_edges, n_reciprocated,
    * reciprocity_ppm); an empty edge set returns n_edges = 0 with a
    * 0 score (no division).
    *
    * Scale shape: one distinct, one equi-self-join on (dst, src) —
    * both plain shuffles on the edge key; no iteration.
    */
  def reciprocity(pairs: DataFrame): DataFrame = {
    // edge-table persisted: the semi-join probes it twice and the
    // total counts it once — one distinct pass, zero re-derives
    val edges = pairs
      .select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rec = edges
      .join(
        edges.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"),
        "left_semi")
    edges
      .agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(rec.agg(count(lit(1)).as("n_reciprocated"))))
      .select(
        col("n_edges"),
        col("n_reciprocated"),
        expr(
          """CASE WHEN n_edges = 0 THEN CAST(0 AS BIGINT)
            |ELSE CAST(CAST(1000000 AS DECIMAL(38,0)) * n_reciprocated div n_edges AS BIGINT) END""".stripMargin)
          .as("reciprocity_ppm"))
  }

  def adamicAdar(pairs: DataFrame): DataFrame = {
    val undirected = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // materialized once: referenced by the degree table, both wedge
    // sides and the existing-edge anti-join (×4 otherwise)
    val edges = Checkpointing.truncate(
      undirected
        .union(undirected.select(col("b").as("a"), col("a").as("b")))
        .distinct(),
      None, eager = true)
    val deg = edges.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    // deg-1 leaves can never be wedge middles, and ln(1) = 0 would
    // divide by zero under ANSI — the weight table holds middles only
    val w = deg
      .filter(col("deg") >= 2L)
      .select(
        col("id"),
        round(lit(1e6) / log(col("deg").cast("double")), 0).cast("long").as("w6"))
    val wedges = edges.select(col("a").as("u"), col("b").as("mid"))
      .join(edges.select(col("a").as("mid"), col("b").as("v")), Seq("mid"))
      .filter(col("u") < col("v"))
      .join(w.select(col("id").as("mid"), col("w6")), Seq("mid"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"), sum(col("w6")).as("aa6"))
    wedges
      .join(
        edges.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"),
        "left_anti")
      .select(col("u").as("id_a"), col("v").as("id_b"), col("common"), col("aa6"))
  }

  /** Common-neighbor link prediction over an undirected pair graph:
    * for every NON-edge (a, b) at distance 2, the shared-neighbor
    * count and the neighborhood Jaccard in exact ppm — the "these
    * two docs aren't flagged as dups but share `common` dup-partners"
    * candidate feed (a near-dup detector's threshold miss surfaces
    * here before a human ever reviews it). Shape: symmetrize edges,
    * self-join on the shared middle node (the [[triangleCounts]]
    * wedge join — bounded by Σ deg², the graph's wedge count, never
    * docs²), anti-join existing edges away, degrees re-aggregated
    * from the EDGE table. jac6 = 1e6·common div (deg_a + deg_b −
    * common), one truncating division per candidate. Returns
    * (id_a, id_b, common, jac6) with id_a < id_b; edge hygiene as
    * [[pageRank]] (nulls dropped, duplicates collapsed, self-loops
    * ignored for neighborhoods).
    */
  def commonNeighbors(pairs: DataFrame): DataFrame = {
    val undirected = pairs
      .select(col("id_a").cast("long").as("a"), col("id_b").cast("long").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
    // materialized once: degree table, both wedge sides and the
    // anti-join all read it (×5 otherwise)
    val edges = Checkpointing.truncate(
      undirected
        .union(undirected.select(col("b").as("a"), col("a").as("b")))
        .distinct(),
      None, eager = true)
    val deg = edges.groupBy(col("a").as("id")).agg(count(lit(1)).as("deg"))
    val wedges = edges.select(col("a").as("u"), col("b").as("mid"))
      .join(edges.select(col("a").as("mid"), col("b").as("v")), Seq("mid"))
      .filter(col("u") < col("v"))
      .groupBy(col("u"), col("v"))
      .agg(count(lit(1)).as("common"))
    wedges
      .join(
        edges.select(col("a").as("u"), col("b").as("v")),
        Seq("u", "v"),
        "left_anti")
      .join(deg.select(col("id").as("u"), col("deg").as("__da")), Seq("u"))
      .join(deg.select(col("id").as("v"), col("deg").as("__db")), Seq("v"))
      .select(
        col("u").as("id_a"),
        col("v").as("id_b"),
        col("common"),
        expr("CAST(CAST(1000000 AS DECIMAL(38,0)) * common div (__da + __db - common) AS BIGINT)").as("jac6"))
  }

  /** Newman modularity of a community assignment over an undirected
    * pair graph (Newman & Girvan 2004) — the quality score that
    * grades [[labelPropagation]]'s (or any) partition: per community,
    *
    *   term = e_c/m − (d_c / 2m)²
    *
    * (intra-edge share minus the share a degree-preserving random
    * rewiring would give it); Q = Σ_c term ∈ [−0.5, 1], ≈ 0 means
    * the partition is no better than chance. Emitted per community
    * (community, n_nodes, intra_edges, degree_sum, term6) ordered by
    * community — the analyst reads Σ term6 as Q6 and the per-row
    * table names WHICH communities carry the structure.
    *
    * Exactness: both shares are truncating integer divisions of
    * NONNEGATIVE operands in micro-units (d_c² and 4m² staged in
    * DECIMAL(38,0) — degree sums square past 2^63 at corpus scale),
    * subtracted after — bit-identical in both engines. Scale shape:
    * edge hygiene + two edge-stream hash-aggregates (intra count,
    * degree count) + a node-bounded label join; the community grid
    * is the only thing after the shuffles. Nodes enter by edge
    * incidence (labelPropagation's domain); labels covering nodes
    * absent from the graph contribute nothing.
    */
  def modularity(pairs: DataFrame, labels: DataFrame): DataFrame = {
    // one materialization feeds intra, degrees and the total — the
    // triangleCounts storage rule: without it each of the three
    // references re-runs the whole upstream pair pipeline (for the
    // co-purchase consumers that is the corpus self-join, ×3)
    val e = Checkpointing.truncate(
      pairs
        .filter(
          col("id_a").isNotNull && col("id_b").isNotNull
            && col("id_a") =!= col("id_b"))
        .select(
          least(col("id_a"), col("id_b")).as("id_a"),
          greatest(col("id_a"), col("id_b")).as("id_b"))
        .distinct(),
      None, eager = true)
    // labels referenced by intra (×2) and the degree rollup — for the
    // grade-the-action consumers the label frame is itself a move
    // pipeline, so truncate it too
    val lab = Checkpointing.truncate(
      labels.select(col("id"), col("community")), None, eager = true)
    val intra = e
      .join(lab.select(col("id").as("id_a"), col("community").as("__ca")), "id_a")
      .join(lab.select(col("id").as("id_b"), col("community").as("__cb")), "id_b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(count(lit(1)).as("intra_edges"))
    val deg = e.select(col("id_a").as("id"))
      .unionAll(e.select(col("id_b").as("id")))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__deg"))
      .join(lab, "id")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__deg")).as("degree_sum"))
    val tot = broadcast(e.agg(count(lit(1)).as("__m")))
    deg
      .join(intra, Seq("community"), "left")
      .na.fill(0L, Seq("intra_edges"))
      .crossJoin(tot)
      .select(
        col("community"), col("n_nodes"), col("intra_edges"), col("degree_sum"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * intra_edges) div __m
            |  - (CAST(1000000 AS DECIMAL(38,0)) * degree_sum * degree_sum)
            |    div (CAST(4 AS DECIMAL(38,0)) * __m * __m) AS BIGINT)"""
            .stripMargin).as("term6"))
      .orderBy(col("community"))
  }

  /** The ACTION on [[modularity]]'s grade — the T248/T253 lifecycle
    * discipline applied to the partition family: one Louvain phase-1
    * move (Blondel et al., J. Stat. Mech. 2008), the single
    * strictly-best relabel across every (node, neighbor-community)
    * pair, applied only when its gain is strictly positive. ONE move,
    * not a synchronous sweep, deliberately: parallel simultaneous
    * moves can oscillate (two adjacent nodes swapping into each
    * other's old communities lowers Q), while the argmax move is
    * MONOTONE by construction — Q after ≥ Q before, exactly the
    * provable grade → action → re-grade contract the IVF and PQ
    * refits carry.
    *
    * Exact integer gains, no division anywhere: moving i from its
    * community a to a neighbor community c changes Q by
    * ΔQ·2m² = 2m·(k_in(c) − k_in(a)) − k_i·(Σtot(c) + k_i − Σtot(a)),
    * staged in DECIMAL(38,0) (2m·k_in passes 2^63 near 1e13 edges —
    * the DIVSWEEP discipline); argmax ties break to the smaller node
    * id then the smaller target community (both engines). Everything
    * is hash aggregates over the directed edge list plus 1-row
    * broadcast frames (m, the winning move) — candidates are
    * (node, neighbor-community) pairs, bounded by the directed edge
    * count, never communities × nodes.
    *
    * Returns the relabeled (id, community) — unchanged when no move
    * strictly improves (the fixed-point read).
    */
  def louvainBestMove(pairs: DataFrame, labels: DataFrame): DataFrame = {
    // single-move surface gets the louvainMoves storage rule too: e
    // feeds the directed frame (×2), the total and the degrees —
    // truncate once so the upstream pair pipeline runs once, and
    // truncate the labels (the move step references them four times)
    val e = Checkpointing.truncate(louvainEdgeHygiene(pairs), None, eager = true)
    val d = e.select(col("id_a").as("src"), col("id_b").as("dst"), lit(1L).as("w"))
      .unionAll(e.select(col("id_b").as("src"), col("id_a").as("dst"), lit(1L).as("w")))
    val lab = Checkpointing.truncate(
      labels.select(col("id"), col("community")), None, eager = true)
    val m = broadcast(e.agg(count(lit(1)).as("__m")))
    val deg = d.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
    louvainMoveStep(d, deg, m, lab)
  }

  /** [[louvainBestMove]] on a WEIGHTED, possibly self-looped graph —
    * the phase-2 optimization step run on [[louvainCoarsen]]'s
    * output: from identity labels, a strictly-positive move MERGES
    * two communities that share more weight than the degree-
    * preserving chance level (gain·2W² = 2W·w_cd − k_c·k_d > 0), and
    * iterating move → re-grade builds the Louvain hierarchy on a
    * community-count-sized graph instead of the corpus edge list.
    * Self-loop mass travels WITH its node (it cancels in every gain
    * difference, so kin sums exclude loops while k and Σtot include
    * them at 2w — the A_ii = 2w convention [[modularityWeighted]]
    * grades by). Hygiene is [[modularityWeighted]]'s multigraph
    * collapse. Gains stage in DECIMAL(38,0) (2W·w products square
    * corpus-scale weights); ties and the null-best identity are
    * [[louvainBestMove]]'s.
    */
  def louvainBestMoveWeighted(pairsW: DataFrame, labels: DataFrame): DataFrame = {
    val e = Checkpointing.truncate(weightedEdgeHygiene(pairsW), None, eager = true)
    val (d, deg, m) = weightedMoveFrames(e)
    louvainMoveStep(d, deg, m,
      Checkpointing.truncate(
        labels.select(col("id"), col("community")), None, eager = true))
  }

  /** [[louvainMoves]] on the weighted self-looped graph — K bounded
    * phase-2 merge passes on [[louvainCoarsen]]'s output, the step a
    * hierarchy ITERATES (each pass merges the most above-chance
    * community pair; the next pass sees the merged Σtot): same
    * monotone-composition and absorbing-fixed-point contract, same
    * storage discipline (edge/degree frames once, relabels
    * lineage-truncated), and the coarse graph keeps the whole loop
    * community-bounded — SCALE_r12 wave 4 measures the single move
    * flat to x100 for exactly this reason.
    */
  def louvainMovesWeighted(
      pairsW: DataFrame,
      labels: DataFrame,
      moves: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(moves >= 1 && moves <= 8,
      "louvainMovesWeighted: moves must be in [1, 8] — run larger merge budgets as " +
        "caller loops with a re-grade between passes")
    val e = weightedEdgeHygiene(pairsW)
      .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    val (d, degRaw, m) = weightedMoveFrames(e)
    val deg = Checkpointing.truncate(degRaw, checkpointDir, eager = true)
    var lab = labels.select(col("id"), col("community"))
    var i = 0
    while (i < moves) {
      lab = Checkpointing.truncate(
        louvainMoveStep(d, deg, m, lab), checkpointDir, eager = false)
      i += 1
    }
    lab
  }

  /** [[modularityWeighted]]'s multigraph collapse as a shared frame:
    * nulls and nonpositive weights out, duplicate and reversed
    * duplicates SUM on the canonical (min, max) row, self-loops kept.
    */
  private def weightedEdgeHygiene(pairsW: DataFrame): DataFrame =
    pairsW
      .filter(
        col("id_a").isNotNull && col("id_b").isNotNull
          && col("w").isNotNull && col("w") > 0L)
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("w").cast("long").as("w"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w")).as("w"))

  /** Move-invariant frames off a hygienic weighted edge set: directed
    * non-loop edges, weighted degrees (self-loops folded at 2w), the
    * 1-row total-weight broadcast.
    */
  private def weightedMoveFrames(e: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val nl = e.filter(col("id_a") =!= col("id_b"))
    val d = nl.select(col("id_a").as("src"), col("id_b").as("dst"), col("w"))
      .unionAll(nl.select(col("id_b").as("src"), col("id_a").as("dst"), col("w")))
    val m = broadcast(e.agg(sum(col("w")).as("__m")))
    val deg = d.select(col("src").as("id"), col("w"))
      .unionAll(
        e.filter(col("id_a") === col("id_b"))
          .select(col("id_a").as("id"), (col("w") * 2).as("w")))
      .groupBy(col("id"))
      .agg(sum(col("w")).as("k"))
    (d, deg, m)
  }

  /** K bounded Louvain phase-1 moves — [[louvainBestMove]] iterated,
    * with the iterative-operator storage discipline ([[pageRank]]'s):
    * the directed edge frame and the degree table are derived ONCE
    * and materialized (they are move-invariant), and each move's
    * relabel truncates its lineage so move k builds on stored labels,
    * not on a plan that re-expands every earlier move's candidate
    * scan per downstream reference. Each move is the strictly-best
    * positive-gain relabel, so the composition is MONOTONE
    * (Q_0 ≤ Q_1 ≤ … ≤ Q_K) and a mid-loop fixed point absorbs —
    * once no strictly-positive move exists, every later move is the
    * identity (the null `best` broadcast relabels nothing).
    *
    * `moves` is deliberately bounded: each move costs one full
    * (node, neighbor-community) candidate scan, so phase-1
    * "to convergence" at 100 TB is a caller LOOP over bounded passes
    * with its own stopping read (the re-grade), not an unbounded
    * plan — the K-round labelPropagation / pageRank posture.
    * `checkpointDir` picks executor-local vs reliable truncation
    * ([[Checkpointing]] for the executor-loss tradeoff).
    */
  def louvainMoves(
      pairs: DataFrame,
      labels: DataFrame,
      moves: Int,
      checkpointDir: Option[String] = None): DataFrame = {
    require(moves >= 1 && moves <= 8,
      "louvainMoves: moves must be in [1, 8] — each move is a full candidate scan; " +
        "run larger budgets as caller loops with a re-grade between passes")
    val e = louvainEdgeHygiene(pairs)
      .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    val d = e.select(col("id_a").as("src"), col("id_b").as("dst"), lit(1L).as("w"))
      .unionAll(e.select(col("id_b").as("src"), col("id_a").as("dst"), lit(1L).as("w")))
    val m = broadcast(e.agg(count(lit(1)).as("__m")))
    val deg = d.groupBy(col("src").as("id")).agg(sum(col("w")).as("k"))
      .transform(Checkpointing.truncate(_, checkpointDir, eager = true))
    var lab = labels.select(col("id"), col("community"))
    var i = 0
    while (i < moves) {
      lab = Checkpointing.truncate(
        louvainMoveStep(d, deg, m, lab), checkpointDir, eager = false)
      i += 1
    }
    lab
  }

  /** Shared edge hygiene for the Louvain moves: nulls and self-loops
    * out, duplicates and reversed duplicates collapsed to one
    * canonical (min, max) row — enforced, not assumed, exactly as
    * [[modularity]] and [[pageRank]] do.
    */
  private def louvainEdgeHygiene(pairs: DataFrame): DataFrame =
    pairs
      .filter(
        col("id_a").isNotNull && col("id_b").isNotNull
          && col("id_a") =!= col("id_b"))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .distinct()

  /** One best-move relabel over precomputed move-invariant frames:
    * `d` = directed non-loop edges (src, dst, w) — unit weights for
    * the unweighted surfaces, coarse weights for
    * [[louvainBestMoveWeighted]] — `deg` = (id, k) (weighted degree,
    * self-loops already folded at 2w by the weighted builder), `m` =
    * 1-row broadcast total edge weight, `lab` = (id, community). The
    * gain arithmetic, tie-breaks and null-best identity are
    * [[louvainBestMove]]'s — that public single-move surface is this
    * step over freshly derived unit-weight frames.
    */
  private def louvainMoveStep(
      d: DataFrame,
      deg: DataFrame,
      m: DataFrame,
      lab: DataFrame): DataFrame = {
    val tot = deg.join(lab, "id").groupBy(col("community")).agg(sum(col("k")).as("s"))
    val kin = d
      .join(lab.select(col("id").as("dst"), col("community").as("cn")), "dst")
      .groupBy(col("src").as("id"), col("cn"))
      .agg(sum(col("w")).as("kin"))
    val node = lab
      .join(deg, "id")
      .join(
        kin.select(col("id"), col("cn").as("community"), col("kin").as("kin_a")),
        Seq("id", "community"),
        "left")
      .na.fill(0L, Seq("kin_a"))
      .join(tot.select(col("community"), col("s").as("s_a")), Seq("community"))
    val cand = kin
      .join(node, Seq("id"))
      .filter(col("cn") =!= col("community"))
      .join(tot.select(col("community").as("cn"), col("s").as("s_c")), Seq("cn"))
      .crossJoin(m)
      .withColumn(
        "gain",
        expr(
          """CAST(2 AS DECIMAL(38,0)) * __m * (kin - kin_a)
            |  - CAST(k AS DECIMAL(38,0)) * (s_c + k - s_a)""".stripMargin))
    val best = broadcast(
      cand
        .filter(col("gain") > 0)
        .agg(
          max(struct(
            col("gain").as("g"),
            (-col("id")).as("ni"),
            (-col("cn")).as("nc"))).as("b")))
    lab
      .crossJoin(best)
      .select(
        col("id"),
        when(col("b").isNotNull && col("id") === -col("b.ni"), -col("b.nc"))
          .otherwise(col("community"))
          .as("community"))
  }

  /** Louvain PHASE 2 — community aggregation (Blondel et al. 2008,
    * §2): collapse each community to one super-node; inter-community
    * edge weights are the counts of original edges between the two
    * communities, and each super-node carries a SELF-LOOP weighted by
    * its community's intra-edge count. This is THE scale move for
    * community detection on a 100 TB graph: after a phase-1 pass the
    * coarse graph is orders of magnitude smaller than the edge list,
    * and every further pass runs on it — one hash aggregate over the
    * labeled edge stream, never an all-pairs anything.
    *
    * Exactness contract (the reason the self-loop convention
    * matters): with labels covering every edge-incident node,
    * [[modularityWeighted]] of the coarse graph under IDENTITY labels
    * reproduces [[modularity]] of the original partition ROW FOR ROW
    * — e_c becomes the self-loop weight, d_c the weighted degree
    * (self-loops counting twice), m the total coarse weight. Edges
    * with an unlabeled endpoint are dropped (labels are a cover by
    * contract; the closure/labelprop producers cover by
    * construction). Returns (id_a, id_b, w) with id_a <= id_b,
    * ordered — self-loops are the id_a = id_b rows.
    */
  def louvainCoarsen(pairs: DataFrame, labels: DataFrame): DataFrame = {
    val e = louvainEdgeHygiene(pairs)
    val lab = labels.select(col("id"), col("community"))
    e
      .join(lab.select(col("id").as("id_a"), col("community").as("__ca")), "id_a")
      .join(lab.select(col("id").as("id_b"), col("community").as("__cb")), "id_b")
      .select(
        least(col("__ca"), col("__cb")).as("id_a"),
        greatest(col("__ca"), col("__cb")).as("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("w"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** [[louvainCoarsen]] for a graph that is ALREADY weighted and
    * self-looped — the recursion step that makes the hierarchy go
    * DEEPER: level-k's merged partition coarsens into the level-k+1
    * super-graph by summing edge weights into canonical community
    * pairs (a node's self-loop folds into its community's — weight
    * is conserved level to level, so the total W and every grade
    * denominator are invariant across the whole hierarchy). Same
    * exactness contract as the unweighted coarsen:
    * [[modularityWeighted]] of the output under identity labels
    * reproduces the input graph's weighted grade row for row.
    * Hygiene is [[modularityWeighted]]'s multigraph collapse.
    */
  def louvainCoarsenWeighted(pairsW: DataFrame, labels: DataFrame): DataFrame = {
    val e = weightedEdgeHygiene(pairsW)
    val lab = labels.select(col("id"), col("community"))
    e
      .join(lab.select(col("id").as("id_a"), col("community").as("__ca")), "id_a")
      .join(lab.select(col("id").as("id_b"), col("community").as("__cb")), "id_b")
      .select(
        least(col("__ca"), col("__cb")).as("id_a"),
        greatest(col("__ca"), col("__cb")).as("id_b"),
        col("w"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(sum(col("w")).as("w"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** [[modularity]] over a WEIGHTED undirected graph (id_a, id_b, w)
    * that may carry SELF-LOOPS — the coarse-graph grade closing the
    * phase-2 loop: Q = Σ_c (e_c/W − (d_c/2W)²) with e_c the
    * intra-community weight (self-loops counted once), d_c the
    * weighted degree sum (a self-loop contributes 2w to its node,
    * the A_ii = 2w_ii convention), W the total edge weight. Unit
    * weights with no self-loops reduce EXACTLY to [[modularity]] —
    * same micro-unit truncating divisions, same DECIMAL(38,0)
    * staging of d_c² and 4W² (weighted degree sums square past 2^63
    * even sooner than counts). Hygiene is [[pageRankWeighted]]'s
    * multigraph collapse: nulls and nonpositive weights out,
    * duplicate and reversed-duplicate rows SUM their weights
    * (canonicalized to (min, max) first so a reversed duplicate
    * can't double-count); self-loops are kept, not dropped — they
    * are the coarse graph's intra mass. Output shape mirrors
    * [[modularity]]: (community, n_nodes, intra_w, degree_sum,
    * term6) ordered by community.
    */
  def modularityWeighted(pairsW: DataFrame, labels: DataFrame): DataFrame = {
    // same storage rule as [[modularity]]: e feeds intra, degrees and
    // the total, lab feeds intra (×2) and the rollup — materialize
    // both once instead of re-expanding the upstream pipelines
    val e = Checkpointing.truncate(weightedEdgeHygiene(pairsW), None, eager = true)
    val lab = Checkpointing.truncate(
      labels.select(col("id"), col("community")), None, eager = true)
    val intra = e
      .join(lab.select(col("id").as("id_a"), col("community").as("__ca")), "id_a")
      .join(lab.select(col("id").as("id_b"), col("community").as("__cb")), "id_b")
      .filter(col("__ca") === col("__cb"))
      .groupBy(col("__ca").as("community"))
      .agg(sum(col("w")).as("intra_w"))
    // weighted degree: each endpoint of a non-loop edge gains w; a
    // self-loop gains its single endpoint 2w (emitted on both unions)
    val deg = e.select(col("id_a").as("id"), col("w"))
      .unionAll(e.select(col("id_b").as("id"), col("w")))
      .groupBy(col("id"))
      .agg(sum(col("w")).as("__deg"))
      .join(lab, "id")
      .groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("__deg")).as("degree_sum"))
    val tot = broadcast(e.agg(sum(col("w")).as("__m")))
    deg
      .join(intra, Seq("community"), "left")
      .na.fill(0L, Seq("intra_w"))
      .crossJoin(tot)
      .select(
        col("community"), col("n_nodes"), col("intra_w"), col("degree_sum"),
        expr(
          """CAST((CAST(1000000 AS DECIMAL(38,0)) * intra_w) div __m
            |  - (CAST(1000000 AS DECIMAL(38,0)) * degree_sum * degree_sum)
            |    div (CAST(4 AS DECIMAL(38,0)) * __m * __m) AS BIGINT)"""
            .stripMargin).as("term6"))
      .orderBy(col("community"))
  }
}
