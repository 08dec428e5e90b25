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
    * Returns (id, rank_units BIGINT, rank DOUBLE = units/unit).
    */
  def pageRank(
      pairs: DataFrame,
      iters: Int = 5,
      damp: Long = 85L,
      unit: Long = 1000000000000L,
      checkpointDir: Option[String] = None): DataFrame = {
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
    val base = ((100L - damp) * unit / 100L) / n
    var ranks = deg.select(col("id"), lit(unit / n).as("r"))
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
}
