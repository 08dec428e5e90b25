package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Graph.pageRank pinned against an independent driver-side
  * implementation of the same integer recurrence, plus the structural
  * properties the fixed-point discipline promises.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** Reference: the identical recurrence, computed sequentially on
    * scala.collection Maps (no Spark), for an undirected edge list.
    */
  private def refPageRank(
      pairs: Seq[(Long, Long)],
      iters: Int = 5,
      damp: Long = 85L,
      unit: Long = 1000000000000L): Map[Long, Long] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val n = adj.size.toLong
    val base = ((100L - damp) * unit / 100L) / n
    var r = adj.keys.map(_ -> unit / n).toMap
    (1 to iters).foreach { _ =>
      val contrib = r.map { case (u, ru) => u -> (ru * damp / 100L / deg(u)) }
      r = adj.keys.map { v =>
        v -> (base + adj(v).map(contrib).sum)
      }.toMap
    }
    r
  }

  private val pathAndTriangle: Seq[(Long, Long)] =
    // a 4-path (1-2-3-4) and a triangle (10-11-12) sharing no nodes
    Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L), (10L, 12L))

  test("pageRank matches the sequential integer recurrence exactly") {
    val pairs = pathAndTriangle.toDF("id_a", "id_b")
    val got = Graph.pageRank(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(pathAndTriangle))
  }

  test("pageRank is partition-invariant (exact, not approximately)") {
    val base = Graph.pageRank(pathAndTriangle.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Seq(1, 3, 7).foreach { p =>
      val got = Graph.pageRank(pathAndTriangle.toDF("id_a", "id_b").repartition(p))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == base, s"diverged at $p partitions")
    }
  }

  test("pageRank structure: symmetric nodes tie, hubs dominate, mass ~conserved") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L))
    val got = Graph.pageRank(star.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // leaves are structurally identical -> exactly equal ranks
    assert(Set(got(2L), got(3L), got(4L), got(5L)).size == 1)
    // the hub outranks every leaf
    assert(got(1L) > got(2L))
    // integer truncation only LOSES mass, and only a little
    val unit = 1000000000000L
    val total = got.values.sum
    assert(total <= unit && total > unit * 99L / 100L)
  }

  test("pageRank on an empty pair table returns an empty frame") {
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    assert(Graph.pageRank(empty).collect().isEmpty)
  }

  test("pageRank edge hygiene: duplicate, reversed-duplicate and self-loop pairs don't skew ranks") {
    // same graph as the reference run, plus junk a messy pair feed
    // could carry: an exact duplicate, a reversed duplicate, a
    // self-loop — none may move degree or contributions
    val dirty = pathAndTriangle ++ Seq((1L, 2L), (2L, 1L), (3L, 3L))
    val got = Graph.pageRank(dirty.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refPageRank(pathAndTriangle))
  }

  test("triangleCounts: known graph, exact counts and lcc") {
    // K3 on {1,2,3} plus pendant 4 attached to 3
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L))
    val got = Graph.triangleCounts(edges.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(got(1L) == ((2L, 1L, 1.0)))
    assert(got(2L) == ((2L, 1L, 1.0)))
    assert(got(3L) == ((3L, 1L, 1.0 / 3.0)))
    assert(got(4L) == ((1L, 0L, 0.0)))
  }

  test("triangleCounts edge hygiene: duplicates, reversed duplicates and self-loops don't count") {
    val dirty = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L),
      (2L, 1L), (1L, 2L), (4L, 4L))
    val clean = Graph.triangleCounts(
      Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b"))
      .collect().map(r => r.toSeq).toSet
    val got = Graph.triangleCounts(dirty.toDF("id_a", "id_b"))
      .collect().map(r => r.toSeq).toSet
    assert(got == clean)
  }

  test("triangleCounts: hub star has zero triangles at any degree skew") {
    // star K1,20: the naive id-ordered wedge join would explode 190
    // wedges at the hub; whatever the plan does, the answer is zero
    val star = (2L to 21L).map(i => (1L, i))
    val got = Graph.triangleCounts(star.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.values.forall(_ == 0L) && got(1L) == 0L && got.size == 21)
  }

  test("bfsDistances: chain depths, closest-seed-wins, depth cap, disconnected absent") {
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
    val got = Graph.bfsDistances(chain.toDF("id_a", "id_b"), Seq(1L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // depth cap 3: node 5 (4 hops) absent; 10/11 disconnected absent
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    val two = Graph.bfsDistances(chain.toDF("id_a", "id_b"), Seq(1L, 5L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // two seeds: every node takes its CLOSEST seed's distance
    assert(two == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
    // isolated seed exits after its first empty frontier, dist-0 row kept
    val iso = Graph.bfsDistances(chain.toDF("id_a", "id_b"), Seq(99L).toDF("id"), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(iso == Map(99L -> 0L))
  }

  test("kCore: pendant peels off in one round, the K4 core survives with its degrees") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val got = Graph.kCore(edges.toDF("id_a", "id_b"), k = 3, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("kCore: cascading peel — a chain dissolves under k=2, one endpoint pair per round") {
    // path 1-2-3-4-5: round 1 drops endpoints 1 and 5 (edges 2-3,
    // 3-4 remain); round 2 drops 2 and 4 and with them every edge
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val after1 = Graph.kCore(chain.toDF("id_a", "id_b"), k = 2, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(after1 == Set(2L, 3L, 4L))
    val after2 = Graph.kCore(chain.toDF("id_a", "id_b"), k = 2, rounds = 2)
      .collect()
    assert(after2.isEmpty)
  }

  test("pageRankWeighted: hand-computed proportional split; multigraph rows collapse") {
    // A(1)-B(2) w9, A-C(3) w1; damp 50, unit 100, 1 iter:
    // base 16, r0 33, m 16; A sends 14/1, B and C send 16 back
    // -> A 48, B 30, C 17. The w9 edge arrives as 4+5 duplicate
    // rows (multigraph collapse) plus a self-loop to ignore.
    val edges = Seq((1L, 2L, 4L), (1L, 2L, 5L), (1L, 3L, 1L), (1L, 1L, 7L))
      .toDF("id_a", "id_b", "w")
    val got = Graph.pageRankWeighted(edges, iters = 1, damp = 50L, unit = 100L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 48L, 2L -> 30L, 3L -> 17L))
  }

  test("pageRankWeighted: equal weights reproduce plain pageRank exactly") {
    val pairs = pathAndTriangle.toDF("id_a", "id_b")
    val plain = Graph.pageRank(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val weighted = Graph.pageRankWeighted(pairs.withColumn("w", lit(1L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(weighted == plain)
  }

  test("personalized pageRank: hand-computed seed restart on a 2-node path") {
    // edges 1-2, seed {1}, damp 50, unit 100: base = 50 to the seed
    // r0: 1 -> 100, 2 -> 0
    // iter1: contrib 1->2 = 50; ranks: 1 = 50+0, 2 = 0+50
    // iter2: contrib both 25;    ranks: 1 = 50+25, 2 = 0+25
    val pair = Seq((1L, 2L)).toDF("id_a", "id_b")
    val seeds = Seq(Tuple1(1L)).toDF("id")
    val r2 = Graph.pageRank(pair, iters = 2, damp = 50L, unit = 100L, seeds = Some(seeds))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 75L, 2L -> 25L))
  }

  test("personalized pageRank: off-graph seeds are excluded, all-off-graph seeds fail fast") {
    val pair = Seq((1L, 2L)).toDF("id_a", "id_b")
    // seed 99 has no edges: excluded; seed 1 carries all the teleport
    val r = Graph.pageRank(
      pair, iters = 1, damp = 50L, unit = 100L,
      seeds = Some(Seq(Tuple1(1L), Tuple1(99L)).toDF("id")))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r == Map(1L -> 50L, 2L -> 50L))
    val ex = intercept[IllegalArgumentException] {
      Graph.pageRank(pair, seeds = Some(Seq(Tuple1(99L)).toDF("id")))
    }
    assert(ex.getMessage.contains("in-graph seed"))
  }

  test("labelPropagation: bridged triangles split into two min-label communities") {
    // triangles {1,2,3} and {4,5,6} with bridge 3-4; hand-unrolled 4
    // rounds end with {1,2,3}->1 and {4,5,6}->3. Hygiene rows (self
    // loop, duplicate, reversed duplicate) must not change the vote.
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L),
      (1L, 1L), (2L, 1L), (1L, 2L))
    val got = Graph.labelPropagation(edges.toDF("id_a", "id_b"), rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 3L, 5L -> 3L, 6L -> 3L))
  }

  test("labelPropagation: two-node oscillation is deterministic per round count") {
    val pair = Seq((1L, 2L)).toDF("id_a", "id_b")
    val r1 = Graph.labelPropagation(pair, rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L)) // swapped after one round
    val r2 = Graph.labelPropagation(pair, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L)) // and back
  }

  test("assortativity: star is exactly -1e6, regular cycle is 0 by convention") {
    // star K1,3: every edge joins deg-3 to deg-1 -> Pearson exactly -1
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("id_a", "id_b")
    val s = Graph.assortativity(star).head()
    assert((s.getLong(0), s.getLong(1), s.getLong(2)) == ((4L, 6L, -1000000L)))
    // 4-cycle: all degrees 2 -> zero variance -> 0 by convention
    val cyc = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("id_a", "id_b")
    assert(Graph.assortativity(cyc).head().getLong(2) == 0L)
    // empty graph: (0, 0, 0), never a null coefficient
    val e = Graph.assortativity(star.filter($"id_a" > 100)).head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("hits: pinned against the sequential integer recurrence; hygiene; empty-role zeros") {
    // bipartite 3 buyers x 2 suppliers: u1->{-1,-2}, u2->{-1}, u3->{-1}
    // -1 is pointed at by everyone, -2 only by the hubbiest buyer
    val edges = Seq(
      (1L, -1L), (1L, -2L), (2L, -1L), (3L, -1L),
      (1L, -1L) // duplicate collapses
    ).toDF("src", "dst")
    // sequential reference of the identical recurrence
    val out = Map(1L -> Seq(-1L, -2L), 2L -> Seq(-1L), 3L -> Seq(-1L))
    val inn = Map(-1L -> Seq(1L, 2L, 3L), -2L -> Seq(1L))
    val unit = 1000000L
    var h: Map[Long, Long] = out.keys.map(_ -> unit).toMap
    var a: Map[Long, Long] = Map.empty
    (1 to 5).foreach { _ =>
      val ar = inn.map { case (v, us) => v -> us.map(h).sum }
      val sa = ar.values.sum
      a = ar.map { case (v, x) => v -> x * unit / sa }
      val hr = out.map { case (u, vs) => u -> vs.map(a).sum }
      val sh = hr.values.sum
      h = hr.map { case (u, x) => u -> x * unit / sh }
    }
    val got = Graph.hits(edges, 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, -1L, -2L))
    out.keys.foreach(u => assert(got(u) == ((h(u), 0L)), s"hub $u"))
    inn.keys.foreach(v => assert(got(v) == ((0L, a(v))), s"auth $v"))
    // the shape HITS promises: -1 out-authorities -2, 1 out-hubs 2 and 3
    assert(got(-1L)._2 > got(-2L)._2)
    assert(got(1L)._1 > got(2L)._1 && got(2L)._1 == got(3L)._1)
  }

  test("hits fails fast when a role's node count reaches unit (normalizer underflow guard)") {
    // 3 auth nodes with unit=3: the truncating normalizer would hand
    // out < 1 mass per node, zeroing every score -> guard must throw
    val edges = Seq((1L, -1L), (1L, -2L), (1L, -3L)).toDF("src", "dst")
    def chain(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage).mkString(" | ")
    val e = intercept[Exception](Graph.hits(edges, 2, unit = 3L).collect())
    assert(chain(e).contains("unit"))
    // a big-enough unit runs clean on the same graph
    val ok = Graph.hits(edges, 2, unit = 1000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(ok(1L)._1 > 0L && ok(-1L)._2 > 0L)
  }

  test("pageRank reliable-checkpoint mode is value-identical to executor-local mode") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_pr").toString
    val local = Graph.pageRank(pathAndTriangle.toDF("id_a", "id_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val reliable = Graph
      .pageRank(pathAndTriangle.toDF("id_a", "id_b"), checkpointDir = Some(dir))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(reliable == local)
  }

  test("reciprocity: mutual pair counted both ways, self-loops and duplicates dropped") {
    import graft.operators.Graph
    // distinct directed edges after hygiene: 1->2, 2->1, 1->3.
    // reciprocated: both members of the mutual pair -> 2 of 3.
    val edges = Seq((1L, 2L), (2L, 1L), (1L, 3L), (4L, 4L), (1L, 2L))
      .toDF("src", "dst")
    val r = Graph.reciprocity(edges).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((3L, 2L, 666666L)))
    // empty edge set: zero score without a division
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val e = Graph.reciprocity(empty).head()
    assert((e.getLong(0), e.getLong(1), e.getLong(2)) == ((0L, 0L, 0L)))
  }

  test("modularity: two bridged triangles score the textbook 2x178571; merged partition scores 0") {
    import spark.implicits._
    // Triangles {1,2,3} and {4,5,6} bridged by (3,4): m = 7,
    // per-triangle e_c = 3, d_c = 7 -> term6 = (3e6 div 7) -
    // (49e6 div 196) = 428571 - 250000 = 178571 each (Q = 0.357142).
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("id_a", "id_b")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val got = Graph.modularity(edges, labels)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((1L, 3L, 3L, 7L, 178571L), (4L, 3L, 3L, 7L, 178571L)),
      got.toSeq.toString)
    // everything in one community: e_c = m and d_c = 2m, so
    // term6 = 1e6 - 1e6 = 0 exactly — chance-level by construction
    val one = labels.select(col("id"), lit(0L).as("community"))
    val flat = Graph.modularity(edges, one).collect()
    assert(flat.length == 1 && flat.head.getLong(4) == 0L)
  }

  test("louvainBestMove: hand-computed argmax move applies; optimum is a fixed point") {
    // path 1-2-3-4, labels {1,2}->10, {3}->30, {4}->40; m=3.
    // gains (x 2m^2): node2->c30: -2; node3->c10: 0; node3->c40: +4;
    // node4->c30: +4 -> tie at 4 breaks to the smaller id: node 3
    // moves to community 40. After: {1,2} and {3,4}.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 30L), (4L, 40L)).toDF("id", "community")
    val moved = Graph.louvainBestMove(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(moved == Map(1L -> 10L, 2L -> 10L, 3L -> 40L, 4L -> 40L), moved.toString)
    // the move is monotone: Q rises from (83333 - 111111 - 27777) to
    // (83333 + 83333) exactly
    def q6(lab: org.apache.spark.sql.DataFrame): Long =
      Graph.modularity(edges, lab).agg(sum(col("term6"))).head().getLong(0)
    assert(q6(labels) == -55555L)
    val after = Seq((1L, 10L), (2L, 10L), (3L, 40L), (4L, 40L)).toDF("id", "community")
    assert(q6(after) == 166666L)
    // a partition with no strictly-positive move is a FIXED POINT:
    // two disjoint edges, each its own community — unchanged
    val opt = Seq((1L, 2L), (3L, 4L)).toDF("id_a", "id_b")
    val optLab = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L)).toDF("id", "community")
    val kept = Graph.louvainBestMove(opt, optLab)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L), kept.toString)
  }

  test("louvainMoves: three moves assemble the path optimum monotonically; fixed point absorbs") {
    import spark.implicits._
    // path 1-2-3-4 from all-singletons: move 1 (ties at gain 4 break
    // to node 1) merges {1,2}; move 2 (node 3 -> c4 at gain 4) merges
    // {3,4}; move 3 finds no positive gain — the optimum absorbs.
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val singletons = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L)).toDF("id", "community")
    def labMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def q6(df: org.apache.spark.sql.DataFrame): Long =
      Graph.modularity(edges, df).agg(sum(col("term6"))).head().getLong(0)
    // K=1 is exactly the public single-move surface
    assert(labMap(Graph.louvainMoves(edges, singletons, 1))
      == labMap(Graph.louvainBestMove(edges, singletons)))
    val m3 = Graph.louvainMoves(edges, singletons, 3)
    assert(labMap(m3) == Map(1L -> 2L, 2L -> 2L, 3L -> 4L, 4L -> 4L), labMap(m3).toString)
    // monotone: -277776 (singletons) -> 166666 (optimum), and a 4th
    // move is the identity
    assert(q6(singletons) == -277776L)
    assert(q6(m3) == 166666L)
    assert(labMap(Graph.louvainMoves(edges, singletons, 4)) == labMap(m3))
    // the bound is enforced, not advisory
    intercept[IllegalArgumentException] {
      Graph.louvainMoves(edges, singletons, 9)
    }
  }

  test("louvainCoarsen: bridged triangles collapse to two self-looped super-nodes") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("id_a", "id_b")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val coarse = Graph.louvainCoarsen(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // two self-loops carrying the triangles' intra mass, one bridge
    assert(coarse == Seq((1L, 1L, 3L), (1L, 4L, 1L), (4L, 4L, 3L)), coarse.toString)
  }

  test("modularityWeighted on the coarse graph reproduces modularity of the original partition") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("id_a", "id_b")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val coarse = Graph.louvainCoarsen(edges, labels)
    val ident = coarse.select(col("id_a").as("id"))
      .unionAll(coarse.select(col("id_b").as("id")))
      .distinct()
      .select(col("id"), col("id").as("community"))
    val graded = Graph.modularityWeighted(coarse, ident)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val original = Graph.modularity(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    // (community, intra, degree_sum, term6) identical — the
    // aggregation-invariance theorem as an assertion; n_nodes is the
    // honest difference (3 originals vs 1 super-node) and is skipped
    assert(graded == original, s"$graded vs $original")
    // and each coarse community is exactly one super-node
    val n = Graph.modularityWeighted(coarse, ident)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(n == Seq((1L, 1L), (4L, 1L)), n.toString)
  }

  test("modularityWeighted: unit weights reduce to modularity; hygiene collapses multigraph rows") {
    import spark.implicits._
    val edges = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L))
      .toDF("id_a", "id_b")
    val labels = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("id", "community")
    val unitW = edges.withColumn("w", lit(1L))
    val viaW = Graph.modularityWeighted(unitW, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val plain = Graph.modularity(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(viaW.toSeq == plain.toSeq, s"$viaW vs $plain")
    // hygiene: a duplicate row, a reversed duplicate and a
    // nonpositive-weight row on a 2-node fixture — weights SUM on
    // the canonical pair, the w<=0 row drops; with one community the
    // flat-partition zero is exact (e_c = W, d_c = 2W)
    val messy = Seq(
      (1L, 2L, 2L), (2L, 1L, 3L), (1L, 2L, 1L), (1L, 2L, 0L), (2L, 1L, -5L))
      .toDF("id_a", "id_b", "w")
    val oneLab = Seq((1L, 7L), (2L, 7L)).toDF("id", "community")
    val got = Graph.modularityWeighted(messy, oneLab)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq((7L, 2L, 6L, 12L, 0L)), got.toSeq.toString)
    // self-loop convention: loop weight counts once in intra, twice
    // in degree — path 1-2 plus a loop on 1, one community:
    // W = 3, e_c = 3, d_c = 2+1+... = 6 -> term6 = 1e6 - 1e6 = 0;
    // split partition {1},{2}: c1 e=2 (loop), d=5; c2 e=0, d=1
    val loopy = Seq((1L, 1L, 2L), (1L, 2L, 1L)).toDF("id_a", "id_b", "w")
    val split = Seq((1L, 1L), (2L, 2L)).toDF("id", "community")
    val lres = Graph.modularityWeighted(loopy, split)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    // m=3: c1 term6 = (2e6 div 3) - (25e6 div 36) = 666666 - 694444
    // = -27778; c2 = 0 - (1e6 div 36) = -27777 (truncation toward
    // zero on the positive quotient, subtracted after)
    assert(lres.toSeq == Seq((1L, 2L, 5L, -27778L), (2L, 0L, 1L, -27777L)), lres.toSeq.toString)
  }

  test("louvainBestMoveWeighted: a heavy bridge merges the super-nodes; a light one is a fixed point") {
    import spark.implicits._
    // coarse graph (1,1,1),(1,4,5),(4,4,1): W = 7, k1 = k4 = 7;
    // gain(1 -> c4)·2W² = 2·7·5 - 7·(7+7-7) = 21 > 0 — the bridge
    // outweighs chance, the communities merge (labels {1->4, 4->4})
    val heavy = Seq((1L, 1L, 1L), (1L, 4L, 5L), (4L, 4L, 1L)).toDF("id_a", "id_b", "w")
    val ident = Seq((1L, 1L), (4L, 4L)).toDF("id", "community")
    val merged = Graph.louvainBestMoveWeighted(heavy, ident)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(merged == Map(1L -> 4L, 4L -> 4L), merged.toString)
    // merged re-grade: one community holding ALL the mass is exactly
    // chance level (term6 = 0) — and that beats the split partition's
    // 2 x (1e6 div 7 - 49e6 div 196) = 2 x (142857 - 250000)
    val regrade = Graph.modularityWeighted(
      heavy, Graph.louvainBestMoveWeighted(heavy, ident))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(regrade.toSeq == Seq((4L, 2L, 7L, 14L, 0L)), regrade.toSeq.toString)
    // bridged-triangle coarse graph (self-loops 3, bridge 1): the
    // bridge is BELOW chance (2·7·1 - 7·7 < 0) — identity absorbs,
    // matching the positive split term6 the plain grade assigns
    val light = Seq((1L, 1L, 3L), (1L, 4L, 1L), (4L, 4L, 3L)).toDF("id_a", "id_b", "w")
    val kept = Graph.louvainBestMoveWeighted(light, ident)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(kept == Map(1L -> 1L, 4L -> 4L), kept.toString)
    // unit weights with no loops reduce to the unweighted move: the
    // hand path fixture takes the same argmax step
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("id_a", "id_b")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 30L), (4L, 40L)).toDF("id", "community")
    val viaW = Graph.louvainBestMoveWeighted(edges.withColumn("w", lit(1L)), labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val plain = Graph.louvainBestMove(edges, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaW == plain, s"$viaW vs $plain")
  }

  test("louvainMovesWeighted: two sequential merges collapse the super-node chain") {
    import spark.implicits._
    // chain 1-2-3 with bridges w=5 and loops on the endpoints: W=12,
    // k1 = k3 = 7, k2 = 10. Move 1 ties at gain 50 -> node 1 joins
    // c2; move 2: only node 3 -> merged c2 stays positive (gain 1),
    // everything lands in community 2 — and the second gain is
    // computed against the MERGED Σtot (17), which is the point.
    val chain = Seq((1L, 1L, 1L), (1L, 2L, 5L), (2L, 3L, 5L), (3L, 3L, 1L))
      .toDF("id_a", "id_b", "w")
    val ident = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "community")
    def labMap(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labMap(Graph.louvainMovesWeighted(chain, ident, 1))
      == Map(1L -> 2L, 2L -> 2L, 3L -> 3L))
    val two = Graph.louvainMovesWeighted(chain, ident, 2)
    assert(labMap(two) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L), labMap(two).toString)
    // the all-merged grade is exactly chance level (e = W, d = 2W),
    // monotone from -177083 (identity) via -3472 (one merge)
    def q6(lab: org.apache.spark.sql.DataFrame): Long =
      Graph.modularityWeighted(chain, lab)
        .agg(sum(col("term6"))).head().getLong(0)
    assert(q6(ident) == -177083L)
    assert(q6(Graph.louvainMovesWeighted(chain, ident, 1)) == -3472L)
    assert(q6(two) == 0L)
    // a third pass is the identity — the optimum absorbs
    assert(labMap(Graph.louvainMovesWeighted(chain, ident, 3)) == labMap(two))
  }

  test("louvainCoarsenWeighted: self-loops fold, weight is conserved, the grade is invariant") {
    import spark.implicits._
    // chain 1-2-3 with loops on the endpoints, labels {1,2} -> 7 and
    // {3} -> 3: community 7's loop = node 1's loop + the intra bridge
    // (1+5), the cross bridge stays w=5, node 3's loop stays w=1
    val chain = Seq((1L, 1L, 1L), (1L, 2L, 5L), (2L, 3L, 5L), (3L, 3L, 1L))
      .toDF("id_a", "id_b", "w")
    val labels = Seq((1L, 7L), (2L, 7L), (3L, 3L)).toDF("id", "community")
    val coarse = Graph.louvainCoarsenWeighted(chain, labels)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(coarse == Seq((3L, 3L, 1L), (3L, 7L, 5L), (7L, 7L, 6L)), coarse.toString)
    // total weight conserved: 12 in, 12 out
    assert(coarse.map(_._3).sum == 12L)
    // the invariance theorem at level 2: grading the coarse graph
    // under identity labels reproduces the weighted grade of the
    // partition on the input graph (minus n_nodes)
    val ident = Seq((3L, 3L), (7L, 7L)).toDF("id", "community")
    val graded = Graph.modularityWeighted(Graph.louvainCoarsenWeighted(chain, labels), ident)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    val direct = Graph.modularityWeighted(chain, labels)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(graded == direct, s"$graded vs $direct")
  }
}
