package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Measured ANN quality: recall@10 of the approximate paths (IVF cell
  * probe, PQ ADC shortlist) against exact brute-force cosine on the
  * driver's embeddings table — the approximation claim as a number,
  * not an argument. Everything here is deterministic (fixed data,
  * fixed centroids/codebooks, no RNG), so the recall values are
  * stable; the assertions pin a floor, not an exact value, to stay
  * robust to test-data regeneration.
  */
class AnnRecallSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private lazy val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

  private lazy val query: Array[Double] = emb
    .filter(col("vec_id") === 0)
    .collect().head
    .getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray

  private lazy val corpus = emb.filter(col("vec_id") =!= 0)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select(col("vec_id")).collect().map(_.getLong(0)).toSet

  private lazy val exactTop10: Set[Long] =
    ids(Similarity.bruteForceTopK(corpus, "embedding", query, 10))

  test("IVF probe recall@10 >= 0.7 vs brute force (fitted centroids, nprobe 8/16)") {
    // honest configuration: centroids FITTED from the data (k-means on
    // the hash sample), 16 cells, probe 8 — the corpus scan halves.
    // The driver embeddings are near-uniform (weak cluster structure,
    // the ANN worst case), so recall tracks probed mass: 4/16 probes
    // measured 0.6 recall, 8/16 clears 0.7 with headroom
    val cents = Similarity.fitCentroids(corpus, "vec_id", "embedding", k = 16, iters = 5)
    val assigned = Similarity.ivfAssign(corpus, "embedding", cents)
    val approx = ids(Similarity.ivfTopK(assigned, "embedding", cents, query, 10, 8))
    val recall = (approx & exactTop10).size / 10.0
    assert(recall >= 0.7, s"IVF recall@10 = $recall (approx=$approx exact=$exactTop10)")
  }

  // 16-entry codebooks on near-uniform vectors are coarse (the PQ
  // worst case), so the ADC stage is a 3.3x-reduction shortlist and
  // the exact re-rank does the precision work — the standard
  // shortlist-size / recall tradeoff, measured: shortlist 50 gave
  // 0.5 recall, 150 clears 0.7
  test("PQ ADC shortlist + exact re-rank achieves recall@10 >= 0.7") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 16))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val codebooks = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity.pqEncode(corpus, "embedding", subDim, codebooks)
    val approx = ids(
      Similarity.pqTopK(encoded, "embedding", codebooks, query, subDim, shortlist = 150, k = 10))
    val recall = (approx & exactTop10).size / 10.0
    assert(recall >= 0.7, s"PQ recall@10 = $recall (approx=$approx exact=$exactTop10)")
  }

  test("IVF-PQ hybrid: probing ALL cells reduces to plain PQ; half-probe recall measured") {
    val subDim = 8
    val cents = Similarity.fitCentroids(corpus, "vec_id", "embedding", k = 16, iters = 5)
    val sample = corpus
      .filter(col("vec_id").between(1, 16))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val codebooks = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity.pqEncode(
      Similarity.ivfAssign(corpus, "embedding", cents), "embedding", subDim, codebooks)
    // identity: nprobe = k cells means the cell filter is vacuous, so
    // the hybrid must return exactly the plain PQ ranking
    val allProbe = ids(Similarity.ivfPqTopK(
      encoded, "embedding", cents, codebooks, query, subDim,
      nprobe = 16, shortlist = 150, k = 10))
    val plainPq = ids(Similarity.pqTopK(
      encoded, "embedding", codebooks, query, subDim, shortlist = 150, k = 10))
    assert(allProbe == plainPq, s"all-cell probe must equal plain PQ: $allProbe vs $plainPq")
    // the composed approximation: both cuts stack (probe 8/16 of the
    // corpus, ADC-shortlist 150 inside it) — measured >= 0.7 on this
    // near-uniform worst-case data (the probed half keeps the true
    // neighbors, so the hybrid matches plain PQ here); pin a 0.5
    // floor to survive test-data regeneration
    val hybrid = ids(Similarity.ivfPqTopK(
      encoded, "embedding", cents, codebooks, query, subDim,
      nprobe = 8, shortlist = 150, k = 10))
    val recall = (hybrid & exactTop10).size / 10.0
    assert(recall >= 0.5, s"IVF-PQ recall@10 = $recall (approx=$hybrid exact=$exactTop10)")
  }

  // The driver embeddings are near-uniform (weak neighbor structure —
  // the ANN worst case, as for IVF/PQ above): the query's true
  // neighbors sit at cosine ~0.3-0.4 where per-bit sign agreement is
  // only ~0.6, so tight configs (8 bits, radius 1: ~3.5% of bucket
  // space) find nothing. 4 bits at radius 1 probes 5/16 of the space
  // for a measured 0.3 recall — the honest probe-mass/recall
  // tradeoff on unclusterable data; the floor pins 0.2 to survive
  // test-data regeneration.
  test("LSH multi-probe top-k (4 bits, radius 1) recall@10 >= 0.2 vs brute force") {
    val approx = ids(
      Similarity.lshTopK(corpus, "embedding", dim = 64, nBits = 4, query, k = 10, radius = 1))
    val recall = (approx & exactTop10).size / 10.0
    info(s"lshTopK recall@10 = $recall (probed hamming<=1 of 4-bit buckets)")
    assert(recall >= 0.2, s"lshTopK recall@10 = $recall")
  }

  // Banded treatment of the SAME retrieval problem: with per-bit
  // agreement p ~= 0.61 for this data's cosine-0.3-0.4 neighbors,
  // 16 bands x 4 bits predicts per-neighbor probe probability
  // 1 - (1 - 0.61^4)^16 ~= 0.91. Measured 0.9 (stable — the
  // projections are hash-derived, no RNG); floor raised to 0.8 so
  // the spec catches a regression the old 0.5 slack would hide, and
  // run 3x to pin run-to-run determinism alongside the floor.
  test("banded LSH top-k (16 bands x 4 bits) recall@10 >= 0.8 vs brute force, 3 stable runs") {
    val recalls = (1 to 3).map { _ =>
      val approx = ids(
        Similarity.bandedLshTopK(
          corpus, "embedding", dim = 64, bands = 16, bitsPerBand = 4, query, k = 10))
      (approx & exactTop10).size / 10.0
    }
    info(s"bandedLshTopK recall@10 runs = $recalls")
    assert(recalls.distinct.size == 1, s"bandedLshTopK recall must be run-stable: $recalls")
    assert(recalls.head >= 0.8, s"bandedLshTopK recall@10 = ${recalls.head}")
  }

  // Multiprobe closes the residual gap: with per-band match
  // probability q = P(Binom(4, 0.61) >= 3) ~= 0.49 at radius 1, the
  // 16-band OR predicts per-neighbor probe probability
  // 1 - (1 - 0.49)^16 ~= 0.99996 — recall should be essentially the
  // probed-candidate ceiling. Measured 1.0 (stable — hash-derived
  // projections); floor raised to 0.9 so near-total recall is the
  // PINNED contract, not incidental headroom; 3 runs pin determinism.
  test("banded LSH top-k with radius-1 multiprobe recall@10 >= 0.9 vs brute force, 3 stable runs") {
    val recalls = (1 to 3).map { _ =>
      val approx = ids(
        Similarity.bandedLshTopK(
          corpus, "embedding", dim = 64, bands = 16, bitsPerBand = 4, query, k = 10,
          probeRadius = 1))
      (approx & exactTop10).size / 10.0
    }
    info(s"bandedLshTopK multiprobe recall@10 runs = $recalls")
    assert(recalls.distinct.size == 1, s"multiprobe recall must be run-stable: $recalls")
    assert(recalls.head >= 0.9, s"bandedLshTopK multiprobe recall@10 = ${recalls.head}")
  }

  test("groupAffinityMatrix: aligned groups cosine 1, orthogonal 0, null vectors excluded") {
    val sp = spark
    import sp.implicits._
    val df = Seq(
      (1, Some(Array(1.0f, 0.0f))), (1, Some(Array(2.0f, 0.0f))),
      (2, Some(Array(0.0f, 3.0f))),
      (3, Some(Array(4.0f, 0.0f))), (3, Option.empty[Array[Float]])
    ).toDF("g", "embedding")
    val got = Similarity.groupAffinityMatrix(df, col("g"), "embedding")
      .orderBy(col("group_a"), col("group_b")).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(got((1, 2)) == ((2L, 1L, 0.0)))  // orthogonal
    assert(got((1, 3)) == ((2L, 1L, 1.0)))  // same direction; null row dropped from n_b
    assert(got((2, 3)) == ((1L, 1L, 0.0)))
  }

  test("randomProject: fixed-point components match the sign matrix by hand") {
    val signs = Similarity.rpSigns(2, 2)
    // sanity on the generator itself: only ±1, deterministic
    assert(signs.flatten.forall(s => s == 1L || s == -1L))
    assert(Similarity.rpSigns(2, 2).map(_.toSeq).toSeq == signs.map(_.toSeq).toSeq)
    val df = spark.createDataFrame(Seq((1L, Array(0.5f, -0.25f))))
      .toDF("vec_id", "embedding")
    val rp = Similarity.randomProject(df, "embedding", 2, 2)
      .select(col("rp")).head().getSeq[Long](0)
    val expected = (0 until 2).map(j => signs(j)(0) * 5000L + signs(j)(1) * -2500L)
    assert(rp == expected)
  }

  test("rpSigns matrix is roughly balanced (no degenerate all-ones dimension)") {
    val signs = Similarity.rpSigns(64, 16)
    val total = signs.flatten.sum
    assert(math.abs(total) < 1024 * 2 / 10, s"global sign skew $total")
    signs.foreach { row => assert(math.abs(row.sum) < 40, s"row skew ${row.sum}") }
  }

  test("two-stage random-projection retrieval: shortlist-150 recall@10 >= 0.7 vs brute force") {
    // near-uniform driver embeddings are the JL worst case (weakly
    // separated cosines + 4x dimension crush); measured tradeoff at
    // k=16: shortlist 40 -> 0.5, 80 -> 0.6, 150 -> 0.8, 200 -> 1.0 —
    // the same shortlist/recall curve the PQ ADC stage showed. The
    // committed query runs the 150 operating point; floor 0.7 pins
    // against sign-matrix regressions (a correlated matrix — e.g.
    // the rejected linear index mix — craters this to ~0.1).
    val proj = Similarity.randomProject(corpus, "embedding", 64, 16)
    val qrp = Similarity.randomProject(
      emb.filter(col("vec_id") === 0), "embedding", 64, 16)
      .select(col("rp")).head().getSeq[Long](0)
    val cand = proj
      .withColumn("pscore", Similarity.intDot(col("rp"), typedLit(qrp)))
      .orderBy(col("pscore").desc, col("vec_id"))
      .limit(150)
    val top10 = ids(Similarity.bruteForceTopK(cand, "embedding", query, 10))
    val recall = (top10 & exactTop10).size / 10.0
    assert(recall >= 0.7, s"two-stage RP recall@10 = $recall")
  }

  test("persisted IVF index round-trips: loaded centroids + cells reproduce the in-line top-k") {
    val cents = Similarity.fitCentroids(corpus, "vec_id", "embedding", k = 16, iters = 5)
    val assigned = Similarity.ivfAssign(corpus, "embedding", cents)
    val inline = Similarity.ivfTopK(assigned, "embedding", cents, query, 10, 8)
      .select(col("vec_id"), col("score")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    val path = "/tmp/graft_idx/spec_ivf"
    graft.sources.Io.writeIvfIndex(assigned, cents, path)
    val (lc, cells) = graft.sources.Io.readIvfIndex(spark, path)
    assert(lc.length == cents.length)
    lc.zip(cents).foreach { case (a, b) => assert(a.toSeq == b.toSeq, "centroid drift") }
    val loaded = Similarity.ivfTopK(cells, "embedding", lc, query, 10, 8)
      .select(col("vec_id"), col("score")).collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(loaded.toSeq == inline.toSeq, s"persisted != inline: $loaded vs $inline")
  }

  test("upserted IVF index: last-wins replaces stale vectors, append touches only new cells") {
    val cents = Similarity.fitCentroids(corpus, "vec_id", "embedding", k = 16, iters = 5)
    val path = "/tmp/graft_idx/spec_ivf_upsert"
    // base: every 3rd vector written stale (reversed embedding)
    val stale = corpus.withColumn(
      "embedding",
      when(col("vec_id") % 3 === 0, reverse(col("embedding"))).otherwise(col("embedding")))
    graft.sources.Io.writeIvfIndex(
      Similarity.ivfAssign(stale, "embedding", cents), cents, path)
    graft.sources.Io.upsertIvfIndex(
      Similarity.ivfAssign(corpus.filter(col("vec_id") % 3 === 0), "embedding", cents),
      path, seq = 1L)
    val (_, latest) = graft.sources.Io.readIvfIndexLatest(spark, path, "vec_id")
    // one row per id, and every row equals the TRUE corpus vector
    val truthMap = corpus.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)).toMap
    val got = latest.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1))
    assert(got.length == truthMap.size, s"${got.length} rows vs ${truthMap.size} ids")
    got.foreach { case (id, emb) =>
      assert(emb == truthMap(id), s"vec $id kept a stale version")
    }
    // time travel: as-of seq 0 serves EXACTLY the stale base state,
    // and as-of the max seq equals the latest view (no tombstones)
    val staleMap = stale.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1)).toMap
    val (_, asOf0) = graft.sources.Io.readIvfIndexAsOf(spark, path, "vec_id", 0L)
    asOf0.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]](1) == staleMap(r.getLong(0)),
        s"as-of-0 should serve the pre-upsert state for vec ${r.getLong(0)}")
    }
    val (_, asOf1) = graft.sources.Io.readIvfIndexAsOf(spark, path, "vec_id", 1L)
    asOf1.select(col("vec_id"), col("embedding")).collect().foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]](1) == truthMap(r.getLong(0)))
    }
  }

  test("persisted PQ index round-trips codebooks and codes exactly") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 16))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val codebooks = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity.pqEncode(corpus, "embedding", subDim, codebooks)
      .select(col("vec_id") +: (0 until query.length / subDim).map(s => col(s"pq_$s")): _*)
    val path = "/tmp/graft_idx/spec_pq"
    graft.sources.Io.writePqIndex(encoded, codebooks, path)
    val (books, codes) = graft.sources.Io.readPqIndex(spark, path)
    assert(books.length == codebooks.length)
    books.zip(codebooks).foreach { case (ls, cs) =>
      assert(ls.length == cs.length)
      ls.zip(cs).foreach { case (a, b) => assert(a.toSeq == b.toSeq, "codebook drift") }
    }
    val a = encoded.orderBy(col("vec_id")).collect().map(_.toSeq)
    val b = codes.orderBy(col("vec_id")).collect().map(_.toSeq)
    assert(a.toSeq == b.toSeq, "codes drift")
  }

  test("upserted PQ index: last-wins replaces stale codes against frozen codebooks") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 16))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val codebooks = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val path = "/tmp/graft_idx/spec_pq_upsert"
    // base: every 3rd vector coded from a stale (reversed) embedding
    val stale = corpus.withColumn(
      "embedding",
      when(col("vec_id") % 3 === 0, reverse(col("embedding"))).otherwise(col("embedding")))
    graft.sources.Io.writePqIndex(
      Similarity.pqEncode(stale, "embedding", subDim, codebooks), codebooks, path)
    graft.sources.Io.upsertPqIndex(
      Similarity.pqEncode(corpus.filter(col("vec_id") % 3 === 0), "embedding", subDim, codebooks),
      path, seq = 1L)
    val (_, latest) = graft.sources.Io.readPqIndexLatest(spark, path, "vec_id")
    val truth = Similarity.pqEncode(corpus, "embedding", subDim, codebooks)
      .select(col("vec_id") +: (0 until query.length / subDim).map(s => col(s"pq_$s")): _*)
      .orderBy(col("vec_id")).collect().map(_.toSeq)
    val got = latest
      .select(col("vec_id") +: (0 until query.length / subDim).map(s => col(s"pq_$s")): _*)
      .orderBy(col("vec_id")).collect().map(_.toSeq)
    assert(got.toSeq == truth.toSeq, "upserted index did not converge to the true codes")
  }

  // ---- banded hyperplane LSH: pair recall on planted near-dups ----
  //
  // 200 seeded random unit vectors plus 40 planted near-dups at
  // EXACTLY cosine 0.85 (v' = 0.85 v + sqrt(1-0.85^2) w, w unit and
  // orthogonalized against v). With per-bit collision probability
  // p = 1 - acos(0.85)/pi ~= 0.823, one 128-bit full-signature table
  // has per-pair recall p^128 ~= 1e-11 — it finds NOTHING — while
  // 16 bands x 8 bits gives 1 - (1 - p^8)^16 ~= 0.977. Both are
  // measured below against the same planted truth; thresholds pin the
  // floor (0.9) not the expectation, robust to seed changes.

  private val Dim = 64
  private val NBase = 200
  private val NDup = 40

  private lazy val planted = {
    val rnd = new scala.util.Random(7)
    def unit(): Array[Double] = {
      val v = Array.fill(Dim)(rnd.nextGaussian())
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val base = Array.fill(NBase)(unit())
    val rows = base.zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) } ++
      (0 until NDup).map { i =>
        val v = base(i)
        val w0 = unit()
        val d = v.zip(w0).map { case (a, b) => a * b }.sum
        val w1 = w0.zip(v).map { case (b, a) => b - d * a }
        val n1 = math.sqrt(w1.map(x => x * x).sum)
        val w = w1.map(_ / n1)
        val dup = v.zip(w).map { case (a, b) => 0.85 * a + math.sqrt(1 - 0.85 * 0.85) * b }
        ((NBase + i).toLong, dup.toSeq)
      }
    spark.createDataFrame(rows.toSeq).toDF("vec_id", "embedding")
  }

  private lazy val truth: Set[(Long, Long)] =
    (0 until NDup).map(i => (i.toLong, (NBase + i).toLong)).toSet

  private def pairRecall(pairs: org.apache.spark.sql.DataFrame): Double = {
    val found = pairs
      .select(col("id_a"), col("id_b"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSet
    (found & truth).size.toDouble / truth.size
  }

  test("banded LSH (16 bands x 8 bits) pair recall >= 0.9 on planted cosine-0.85 near-dups") {
    val pairs = Similarity
      .bandedLshNearDupPairs(planted, "vec_id", "embedding", Dim,
        bands = 16, bitsPerBand = 8, threshold = 0.8)
    val recall = pairRecall(pairs)
    assert(recall >= 0.9, s"banded LSH recall = $recall, want >= 0.9")
  }

  test("single-table 128-bit LSH collapses on the same near-dups (the defect banding fixes)") {
    val pairs = Similarity
      .lshNearDupPairs(planted, "vec_id", "embedding", Dim, nBits = 128, threshold = 0.8)
    val recall = pairRecall(pairs)
    assert(recall <= 0.1, s"full-signature recall = $recall — expected near-zero; " +
      "if this rises, the banded test's contrast claim needs rewording")
  }

  test("margin alignment from banded-LSH candidates: pair recall >= 0.7 vs the exact cross join") {
    // the corpus-scale path promised in marginAlignPairs' scaladoc:
    // candidates from a 16-band x 2-bit signature bucket join between
    // the two sides, margin math unchanged over the surviving lists.
    // Exact equality holds per pair whenever the candidates contain
    // both sides' true top-k; this measures how often that contract
    // holds on the driver's near-uniform (ANN-worst-case) embeddings.
    val left = emb.filter(col("vec_id") % 2 === 0)
    val right = emb.filter(col("vec_id") % 2 === 1)
    val exact = Similarity
      .marginAlignPairs(left, right, "vec_id", "embedding", 4, 21L, 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bands = 16; val bitsPerBand = 2
    def banded(df: org.apache.spark.sql.DataFrame, idAs: String) =
      (0 until bands).map { b =>
        Similarity
          .hyperplaneSignature(df, "embedding", 8, bands * bitsPerBand)
          .select(
            col("vec_id").as(idAs),
            col("embedding").as(s"__e_$idAs"),
            lit(b).as("band"),
            substring(col("lsh_bucket"), b * bitsPerBand + 1, bitsPerBand).as("sig"))
      }.reduce(_ unionAll _)
    val cand = banded(left, "id_a")
      .join(banded(right, "id_b"), Seq("band", "sig"))
      .select(col("id_a"), col("id_b"), col("__e_id_a"), col("__e_id_b"))
      .distinct()
      .withColumn(
        "q",
        round(
          graft.functions.VectorFns.cosine(col("__e_id_a"), col("__e_id_b")) * 1e6,
          0).cast("long"))
      .select(col("id_a"), col("id_b"), col("q"))
    val approx = Similarity
      .marginAlignFromCandidates(cand, 4, 21L, 20L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.7, s"margin-from-candidates recall $recall below floor (exact ${exact.size}, approx ${approx.size})")
  }

  test("rrf fusion from banded-LSH candidates: fused top-5 agreement >= 0.6 vs exact fusion") {
    // the r_rrf_fusion_ann contract: the fused list off the banded
    // candidate shortlist must substantially agree with the fused
    // list off the exact corpus × query-set cross join. Agreement =
    // mean per-qid |top5_ann ∩ top5_exact| / 5 over the exact run's
    // qids — top-k overlap, the RBO@5 numerator without the depth
    // weights (order-insensitive on purpose: the BM25 leg is shared,
    // so disagreement isolates the embedding leg's recall gap, and
    // the driver embeddings are near-uniform, the ANN worst case).
    val dir = "/root/testdata/sf0.001"
    def top5(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(spark, dir)
        .select(col("qid"), col("doc_id"))
        .collect()
        .groupBy(_.getLong(0))
        .map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val exact = top5("r_rrf_fusion")
    val ann = top5("r_rrf_fusion_ann")
    assert(exact.nonEmpty)
    val agreement = exact.map { case (q, e) =>
      (e & ann.getOrElse(q, Set.empty)).size.toDouble / e.size
    }.sum / exact.size
    assert(agreement >= 0.6,
      s"fused top-5 agreement $agreement below floor over ${exact.size} qids")
  }

  test("mmrRerank diversifies: redundant twin demoted, diverse pick promoted") {
    import spark.implicits._
    // rel order: 1 (0.99) > 2 (0.98, near-clone of 1) > 3 (0.90,
    // orthogonal-ish). Pure top-2 = {1, 2}; MMR with a meaningful
    // penalty must pick 3 at rank 2.
    val pool = Seq(
      (1L, 0.99, Array(1.0, 0.0, 0.0)),
      (2L, 0.98, Array(0.999, 0.04, 0.0)),
      (3L, 0.90, Array(0.0, 1.0, 0.0))
    ).toDF("vec_id", "rel", "vec")
    val got = Similarity
      .mmrRerank(pool, "vec_id", "vec", "rel", 3, 0.5, 0.5)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(got(1) == 1L, "rank 1 must be the top-rel doc")
    assert(got(2) == 3L, "rank 2 must be the diverse doc, not the near-clone")
    assert(got(3) == 2L)
    // and with no penalty it degrades to pure relevance order
    val flat = Similarity
      .mmrRerank(pool, "vec_id", "vec", "rel", 3, 1.0, 0.0)
      .collect().map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(flat == Map(1 -> 1L, 2 -> 2L, 3 -> 3L))
  }

  test("embeddingDriftByGroup: aligned group scores 1, inverted group -1, nulls excluded") {
    import spark.implicits._
    val rows = Seq(
      (Option("a"), Option(Seq(1.0f, 0.0f))),
      (Option("a"), Option(Seq(1.0f, 0.0f))),
      (Option("b"), Option(Seq(-1.0f, 0.0f))),
      (Option("b"), Option.empty[Seq[Float]]) // no evidence -> excluded
    ).toDF("g", "embedding")
    val got = Similarity
      .embeddingDriftByGroup(rows, col("g"), "embedding")
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2)))
      .toMap
    // global sum = (1e9, 0); a = (2e9, 0) -> cos 1; b = (-1e9, 0) -> cos -1
    assert(got("a") == ((2L, 1.0)), got.toString)
    assert(got("b") == ((1L, -1.0)), got.toString)
  }

  test("mmrRerank shortlist bound is enforced: an oversized pool fails fast, never OOMs") {
    import spark.implicits._
    val big = spark.range(0, 50)
      .select(
        col("id").as("vec_id"),
        lit(0.5).as("rel"),
        array(lit(1.0), lit(0.0)).as("vec"))
    val e = intercept[IllegalArgumentException] {
      Similarity.mmrRerank(big, "vec_id", "vec", "rel", 3, 0.7, 0.3, maxPool = 10)
    }
    assert(e.getMessage.contains("maxPool"), e.getMessage)
    // at the bound it still runs (the limit collects maxPool + 1 rows
    // only to count, not to rank beyond the pool)
    val ok = Similarity
      .mmrRerank(big.limit(10), "vec_id", "vec", "rel", 3, 0.7, 0.3, maxPool = 10)
      .collect()
    assert(ok.length == 3)
  }

  test("embeddingDispersion: variance identity exact on a 2-vector fixture; collapsed corpus scores 0") {
    import spark.implicits._
    // (0,0) and (2,0): micro q = 0 / 2e6. Q = 4e12, mean_sq12 =
    // 2e12; centroid terms (2e6)² div 4 = 1e12 -> dispersion 1e12;
    // pairwise = 2N/(N-1)·disp = 4e12 (the exact squared distance
    // between the two points).
    val vs = Seq(Array(0f, 0f), Array(2f, 0f)).toDF("embedding")
    val r = Similarity.embeddingDispersion(vs, "embedding").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((2L, 2L, 2000000000000L, 1000000000000L, 1000000000000L, 4000000000000L)))
    // identical vectors: zero dispersion exactly (mode collapse reads 0)
    val same = Seq(Array(1f, 3f), Array(1f, 3f), Array(1f, 3f)).toDF("embedding")
    val z = Similarity.embeddingDispersion(same, "embedding").head()
    assert((z.getLong(4), z.getLong(5)) == ((0L, 0L)))
  }

  test("calinskiHarabasz: hand fixture gives CH = 50 exactly; tight clusters hit the ssw=0 convention") {
    import spark.implicits._
    // A: (0,0), (0,2); B: (10,0), (10,2) — between = 25/vector (x
    // gap 5 from grand each), within = 1/vector (y ±1):
    // CH = (SSB/(k-1)) / (SSW/(N-k)) = 1e8 / (4e6/2) = 50 -> 5e7.
    val df = Seq(
      ("A", Array(0f, 0f)), ("A", Array(0f, 2f)),
      ("B", Array(10f, 0f)), ("B", Array(10f, 2f))).toDF("label", "embedding")
    val r = Similarity.calinskiHarabasz(df, "label", "embedding").head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5)) ==
      ((4L, 2L, 2L, 25000000L, 1000000L, 50000000L)))
    // perfectly tight clusters: ssw6 = 0 -> ch6 = 0 by convention,
    // ssb6 carries the separation
    val tight = Seq(
      ("A", Array(0f, 0f)), ("A", Array(0f, 0f)),
      ("B", Array(2f, 0f)), ("B", Array(2f, 0f))).toDF("label", "embedding")
    val tz = Similarity.calinskiHarabasz(tight, "label", "embedding").head()
    assert((tz.getLong(3), tz.getLong(4), tz.getLong(5)) == ((1000000L, 0L, 0L)))
  }

  test("ivf refit loop: worklist -> recenter -> regrade improves CH on bad centroids") {
    import spark.implicits._
    // two tight direction-clusters, but BOTH initial centroids sit
    // inside cluster A — cell 0 catches A's upper half PLUS all of
    // orthogonal cluster B, so its within-variance rivals the corpus
    // total and it lands on the worklist; one targeted Lloyd step
    // must re-center it toward B and raise the variance-ratio grade
    val vecs = (
      Seq.fill(6)(Array(1.0f, 0.05f)) ++ Seq.fill(6)(Array(1.0f, -0.05f)) ++
        Seq.fill(12)(Array(0.05f, 1.0f))).zipWithIndex
      .map { case (v, i) => (i.toLong, v) }
      .toDF("vec_id", "embedding")
    val badCents = Seq(Array(1.0, 0.05), Array(1.0, -0.05))
    val assigned = Similarity.ivfAssign(vecs, "embedding", badCents)
    val before = Similarity
      .calinskiHarabasz(assigned, "cell", "embedding").head().getLong(5)
    // the mixed cell's within/total ratio on this geometry is ~0.84 —
    // pass an explicit threshold under it (thrPpm is the caller's
    // policy knob; the query uses the documented 900000 default)
    val wl = Similarity.ivfRefitWorklist(assigned, "cell", "embedding", thrPpm = 700000L)
    assert(wl.count() >= 1, "expected at least one unfit cell on the worklist")
    val newCents =
      Similarity.ivfRecenteredCentroids(assigned, wl, badCents, "cell", "embedding")
    val after = Similarity
      .calinskiHarabasz(
        Similarity.ivfAssign(vecs, "embedding", newCents), "cell", "embedding")
      .head().getLong(5)
    assert(after > before, s"refit should raise CH: before=$before after=$after")
    // untouched cells keep their centroid object identity-equal values
    val flagged = wl.select(col("cell").cast("int")).collect().map(_.getInt(0)).toSet
    badCents.indices.filterNot(flagged).foreach { i =>
      assert(newCents(i).sameElements(badCents(i)))
    }
    // empty worklist is a no-op
    val empty = wl.filter(lit(false))
    assert(Similarity.ivfRecenteredCentroids(assigned, empty, badCents, "cell", "embedding")
      eq badCents)
  }

  test("pq refit loop: grade -> worklist -> subspace rebuild -> regrade improves CH") {
    import spark.implicits._
    // subspace 0 gets a healthy codebook; subspace 1's two codes both
    // sit inside one direction-cluster (the IVF bad-centroid geometry
    // confined to a subspace), so its CH grade is the argmin, the
    // worklist picks it, and one targeted Lloyd step must raise it
    val sub0: Seq[Array[Float]] =
      Seq.fill(6)(Array(1f, 0.1f)) ++ Seq.fill(6)(Array(1f, -0.1f)) ++
        Seq.fill(6)(Array(0.1f, 1f)) ++ Seq.fill(6)(Array(-0.1f, 1f))
    val sub1: Seq[Array[Float]] =
      Seq.fill(6)(Array(1f, 0.05f)) ++ Seq.fill(6)(Array(1f, -0.05f)) ++
        Seq.fill(12)(Array(0.05f, 1f))
    val vecs = sub0.zip(sub1).zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a ++ b) }
      .toDF("vec_id", "embedding")
    val books = Seq(
      Seq(Array(1.0, 0.0), Array(0.0, 1.0)),
      Seq(Array(1.0, 0.05), Array(1.0, -0.05)))
    val encoded = Similarity.pqEncode(vecs, "embedding", 2, books)
    val grades = Similarity.pqSubspaceGrades(encoded, "embedding", 2, 2)
    val byS = grades.collect().map(r => r.getLong(0) -> r.getLong(6)).toMap
    assert(byS(1L) < byS(0L), s"fixture must make subspace 1 the worst: $byS")
    val wl = Similarity.pqRefitWorklist(grades).collect()
    assert(wl.length == 1 && wl.head.getLong(0) == 1L, wl.mkString(","))
    val newSub = Similarity.pqRefittedSubCodebook(encoded, "embedding", 2, 1, books(1))
    val re = Similarity.pqReencodeSubspace(encoded, "embedding", 2, 1, newSub)
    // the REBUILD touches only the flagged subspace's code column
    assert(re.select(col("vec_id"), col("pq_0")).collect().toSet ==
      encoded.select(col("vec_id"), col("pq_0")).collect().toSet)
    val after = Similarity
      .calinskiHarabasz(
        re.withColumn("__sub", slice(col("embedding").cast("array<double>"), 3, 2)),
        "pq_1", "__sub")
      .head().getLong(5)
    assert(after > byS(1L), s"refit should raise CH: before=${byS(1L)} after=$after")
  }

  test("pqRefittedSubCodebook: a code with no assigned vectors keeps its centroid") {
    import spark.implicits._
    // duplicate centroids tie every row to the LARGER code (the
    // greatest-struct rule) -> code 0 is empty and must survive the
    // refit untouched; code 1 re-centers on the exact mean
    val vecs = (0 until 5).map(i => (i.toLong, Array(1f, 0f, 1f, 0f))).toDF("vec_id", "embedding")
    val books = Seq(
      Seq(Array(1.0, 0.0), Array(0.0, 1.0)),
      Seq(Array(1.0, 0.0), Array(1.0, 0.0)))
    val encoded = Similarity.pqEncode(vecs, "embedding", 2, books)
    val newSub = Similarity.pqRefittedSubCodebook(encoded, "embedding", 2, 1, books(1))
    assert(newSub(0) eq books(1)(0))
    assert(newSub(1).toSeq == Seq(1.0, 0.0))
  }

  test("residual IVFADC: exhaustive shortlist is exact; composed recall floor holds") {
    val subDim = 8
    val n = corpus.count().toInt
    val cents = Similarity.fitCentroids(corpus, "vec_id", "embedding", k = 16, iters = 5)
    val assigned = Similarity.ivfAssign(corpus, "embedding", cents)
    // residual codebooks from 16 donor residuals w.r.t. their cells
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var x = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) { x += a(i) * b(i); i += 1 }
      x
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (d == 0.0) 0.0 else dot(a, b) / d
    }
    val donors = corpus
      .filter(col("vec_id").between(1, 16))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val donorRes = donors.map { v =>
      val cell = cents.zipWithIndex
        .map { case (c, i) => (cos(v, c), i) }.maxBy { case (s, i) => (s, i) }._2
      v.zip(cents(cell)).map { case (x, y) => x - y }
    }
    val books = (0 until query.length / subDim)
      .map(s => donorRes.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity
      .pqEncodeResidual(assigned, "embedding", subDim, cents, books)
    // structural identity: all cells probed + shortlist >= corpus means
    // the ADC ranking is irrelevant — the exact re-rank over every
    // candidate MUST return the brute-force top-10
    val exhaustive = ids(Similarity.ivfPqResidualTopK(
      encoded, "embedding", cents, books, query, subDim,
      nprobe = cents.size, shortlist = n, k = 10))
    assert(exhaustive == exactTop10,
      s"exhaustive residual hybrid must be exact: $exhaustive vs $exactTop10")
    // the composed approximation at the hybrid test's operating point
    // (probe 8/16, ADC shortlist 150): measured 0.8 on this
    // near-uniform worst-case data — the residual codes reconstruct
    // x - c_cell instead of x, so the same 16-entry byte budget holds
    // the ADC ranking tighter; pin the plain hybrid's 0.5 floor
    val hybrid = ids(Similarity.ivfPqResidualTopK(
      encoded, "embedding", cents, books, query, subDim,
      nprobe = 8, shortlist = 150, k = 10))
    val recall = (hybrid & exactTop10).size / 10.0
    info(s"residual IVFADC recall@10 at nprobe 8/16, shortlist 150: $recall")
    assert(recall >= 0.5, s"residual IVF-PQ recall@10 = $recall (approx=$hybrid exact=$exactTop10)")
  }

  test("batched IVFADC: a 1-query batch equals the single-query hybrid row for row") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 4))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val cents = sample.toSeq
    val books = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity.pqEncode(
      Similarity.ivfAssign(corpus, "embedding", cents), "embedding", subDim, books)
    val single = Similarity
      .ivfPqTopK(encoded, "embedding", cents, books, query, subDim,
        nprobe = 2, shortlist = 50, k = 10)
      .select(col("vec_id"), col("approx_score"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    val centsDf = corpus
      .filter(col("vec_id").between(1, 4))
      .select(
        (col("vec_id") - 1).cast("int").as("cell"),
        col("embedding").cast("array<double>").as("ce"))
    val cbDf = centsDf
      .select(col("cell").as("code"), col("ce"),
        explode(array((0 until 8).map(lit): _*)).as("s"))
      .select(col("s"), col("code"), slice(col("ce"), col("s") * subDim + 1, lit(subDim)).as("be"))
    val queries = emb
      .filter(col("vec_id") === 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qe"))
    val batch = Similarity
      .ivfPqTopKBatch(encoded, "embedding", centsDf, cbDf, queries, subDim,
        nSub = 8, codeCount = 4, nprobe = 2, shortlist = 50, k = 10)
      .select(col("vec_id"), col("approx_score"), col("score"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSeq
    // same ids, same approximate scores, same exact scores — the
    // in-plan ADC lookup chain is bit-equal to the driver-literal one
    assert(batch == single, s"batch path diverged:\n$batch\nvs\n$single")
  }

  test("pqSubspaceGradesResidual grades residual codes on residuals, not raw vectors") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 4))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val donors = corpus
      .filter(col("vec_id").between(5, 8))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val cents = sample.toSeq
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val d = math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))
      if (d == 0.0) 0.0 else dot(a, b) / d
    }
    val donorRes = donors.map { v =>
      val cell = cents.zipWithIndex
        .map { case (c, i) => (cos(v, c), i) }
        .maxBy { case (sim, i) => (sim, i) }._2
      v.zip(cents(cell)).map { case (x, y) => x - y }
    }
    val books = (0 until 8).map(sp =>
      donorRes.toSeq.map(_.slice(sp * subDim, (sp + 1) * subDim)))
    val encoded = Similarity.pqEncodeResidual(
      Similarity.ivfAssign(corpus, "embedding", cents), "embedding", subDim, cents, books)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .orderBy(col("subspace"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(6)))
      .toSeq
    val g1 = rows(Similarity.pqSubspaceGradesResidual(encoded, "embedding", subDim, cents, 8))
    // shape: 8 subspaces, full corpus graded, 1-4 residual codes each
    assert(g1.map(_._1) == (0L until 8L), g1.toString)
    val n = corpus.count()
    assert(g1.forall(_._2 == n), g1.toString)
    assert(g1.forall(t => t._3 >= 1L && t._3 <= 4L), g1.toString)
    // deterministic: a re-run reproduces every moment exactly
    assert(g1 == rows(
      Similarity.pqSubspaceGradesResidual(encoded, "embedding", subDim, cents, 8)))
    // and it is NOT the raw-vector grade: grading the raw embedding
    // under the same code columns must differ somewhere (the
    // residual rebuild is what this operator adds)
    val raw = rows(Similarity.pqSubspaceGrades(encoded, "embedding", subDim, 8))
    assert(g1 != raw, "residual grade unexpectedly equals the raw-vector grade")
  }

  test("batched IVFADC served off artifact frames equals the in-plan-frame batch") {
    val subDim = 8
    val sample = corpus
      .filter(col("vec_id").between(1, 4))
      .orderBy(col("vec_id"))
      .collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").map(_.toDouble).toArray)
    val cents = sample.toSeq
    val books = (0 until query.length / subDim)
      .map(s => sample.toSeq.map(_.slice(s * subDim, (s + 1) * subDim)))
    val encoded = Similarity.pqEncode(
      Similarity.ivfAssign(corpus, "embedding", cents), "embedding", subDim, books)
    val ivfPath = "/tmp/graft_idx/spec_batch_cents"
    val pqPath = "/tmp/graft_idx/spec_batch_books"
    graft.sources.Io.writeIvfIndex(encoded.select(col("vec_id"), col("cell")), cents, ivfPath)
    graft.sources.Io.writePqIndex(encoded, books, pqPath)
    // the frame readers reproduce the written geometry exactly
    val centsDf = graft.sources.Io.readIvfCentroidFrame(spark, ivfPath)
    assert(centsDf.columns.toSeq == Seq("cell", "ce"))
    val readCents = centsDf.orderBy(col("cell")).collect()
      .map(_.getAs[scala.collection.Seq[Double]]("ce").toSeq)
    assert(readCents.toSeq == cents.map(_.toSeq), "centroid frame drift")
    val cbDf = graft.sources.Io.readPqCodebookFrame(spark, pqPath)
    assert(cbDf.columns.toSeq == Seq("s", "code", "be"))
    assert(cbDf.count() == books.length.toLong * books.head.length)
    val readBooks = cbDf.orderBy(col("s"), col("code")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getAs[scala.collection.Seq[Double]](2).toSeq))
    val expBooks = books.zipWithIndex.flatMap { case (b, s) =>
      b.zipWithIndex.map { case (c, i) => (s, i, c.toSeq) }
    }
    assert(readBooks.toSeq == expBooks, "codebook frame drift")
    // and serving from them is row-for-row equal to the in-plan frames
    val inPlanCents = corpus
      .filter(col("vec_id").between(1, 4))
      .select(
        (col("vec_id") - 1).cast("int").as("cell"),
        col("embedding").cast("array<double>").as("ce"))
    val inPlanCb = inPlanCents
      .select(col("cell").as("code"), col("ce"),
        explode(array((0 until 8).map(lit): _*)).as("s"))
      .select(col("s"), col("code"), slice(col("ce"), col("s") * subDim + 1, lit(subDim)).as("be"))
    val queries = emb
      .filter(col("vec_id") % 125 === 0 && col("vec_id") =!= 0)
      .select(col("vec_id").as("qid"), col("embedding").cast("array<double>").as("qe"))
    def run(c: org.apache.spark.sql.DataFrame, b: org.apache.spark.sql.DataFrame) =
      Similarity
        .ivfPqTopKBatch(encoded, "embedding", c, b, queries, subDim,
          nSub = 8, codeCount = 4, nprobe = 2, shortlist = 50, k = 10)
        .select(col("qid"), col("vec_id"), col("approx_score"), col("score"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toSeq
    assert(run(centsDf, cbDf) == run(inPlanCents, inPlanCb), "artifact-served batch diverged")
  }
}
