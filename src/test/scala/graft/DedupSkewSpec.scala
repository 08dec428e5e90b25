package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Adversarial-skew fixture for the dedup pair generators (SURVEY §2.12
  * T2/T3 at 100 TB): one hot shingle at ~100× the median document
  * frequency — the "every page has the same boilerplate footer" shape
  * that makes naive shingle-join dedup quadratic in production.
  *
  * The point is MEASURED boundedness, not just green output: the
  * candidate-pair volume (sum over join buckets of C(df, 2) — exactly
  * the row count the pair join emits before any filter) is computed
  * with and without the df cap, and the cap must collapse it from
  * quadratic-in-corpus to linear-in-planted-dups. AQE's skew-join
  * split handles moderate residual skew at runtime; the cap removes
  * the degenerate buckets AQE can only dilute, not shrink.
  */
class DedupSkewSpec extends SparkSpec {
  import spark.implicits._

  private val N = 300 // corpus size; hot shingle df = N, median df = 1

  /** Doc i: a shared 3-word boilerplate phrase (ONE hot 3-gram shingle
    * with df = N) followed by unique filler words (every other shingle
    * has df 1). Docs N..N+4 are planted near-dups of docs 0..4 (same
    * filler, one appended word).
    */
  private lazy val corpus = {
    val base = (0 until N).map { i =>
      (i.toLong, s"common anchor phrase u${i}a u${i}b u${i}c u${i}d u${i}e")
    }
    val dups = (0 until 5).map { i =>
      (N + i.toLong, s"common anchor phrase u${i}a u${i}b u${i}c u${i}d u${i}e extra")
    }
    (base ++ dups).toDF("doc_id", "text")
  }

  /** Candidate-pair volume of the shingle equi-join: sum of C(df, 2)
    * over shingles, optionally df-capped — the exact number of rows
    * the `a JOIN b ON shingle` stage produces (before id_a < id_b
    * halves it).
    */
  private def candidateVolume(maxDf: Option[Int]): Long = {
    val df = Dedup
      .shingleTable(corpus, "text", "doc_id", 3)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
    val kept = maxDf.fold(df)(cap => df.filter(col("df") <= cap))
    kept
      .agg(sum(col("df") * (col("df") - 1) / 2).cast("long"))
      .head().getLong(0)
  }

  test("hot shingle makes the uncapped pair stage quadratic; the df cap bounds it") {
    val uncapped = candidateVolume(None)
    val capped = candidateVolume(Some(100))
    // the single hot shingle alone contributes C(305, 2) = 46 360 pairs
    assert(uncapped >= N.toLong * (N - 1) / 2, s"uncapped volume $uncapped not quadratic?")
    // capped: only the planted dups' shared rare shingles survive —
    // bounded by (planted pairs) × (shingles per doc), nowhere near N²
    assert(capped <= 5L * 10, s"capped volume $capped should be linear in planted dups")
  }

  test("ngramJaccardPairs under skew: exactly the planted pairs, no boilerplate pairs") {
    val pairs = Dedup
      .ngramJaccardPairs(corpus, "text", "doc_id", 3, 0.5, maxDf = 100)
      .orderBy(col("id_a"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(pairs == (0 until 5).map(i => (i.toLong, (N + i).toLong)))
  }

  test("minhashLshPairs under skew: verify step still emits exactly the planted pairs") {
    // the hot shingle CAN put unrelated docs in one band bucket (it
    // wins a doc's min-hash with prob ~1/|shingles|), so the candidate
    // stage sees some boilerplate collisions — the exact-jaccard verify
    // must still cut the output to the planted near-dups only
    val pairs = Dedup
      .minhashLshPairs(corpus, "text", "doc_id", 3, 8, 1, 0.5)
      .orderBy(col("id_a"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(pairs == (0 until 5).map(i => (i.toLong, (N + i).toLong)))
  }

  test("minhashLshAgainst: batch near-dups of history match; fresh docs don't") {
    // history = docs 0..N-1; batch = 5 near-dups of docs 0..4 plus 5
    // fresh docs sharing only the hot boilerplate shingle
    val hist = corpus.filter(col("doc_id") < N)
    val batch = ((0 until 5).map { i =>
      (1000 + i.toLong, s"common anchor phrase u${i}a u${i}b u${i}c u${i}d u${i}e extra")
    } ++ (0 until 5).map { i =>
      (2000 + i.toLong, s"common anchor phrase f${i}a f${i}b f${i}c f${i}d f${i}e")
    }).toDF("doc_id", "text")
    val m = Dedup
      .minhashLshAgainst(batch, hist, "text", "doc_id", 3, 8, 1, 0.5)
      .select(col("id_a"), col("id_b"))
      .orderBy(col("id_a"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .toSeq
    assert(m == (0 until 5).map(i => (1000 + i.toLong, i.toLong)),
      s"expected exactly the planted (batch, history) matches, got $m")
  }

  /** Line-dedup skew: one boilerplate line at ~100× the median line
    * frequency (df = N vs 1), the exact shape corpus line dedup exists
    * for. Correctness AND plan shape are both asserted: the two-phase
    * groupBy-count → filter-on-counts → join-back must (a) drop the
    * hot line everywhere while keeping every unique line, and (b)
    * contain no WindowExec — a `count().over(partitionBy(line))`
    * would funnel all N occurrences of the hot line into one buffered
    * window group, the straggler/spill AQE cannot split.
    */
  private lazy val linedCorpus = {
    val rows = (0 until N).map { i =>
      (i.toLong, Seq((0, "all rights reserved"), (1, s"unique line $i")))
    }
    rows.toDF("doc_id", "lines")
      .select(col("doc_id"), explode(col("lines")).as("pl"))
      .select(col("doc_id"), col("pl._1").as("pos"), col("pl._2").as("line"))
  }

  test("rareLineSurvivors under skew: hot boilerplate line dies, unique lines survive") {
    val out = Dedup.rareLineSurvivors(linedCorpus, "line", maxDf = 3)
    val kept = out.select(col("line")).collect().map(_.getString(0)).toSet
    assert(!kept.contains("all rights reserved"), "hot line must be dropped")
    assert(kept.size == N, s"all $N unique lines must survive, got ${kept.size}")
    assert(out.count() == N.toLong)
  }

  test("rareLineSurvivors: NULL lines follow the same df rule, not silent drop") {
    val rows = Seq((1L, 0, "unique line"), (2L, 0, null), (3L, 0, "all rights reserved"))
    val withNull = rows.toDF("doc_id", "pos", "line")
      .union(linedCorpus.select(col("doc_id") + 1000, col("pos"), col("line")))
    val kept = Dedup.rareLineSurvivors(withNull, "line", maxDf = 3)
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(kept.contains(2L), "a rare NULL line must survive like any rare line")
    assert(!kept.contains(3L), "hot line still dies")
  }

  test("rareLineSurvivors plan: HashAggregate + join, no WindowExec") {
    val plan = Dedup
      .rareLineSurvivors(linedCorpus, "line", maxDf = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"skew-prone WindowExec in plan:\n$plan")
    assert(plan.contains("HashAggregate"), s"expected two-phase HashAggregate:\n$plan")
    assert(plan.contains("Join"), s"expected join-back:\n$plan")
  }
}
