package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The x100 scale curve's STRUCTURAL invariants as a spec floor —
  * SCALE_r09/SCALE_r10 demonstrate the numbers, but a JSON artifact
  * can silently degrade; this suite pins the three structural facts
  * the curves rest on, at a cheap 10× amplification of the sf0.001
  * corpus. Wall-clock is deliberately NOT asserted (host noise):
  * structure only.
  *
  * The amplification is ScaleBench's workload-shape-preserving
  * construction (ScaleBench.docsX): copy i offsets doc_id by i·1e6
  * and suffixes every token with q<i>, so each copy reproduces the
  * base corpus's shingle/pair/cluster structure while copies share
  * no shingle.
  */
class ScaleInvariantsSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"

  private lazy val base = spark.read.parquet(s"$sfDir/documents.parquet")

  /** ScaleBench.docsX's construction, inlined (the main is private). */
  private def docsX(m: Int): DataFrame =
    (0 until m)
      .map { i =>
        val text =
          if (i == 0) col("text")
          else
            array_join(
              transform(split(col("text"), "\\s+"), t => concat(t, lit(s"q$i"))),
              " ")
        base.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          text.as("text"))
      }
      .reduce(_ unionByName _)

  private def maxShingleDf(docs: DataFrame): Long =
    Dedup
      .shingleTable(docs, "text", "doc_id", 3)
      .groupBy(col("shingle"))
      .agg(count(lit(1)).as("n"))
      .agg(max(col("n")))
      .head()
      .getLong(0)

  test("shingle skew is amplification-invariant: max bucket df at 10x equals 1x") {
    // the df-cap argument's load-bearing premise: amplification (and,
    // by the same construction, a real corpus decade of NEW content)
    // adds shingle KEYS, not shingle DEPTH — no bucket grows with the
    // corpus, so the pair join's worst task is scale-constant. If
    // this ever fails, the superlinear-risk adjudication in PLANS.md
    // is void and the df-cap needs re-derivation.
    val df1 = maxShingleDf(docsX(1))
    val df10 = maxShingleDf(docsX(10))
    assert(df10 == df1, s"max shingle df grew under amplification: 1x=$df1 10x=$df10")
  }

  test("closure round count is scale-invariant: 10x converges in the same fixed budget as 1x") {
    // clusterPairs is O(log diameter) rounds; the amplified corpus is
    // 10 disjoint isomorphic copies, so its component diameters — and
    // therefore the round count — must NOT grow. Pinned behaviorally:
    // run both scales under the SAME small round budget and assert
    // the result is a true fixpoint (every edge's endpoints carry one
    // label — exactly what a round-count regression would break
    // first, since the cap would bite before convergence).
    val budget = 6
    def fixpointHolds(docs: DataFrame): Unit = {
      val pairs = Dedup
        .ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2)
        .select(col("id_a"), col("id_b"))
        .persist()
      val labels = Dedup.clusterPairs(pairs, maxIters = budget)
      val split = pairs
        .join(labels.select(col("id").as("id_a"), col("cluster_id").as("ca")), "id_a")
        .join(labels.select(col("id").as("id_b"), col("cluster_id").as("cb")), "id_b")
        .filter(col("ca") =!= col("cb"))
        .count()
      pairs.unpersist()
      assert(split == 0L, s"$split edges still straddle clusters after $budget rounds")
    }
    fixpointHolds(docsX(1))
    fixpointHolds(docsX(10))
  }

  test("postings rows are exactly linear in docs: rows(10x) == 10 * rows(1x)") {
    // the postings artifact's size law — each amplified copy's tokens
    // are disjoint from every other copy's, so the inverted index
    // must grow by exactly the copy count; any deviation means the
    // index is storing something corpus-global (the shape that stops
    // being writable at 100 TB).
    val r1 = TextAnalysis.invertedIndex(docsX(1), "text", "doc_id").count()
    val r10 = TextAnalysis.invertedIndex(docsX(10), "text", "doc_id").count()
    assert(r10 == 10L * r1, s"postings not linear: 1x=$r1 10x=$r10")
  }

  test("binseg amplification law: 10x rows leave split locations fixed and scale g6 exactly 10x") {
    import spark.implicits._
    // The rate-binseg statistic is Σ c·round(ln(c/n)·1e6) with every
    // count multiplied by the amplification and every RATIO c/n
    // unchanged — so a k× row amplification must reproduce the SAME
    // split buckets with g6 exactly k× (the merge-invariance the
    // streaming twin and the x100 curve both rest on). Any deviation
    // means the scan is reading something row-positional, not the
    // (bucket, n, x) sufficient statistic.
    val rows = Seq(
      ("b1", false), ("b1", false), ("b1", true),
      ("b2", false), ("b2", true), ("b2", true),
      ("b3", true), ("b3", true), ("b3", true),
      ("b4", true), ("b4", false), ("b4", true)).toDF("b", "ok")
    val amp10 = (0 until 10).map(_ => rows).reduce(_ unionByName _)
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Checks.binomialBinseg2(df, col("ok"), col("b"))
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
        .toSeq
    val one = run(rows)
    val ten = run(amp10)
    assert(one.map(t => (t._1, t._2, t._3)) == ten.map(t => (t._1, t._2, t._3)),
      s"split locations moved under amplification: $one vs $ten")
    assert(
      ten == one.map(t =>
        (t._1, t._2, t._3, t._4 * 10, t._5 * 10, t._6 * 10, t._7 * 10, t._8 * 10)),
      s"g6/counts not exactly 10x: $one vs $ten")
  }
}
