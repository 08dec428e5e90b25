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
}
