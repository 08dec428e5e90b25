package graft

import graft.expressions.{CosineSimilarity, DotProduct, MinHashSignature, NfcNormalize, NgramStats, SimHash64, SortedHashes64, SortedIntersectSize, WinnowFingerprints, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session extensions: registers the engine's codegen expressions as
  * SQL functions, so `spark.sql("SELECT cosine_similarity(a, b)")`
  * works the same as the Column API (`VectorFns.cosine`). Install via
  * `SparkSession.builder.withExtensions(new GraftExtensions)` (done by
  * `Engine.session`) or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        info(
          "cosine_similarity",
          "cosine_similarity(a, b) - cosine similarity of two array<double> vectors"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "cosine_similarity takes 2 arguments")
          CosineSimilarity(args.head, args(1))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("dot_product"),
        info(
          "dot_product",
          "dot_product(a, b) - dot product of two array<double> vectors"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "dot_product takes 2 arguments")
          DotProduct(args.head, args(1))
        }))
    // per-document text kernels — int parameters must be FOLDABLE (they
    // shape the computation, not per-row inputs), but not necessarily a
    // bare IntegerType literal: `word_shingles(t, 1+2)`, a BIGINT
    // literal, or a CAST all fold to a constant here, and non-foldable
    // args get a typed AnalysisException instead of a raw plan-time
    // IllegalArgumentException.
    def intArg(e: Expression, fn: String, param: String): Int =
      if (e.foldable) e.eval() match {
        case i: Int                  => i
        case l: Long if l.isValidInt => l.toInt
        case s: Short                => s.toInt
        case b: Byte                 => b.toInt
        case other =>
          throw new IllegalArgumentException(
            s"$fn: parameter '$param' must be a constant integer, got $other")
      }
      else
        throw new org.apache.spark.sql.AnalysisException(
          errorClass = "NON_FOLDABLE_ARGUMENT",
          messageParameters = Map(
            "funcName" -> s"`$fn`",
            "paramName" -> s"`$param`",
            "paramType" -> "\"INT\""))
    ext.injectFunction(
      (
        FunctionIdentifier("nfc_normalize"),
        info(
          "nfc_normalize",
          "nfc_normalize(text) - Unicode NFC canonical composition (UAX #15)"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "nfc_normalize takes 1 argument")
          NfcNormalize(args.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("word_shingles"),
        info(
          "word_shingles",
          "word_shingles(text, n) - distinct word n-gram shingles of a document"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "word_shingles takes 2 arguments")
          WordShingles(args.head, intArg(args(1), "word_shingles", "n"))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("minhash_sig"),
        info(
          "minhash_sig",
          "minhash_sig(shingles, k) - k-min-hash signature of a shingle set as array<long>"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "minhash_sig takes 2 arguments")
          MinHashSignature(args.head, intArg(args(1), "minhash_sig", "k"))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("simhash64"),
        info(
          "simhash64",
          "simhash64(text) - 64-bit SimHash fingerprint as 16 hex chars"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "simhash64 takes 1 argument")
          SimHash64(args.head, Int.MaxValue)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("winnow_fps"),
        info(
          "winnow_fps",
          "winnow_fps(text, k, w) - distinct winnowing fingerprints (k-gram, window w)"),
        (args: Seq[Expression]) => {
          require(args.length == 3, "winnow_fps takes 3 arguments")
          WinnowFingerprints(args.head, intArg(args(1), "winnow_fps", "k"), intArg(args(2), "winnow_fps", "w"))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("ngram_stats"),
        info(
          "ngram_stats",
          "ngram_stats(text, n) - struct(total, distinct, top) word n-gram occurrence stats"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "ngram_stats takes 2 arguments")
          NgramStats(args.head, intArg(args(1), "ngram_stats", "n"))
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("sorted_hashes64"),
        info(
          "sorted_hashes64",
          "sorted_hashes64(strings) - sorted distinct 64-bit md5 hashes of the strings"),
        (args: Seq[Expression]) => {
          require(args.length == 1, "sorted_hashes64 takes 1 argument")
          SortedHashes64(args.head)
        }))
    ext.injectFunction(
      (
        FunctionIdentifier("sorted_intersect_size"),
        info(
          "sorted_intersect_size",
          "sorted_intersect_size(a, b) - |A∩B| of two ascending-sorted array<long>"),
        (args: Seq[Expression]) => {
          require(args.length == 2, "sorted_intersect_size takes 2 arguments")
          SortedIntersectSize(args.head, args(1))
        }))
  }
}
