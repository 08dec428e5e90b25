package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprints (Schleimer et al., SIGMOD 2003) as
  * a single per-document expression: char k-gram hashes → sliding
  * window of w hashes → the DISTINCT per-window minima.
  *
  * Semantics are exactly the relational formulation (explode k-gram
  * positions → `min` over a `rowsBetween(0, w-1)` window → distinct):
  * h_i = leading 8 hex chars of md5 of the k-char substring at i; the
  * minimum is lexicographic over the fixed-width lowercase hex, which
  * equals the numeric minimum of the digest's first 32 bits. Only full
  * windows count — a doc with fewer than k+w-1 chars yields an empty
  * array. The DuckDB oracle mirrors the relational form unchanged.
  *
  * Why an expression and not the window plan: the relational shape
  * materializes one row per k-gram (~300× the corpus) through a
  * shuffle and WindowExec, and Spark's `md5` re-allocates a digest per
  * call. Here the whole doc is fingerprinted in one eval — one reused
  * MessageDigest, an O(n) monotonic-deque sliding min, no exploded
  * rows on the wire. Per-doc work is bounded and the operator stays
  * embarrassingly parallel over the corpus (the 100 TB posture).
  * Interpreted eval (CodegenFallback) is deliberate: one call per doc
  * does its own tight loops — codegen would only inline the call site.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(k >= 1, "winnow_fps: k must be >= 1")
  require(w >= 1, "winnow_fps: w must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fps requires a string input, got ${other.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String]
    val n = text.numChars() - (k - 1) // k-gram count
    if (n < w) return new GenericArrayData(Array.empty[Any]) // no full window
    val md = MessageDigest.getInstance("MD5")
    // first 32 digest bits per gram, as unsigned in a long — numeric
    // min on this equals lexicographic min on the 8-hex-char prefix
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(text.substring(i, i + k).getBytes)
      hs(i) = TextHashKernels.word32(md.digest(), 0)
      i += 1
    }
    // monotonic-deque sliding minimum over windows [i, i+w-1]
    val deque = new Array[Int](n) // indices, increasing h
    var head = 0
    var tail = 0 // deque is hs indices in [head, tail)
    val out = new java.util.LinkedHashSet[Long]()
    i = 0
    while (i < n) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i
      tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= w - 1) out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) {
      arr(j) = UTF8String.fromBytes(TextHashKernels.hexBytes(it.next(), 8))
      j += 1
    }
    new GenericArrayData(arr)
  }

  override def prettyName: String = "winnow_fps"

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowFingerprints {

  /** Column API: distinct winnowing fingerprints of a text column. */
  def winnowFps(text: Column, k: Int, w: Int): Column =
    ColumnBridge.column(WinnowFingerprints(ColumnBridge.expression(text), k, w))
}
