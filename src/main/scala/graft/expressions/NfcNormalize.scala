package graft.expressions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (UAX #15 canonical composition) as a
  * codegen'd Catalyst expression — the canonicalization step a corpus
  * intake pipeline runs before fingerprinting/dedup, so that
  * `"e" + U+0301` and precomposed `é` hash identically (the reference
  * normalizes scraped text before content-id hashing; re-expressed
  * here as a kernel instead of a Python str call).
  *
  * Parity: DuckDB's `nfc_normalize` implements the same Unicode
  * algorithm, so oracle SQL can mirror this exactly.
  *
  * Fast path: `Normalizer.isNormalized` (the NFC quick-check
  * property) avoids any allocation for already-normal text — which is
  * ~all real corpus text — so the hot loop is a scan, not a rewrite.
  * Null in → null out.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nfc_normalize requires a string input, got ${other.catalogString}")
    }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.nfc(input.asInstanceOf[UTF8String])

  // a single static call keeps the expression inside whole-stage
  // codegen (same discipline as WordShingles/WinnowFingerprints)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.NfcNormalize.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(newChild)
}

object NfcNormalize {

  /** Static kernel shared by interpreted eval and generated code. */
  def nfc(s: UTF8String): UTF8String = {
    // pure-ASCII bytes are NFC by construction — skip the String
    // round-trip entirely (numBytes == numChars implies ASCII)
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column API: `nfcNormalize(text)`. */
  def nfcNormalize(c: Column): Column =
    ColumnBridge.column(NfcNormalize(ColumnBridge.expression(c)))
}
