package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static NFC helper the generated code calls — a plain object with no
  * companion class, so scalac emits STATIC forwarders and the codegen
  * string `graft.functions.NfcUtil.nfc(x)` is valid Java. */
object NfcUtil {
  private val Form = java.text.Normalizer.Form.NFC

  /** NFC-normalize; the already-normalized fast path (the overwhelming
    * majority of real text) returns the INPUT UTF8String — no copy, no
    * String round-trip allocation. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, Form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, Form))
  }
}

/** Codegen'd Unicode NFC normalization — the canonicalization step a
  * text-dedup pipeline needs BEFORE any content key: `é` composed
  * (U+00E9) and decomposed (`e` + U+0301) render identically but hash
  * differently, so un-normalized corpora under-deduplicate and split
  * vocabulary statistics across byte-variant spellings of one word.
  * Spark ships no normalizer built-in; a Scala UDF would pay
  * serialization per row — this stays inside whole-stage codegen with a
  * single static call (java.text.Normalizer, ICU-equivalent for the
  * NFC/NFD forms Java implements). DuckDB's `nfc_normalize` replays it
  * exactly, which is what puts the operator under the hash gate. */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING input, got ${child.dataType.simpleString}")

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    NfcUtil.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_nfc"
}
