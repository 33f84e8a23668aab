package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Runtime support for [[NormalizeUnicode]] — kept as static methods so
  * whole-stage codegen can call them directly. */
object NormalizeHelpers {
  private val Forms: Array[Normalizer.Form] = Array(
    Normalizer.Form.NFC, Normalizer.Form.NFD,
    Normalizer.Form.NFKC, Normalizer.Form.NFKD)

  def formOrdinal(form: String): Int = form match {
    case "NFC"  => 0
    case "NFD"  => 1
    case "NFKC" => 2
    case "NFKD" => 3
    case other => throw new IllegalArgumentException(
      s"unknown Unicode normalization form '$other' (NFC/NFD/NFKC/NFKD)")
  }

  /** Normalize a UTF8String under the given form ordinal, cheapest check
    * first: (1) pure-ASCII input (the overwhelmingly common case in a
    * clean corpus) is normalized under every UAX #15 form — detected by
    * a byte scan on the raw UTF8String with ZERO allocation, the input
    * object is returned; (2) non-ASCII but already-normalized input pays
    * one UTF8String→String copy for `Normalizer.isNormalized`'s
    * verification pass and returns the input; (3) only rows that
    * actually need rewriting pay the full String round-trip. */
  def normalize(s: UTF8String, form: Int): UTF8String = {
    var i = 0
    val n = s.numBytes()
    while (i < n && s.getByte(i) >= 0) i += 1
    if (i == n) return s // pure ASCII: normalized under all four forms
    val str = s.toString
    val f = Forms(form)
    if (Normalizer.isNormalized(str, f)) s
    else UTF8String.fromString(Normalizer.normalize(str, f))
  }
}

/** Unicode normalization (NFC/NFD/NFKC/NFKD, UAX #15) of a string column
  * as a codegen'd native expression.
  *
  * Why native: Spark ships no Unicode-normalization builtin, and the UDF
  * alternative breaks whole-stage codegen around the hottest row-local
  * stage of a curation pipeline (normalization runs over EVERY ingested
  * byte before any gate). This expression stays inside the codegen span
  * and its fast path ([[NormalizeHelpers.normalize]]) returns the input
  * object untouched for already-normalized rows. The `form` is a plan-time
  * literal, validated at construction. */
case class NormalizeUnicode(child: Expression, form: String)
    extends UnaryExpression {

  private val formOrd: Int = NormalizeHelpers.formOrdinal(form)

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    NormalizeHelpers.normalize(input.asInstanceOf[UTF8String], formOrd)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.NormalizeHelpers.normalize($a, $formOrd);")

  override protected def withNewChildInternal(newChild: Expression): NormalizeUnicode =
    copy(child = newChild)
}

object StringFunctions {
  /** Unicode-normalized copy of a string column (default NFC). */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    ColumnBridge.column(NormalizeUnicode(ColumnBridge.expression(c), form))
}
