package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local coverage scan for exact substring-dedup REMOVAL
  * ([[graft.ext.Dedup.substringStrip]]).
  *
  * The relational formulation exploded every duplicated k-token window
  * occurrence into its k covered positions (`sequence(pos, pos+k-1)` —
  * a k× row blowup of the duplicated-text volume), aggregated the
  * (doc, pos) coverage flags, and joined them against the corpus
  * exploded to one row per token. This expression computes the same
  * decision in ONE forward O(n_tokens + n_occurrences) pass per
  * document: all windows have the same length k, so "position p is
  * covered by a removable (resp. keeper) occurrence" reduces to "the
  * LARGEST removable (keeper) window start ≤ p is ≥ p−k+1" — a
  * two-pointer sweep over the doc's sorted marked-window starts. No
  * coverage explode, no (doc, pos)-keyed shuffle, no token explode.
  *
  * Inputs: `toks` = the doc's `\S+` token array; `marked` = the doc's
  * duplicated-window occurrences as `array<struct<pos:int,
  * _isk:boolean>>`, SORTED ascending by pos (callers build it with
  * `sort_array(collect_list(...))`; pos is unique per doc so the
  * struct sort is a pos sort). Output: struct(removed: long — stripped
  * token count, kept: string — surviving tokens space-joined in
  * order, null tokens skipped exactly like `concat_ws`).
  *
  * Equality with the exploded pipeline is pinned by ExtSpec's
  * "row-local scan ≡ relational coverage pipeline" test over the real
  * documents fixture (plant included) plus adversarial chained-overlap
  * cases.
  */
case class SubstringStripScan(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"window width must be >= 1, got $k")

  override def dataType: DataType = StructType(Seq(
    StructField("removed", LongType, nullable = false),
    StructField("kept", StringType, nullable = false)))
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(t: Any, m: Any): Any =
    StripHelpers.stripScan(t.asInstanceOf[ArrayData],
      m.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StripHelpers.stripScan($a, $b, $k);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SubstringStripScan =
    copy(left = newLeft, right = newRight)
}

object StripHelpers {
  /** The shared scan body — see [[SubstringStripScan]]. A position p is
    * stripped iff some removable occurrence covers it (max removable
    * start ≤ p is within [p−k+1, p]) and NO keeper occurrence covers it
    * (keeper protection — the r10 chained-overlap carve-out). */
  def stripScan(toks: ArrayData, marked: ArrayData, k: Int): InternalRow = {
    val n = toks.numElements()
    val m = marked.numElements()
    var j = 0
    // sentinels far below any valid window start (starts are >= 0)
    var lastR = Int.MinValue / 2
    var lastK = Int.MinValue / 2
    var removed = 0L
    val kept = new java.util.ArrayList[UTF8String](n)
    var p = 0
    while (p < n) {
      while (j < m && marked.getStruct(j, 2).getInt(0) <= p) {
        val st = marked.getStruct(j, 2)
        if (st.getBoolean(1)) lastK = st.getInt(0) else lastR = st.getInt(0)
        j += 1
      }
      val lo = p - k + 1
      if (lastR >= lo && lastK < lo) removed += 1L
      else if (!toks.isNullAt(p)) kept.add(toks.getUTF8String(p))
      p += 1
    }
    val keptStr = UTF8String.concatWs(UTF8String.fromString(" "),
      kept.toArray(new Array[UTF8String](kept.size())): _*)
    new GenericInternalRow(Array[Any](removed, keptStr))
  }
}

object StripFunctions {
  /** (removed, kept) struct of the substring-strip coverage scan over a
    * token array and the doc's sorted marked-window occurrences. */
  def substringStripScan(toks: Column, marked: Column, k: Int): Column =
    ColumnBridge.column(SubstringStripScan(
      ColumnBridge.expression(toks), ColumnBridge.expression(marked), k))
}
