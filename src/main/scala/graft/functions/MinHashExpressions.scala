package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native replacements for the MinHash column builders that were written
  * as lambda higher-order functions (`transform` + `xxhash64`). HOFs are
  * CodegenFallback: every element evaluates an interpreted expression tree
  * with per-element boxing — measured ~0.65 s to shingle 52 k n-grams and
  * ~0.3 s for the 64 per-permutation minima at sf0.1 (1 000 docs), i.e.
  * >10 µs per shingle for what is a handful of hash instructions.
  *
  * Hash values are BIT-IDENTICAL to the original formulations: each helper
  * replays the exact `XxHash64` child-chaining Spark's `xxhash64` performs
  * (seed 42; strings via `XXH64.hashUTF8String`, int literals via
  * `XXH64.hashInt`, longs via `XXH64.hashLong`) — asserted against the HOF
  * formulations over real testdata in ExtSpec. So persisted band indexes,
  * the batch operators, and the streaming probes all keep matching each
  * other regardless of which side was built before the swap.
  *
  * Both `eval` and the generated code call the same static helpers: the
  * expression stays inside whole-stage codegen (single virtual call per
  * row), and the loop body runs as JIT-compiled bytecode either way.
  */
object MinHashHelpers {
  /** Distinct hashed n-gram shingles in first-occurrence order (the
    * `array_distinct(transform(...))` contract). Null words are skipped in
    * the hash chain, matching `xxhash64`'s null-child semantics. */
  def shingleHashes(words: ArrayData, n: Int): ArrayData = {
    val nw = words.numElements()
    val m = nw - n + 1
    if (m <= 0) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](m)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    var cnt = 0
    var i = 0
    while (i < m) {
      var h = 42L
      var k = 0
      while (k < n) {
        if (!words.isNullAt(i + k)) {
          h = XXH64.hashUTF8String(
            words.get(i + k, org.apache.spark.sql.types.StringType)
              .asInstanceOf[UTF8String], h)
        }
        k += 1
      }
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, cnt))
  }

  /** Per-permutation seeds `xxhash64(lit(i), ·)` starts from — hashInt of
    * the permutation index into the default seed. Cached per numHashes. */
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def seeds(numHashes: Int): Array[Long] =
    seedCache.computeIfAbsent(numHashes, nh => {
      val s = new Array[Long](nh)
      var i = 0
      while (i < nh) { s(i) = XXH64.hashInt(i, 42L); i += 1 }
      s
    })

  /** MinHash signature: per permutation i, min over shingles s of
    * `xxhash64(lit(i), s)` = hashLong(s, hashInt(i, 42)). */
  def minhashSig(shs: ArrayData, numHashes: Int): ArrayData = {
    val sd = seeds(numHashes)
    val out = new Array[Long](numHashes)
    java.util.Arrays.fill(out, Long.MaxValue)
    val n = shs.numElements()
    var any = false
    var j = 0
    while (j < n) {
      if (!shs.isNullAt(j)) {
        any = true
        val s = shs.getLong(j)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(s, sd(i))
          if (h < out(i)) out(i) = h
          i += 1
        }
      }
      j += 1
    }
    // array_min over an empty (or all-null) array is null — mirror it
    if (!any) new GenericArrayData(Array.fill[Any](numHashes)(null))
    else new GenericArrayData(out)
  }

  /** Band keys: per band b, `xxhash64(lit(b), slice(sig, b·r+1, r))` =
    * fold of hashLong over the band's rows seeded with hashInt(b, 42). */
  def bandKeys(sig: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = XXH64.hashInt(b, 42L)
      var r = 0
      while (r < rowsPerBand) {
        val idx = b * rowsPerBand + r
        if (idx < sig.numElements() && !sig.isNullAt(idx))
          h = XXH64.hashLong(sig.getLong(idx), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
}

/** `array<string>` words → `array<long>` distinct hashed n-gram shingles
  * (first-occurrence order), bit-identical to
  * `array_distinct(transform(sequence, i -> xxhash64(w_{i+1}..w_{i+n})))`. */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashHelpers.shingleHashes(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashHelpers.shingleHashes($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** `array<long>` shingle hashes → `array<long>` MinHash signature,
  * bit-identical to `array((0 until k).map(i =>
  * array_min(transform(shs, s => xxhash64(lit(i), s)))))`. */
case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  require(numHashes >= 1, s"numHashes must be >= 1, got $numHashes")
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashHelpers.minhashSig(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashHelpers.minhashSig($a, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `array<long>` signature → `array<long>` LSH band keys, bit-identical to
  * `transform(sequence(0, bands-1), b -> xxhash64(b, slice(sig, b·r+1, r)))`. */
case class MinHashBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  require(bands >= 1 && rowsPerBand >= 1,
    s"bands/rowsPerBand must be >= 1, got $bands/$rowsPerBand")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    MinHashHelpers.bandKeys(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.MinHashHelpers.bandKeys($a, $bands, $rowsPerBand);")

  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

object MinHashFunctions {
  /** Distinct hashed n-gram shingles of an `array<string>` words column. */
  def shingleHashes(words: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(words), n))

  /** MinHash signature of an `array<long>` shingle-hash column. */
  def minhashSig(shs: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(shs), numHashes))

  /** LSH band keys of an `array<long>` signature column. */
  def bandKeys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(MinHashBandKeys(ColumnBridge.expression(sig), bands, rowsPerBand))
}
