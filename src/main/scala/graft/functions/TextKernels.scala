package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.CatalystBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-hashing kernels. Semantics are EXACTLY the Parity
  * higher-order-function forms (and therefore the DuckDB oracle):
  *
  *   - tokens: `split(text, ' ')` with limit -1 — empty tokens kept;
  *   - shingles: w-grams of consecutive tokens joined by ' ', first-seen
  *     distinct; fewer than w tokens → empty array;
  *   - 31-bit hash: polynomial rolling hash over UNICODE CODEPOINTS,
  *     h = (h·31 + cp) mod (2^31 − 1), matching Spark `ascii` / DuckDB
  *     `unicode` per-character semantics — the shingle-hash domain
  *     (MinHash permutations need x < P);
  *   - 62-bit fingerprint: two independent rolling hashes (base 31 mod P,
  *     base 37 mod P2) packed hashA·2^31 + hashB — the dedup/fingerprint
  *     domain, where a collision silently loses a document.
  *
  * The HOF forms evaluate one interpreted lambda call per character;
  * these kernels run one static JVM call per row (w=1 non-distinct wide
  * gives per-token 62-bit hashes for SimHash; the oracle gate at sf0.01
  * pins the equivalence).
  */
object TextKernels {

  val P: Long = Parity.P
  val P2: Long = Parity.P2
  val Base2: Long = Parity.Base2
  val Pack: Long = Parity.Pack

  /** 62-bit two-hash fingerprint of one string over codepoints. Called
    * from generated code (top-level object → static forwarder).
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var a = 0L
    var b = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      a = (a * 31 + cp) % P
      b = (b * Base2 + cp) % P2
      i += Character.charCount(cp)
    }
    a * Pack + b
  }

  /** Hashes of the w-gram shingles (distinct ON THE SHINGLE STRING, first
    * occurrence order — matching `array_distinct` before hashing in the
    * HOF/oracle form, so a hash collision between distinct shingles keeps
    * both rows on both engines) or, for w = 1 with distinct = false, the
    * multiset of token hashes. `wide = false` → 31-bit hash (MinHash
    * domain); `wide = true` → 62-bit two-hash pack (SimHash domain).
    */
  def shingleHashes(s: UTF8String, w: Int, distinct: Boolean, wide: Boolean): ArrayData = {
    val toks = s.toString.split(" ", -1)
    if (toks.length < w) return new GenericArrayData(Array.emptyLongArray)
    val n = toks.length - w + 1
    val out = new Array[Long](n)
    var m = 0
    val seen = if (distinct) new java.util.HashSet[String]() else null
    var i = 0
    while (i < n) {
      // Hash of toks(i..i+w-1) joined by ' ' — identical to hashing the
      // joined string because the separator is itself hashed.
      var acc = 0L
      var acc2 = 0L
      var keep = true
      if (seen != null) {
        val sb = new java.lang.StringBuilder
        var k = 0
        while (k < w) {
          if (k > 0) sb.append(' ')
          sb.append(toks(i + k))
          k += 1
        }
        keep = seen.add(sb.toString)
      }
      if (keep) {
        var k = 0
        while (k < w) {
          if (k > 0) {
            acc = (acc * 31 + ' '.toInt) % P
            if (wide) acc2 = (acc2 * Base2 + ' '.toInt) % P2
          }
          val t = toks(i + k)
          var j = 0
          while (j < t.length) {
            val cp = t.codePointAt(j)
            acc = (acc * 31 + cp) % P
            if (wide) acc2 = (acc2 * Base2 + cp) % P2
            j += Character.charCount(cp)
          }
          k += 1
        }
        out(m) = if (wide) acc * Pack + acc2 else acc
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
  }

  /** MinHash signature of one string in a single pass: the 32 permuted
    * minima over the w-gram shingle hashes — bit-for-bit the grouped
    * 32×min aggregation over the exploded shingle relation (min is
    * multiplicity-blind, so shingle distinctness is irrelevant), pinned
    * by KernelParitySpec. Returns an EMPTY array for docs with fewer
    * than w tokens — the rows the grouped form drops; callers filter
    * `size(sig) > 0`.
    */
  def minhashSigs(s: UTF8String, w: Int): ArrayData = {
    val hs = shingleHashes(s, w, distinct = false, wide = false)
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(Array.emptyLongArray)
    val out = Array.fill(Parity.NumHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      var k = 0
      while (k < Parity.NumHashes) {
        val (a, b) = Parity.minhashCoeffs(k)
        val v = (a * h + b) % P
        if (v < out(k)) out(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 60-bit SimHash of one string in a single pass: per-token 62-bit
    * two-hash pack, per-bit majority over token OCCURRENCES — bit-for-bit
    * the grouped-aggregation form (Parity.simhashAggSpark over exploded
    * tokenHashes + simhashFromCounts), which the KernelParitySpec pins.
    * Exists for the per-ROW domains the grouped form can't serve: a
    * streaming row needs its fingerprint before any grouping exists.
    */
  def simHash64(s: UTF8String): Long = {
    val toks = s.toString.split(" ", -1)
    val counts = new Array[Int](Parity.SimHashBits)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var a = 0L
      var b2 = 0L
      var j = 0
      while (j < t.length) {
        val cp = t.codePointAt(j)
        a = (a * 31 + cp) % P
        b2 = (b2 * Base2 + cp) % P2
        j += Character.charCount(cp)
      }
      val h = a * Pack + b2
      var b = 0
      while (b < Parity.SimHashBits) {
        counts(b) += ((h >>> b) & 1L).toInt
        b += 1
      }
      i += 1
    }
    val n = toks.length
    var out = 0L
    var b = 0
    while (b < Parity.SimHashBits) {
      if (2L * counts(b) > n) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** `poly_hash(text)` — codegen scalar form of [[TextKernels.polyHash]]. */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "poly_hash"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.polyHash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.polyHash($c)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `word_shingle_hashes(text, w, distinct, wide)` — codegen array form of
  * [[TextKernels.shingleHashes]].
  */
case class WordShingleHashes(child: Expression, w: Int, distinct: Boolean,
    wide: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], w, distinct, wide)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingleHashes($c, $w, $distinct, $wide)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

/** `minhash_sigs(text, w)` — codegen array form of
  * [[TextKernels.minhashSigs]].
  */
case class MinHashSigs(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.minhashSigs(input.asInstanceOf[UTF8String], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.minhashSigs($c, $w)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

/** `simhash64(text)` — codegen scalar form of [[TextKernels.simHash64]]. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.simHash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simHash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object TextHashOps {
  def polyHash(c: Column): Column =
    CatalystBridge.column(PolyHash(CatalystBridge.expression(c)))

  def simHash(c: Column): Column =
    CatalystBridge.column(SimHash64(CatalystBridge.expression(c)))

  def minhashSigs(c: Column, w: Int): Column =
    CatalystBridge.column(MinHashSigs(CatalystBridge.expression(c), w))

  def shingleHashes(c: Column, w: Int, distinct: Boolean = true): Column =
    CatalystBridge.column(
      WordShingleHashes(CatalystBridge.expression(c), w, distinct, wide = false))

  /** 62-bit per-token hashes (SimHash input). */
  def tokenHashes(c: Column): Column =
    CatalystBridge.column(
      WordShingleHashes(CatalystBridge.expression(c), 1, distinct = false, wide = true))

  /** 62-bit w-gram hashes, every occurrence kept (the repetition-fold
    * domain: run-length counting needs the multiset, and the in-doc
    * argmax merge risk wants the two-hash collision bound).
    */
  def shingleHashesWide(c: Column, w: Int): Column =
    CatalystBridge.column(
      WordShingleHashes(CatalystBridge.expression(c), w, distinct = false, wide = true))
}
