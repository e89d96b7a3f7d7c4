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
  *   - hash: polynomial rolling hash over UNICODE CODEPOINTS,
  *     h = (h·31 + cp) mod (2^31 − 1), matching Spark `ascii` / DuckDB
  *     `unicode` per-character semantics.
  *
  * The HOF forms evaluate one interpreted lambda call per character;
  * these kernels run one static JVM call per row (w=1 non-distinct gives
  * per-token hashes for SimHash; the oracle gate at sf0.01 pins the
  * equivalence).
  */
object TextKernels {

  val P: Long = Parity.P

  /** Poly hash of one string over codepoints. Called from generated code
    * (top-level object → static forwarder).
    */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Hashes of the w-gram shingles (distinct ON THE SHINGLE STRING, first
    * occurrence order — matching `array_distinct` before hashing in the
    * HOF/oracle form, so a hash collision between distinct shingles keeps
    * both rows on both engines) or, for w = 1 with distinct = false, the
    * multiset of token hashes.
    */
  def shingleHashes(s: UTF8String, w: Int, distinct: Boolean): ArrayData = {
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
          if (k > 0) acc = (acc * 31 + ' '.toInt) % P
          val t = toks(i + k)
          var j = 0
          while (j < t.length) {
            val cp = t.codePointAt(j)
            acc = (acc * 31 + cp) % P
            j += Character.charCount(cp)
          }
          k += 1
        }
        out(m) = acc
        m += 1
      }
      i += 1
    }
    new GenericArrayData(if (m == n) out else java.util.Arrays.copyOf(out, m))
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

/** `word_shingle_hashes(text, w, distinct)` — codegen array form of
  * [[TextKernels.shingleHashes]].
  */
case class WordShingleHashes(child: Expression, w: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    TextKernels.shingleHashes(input.asInstanceOf[UTF8String], w, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.shingleHashes($c, $w, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingleHashes =
    copy(child = newChild)
}

object TextHashOps {
  def polyHash(c: Column): Column =
    CatalystBridge.column(PolyHash(CatalystBridge.expression(c)))

  def shingleHashes(c: Column, w: Int, distinct: Boolean = true): Column =
    CatalystBridge.column(WordShingleHashes(CatalystBridge.expression(c), w, distinct))

  def tokenHashes(c: Column): Column = shingleHashes(c, 1, distinct = false)
}
