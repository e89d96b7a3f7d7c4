package graft.functions

import scala.util.Random

/** Paired Spark-SQL / DuckDB-SQL expression builders for the training-data
  * pipeline operators (dedup, fingerprinting, similarity).
  *
  * The driver's correctness gate hash-compares Spark output against DuckDB
  * output, so every hashed value must be bit-identical across engines. The
  * strategy here: all hashing / similarity math is EXACT 64-bit integer
  * arithmetic built from primitives verified to agree between the engines:
  *
  *   - `split(text, ' ')` (Spark, regex-of-a-space) == `string_split(text,
  *     ' ')` (DuckDB, literal) — including empty-token behavior.
  *   - `split(s, '')` == `string_split(s, '')` → per-character arrays.
  *   - `ascii(c)` (Spark) == `unicode(c)` (DuckDB) → codepoint.
  *   - Spark `aggregate(xs, 0L, f)` == DuckDB `list_reduce(list_prepend(0,
  *     xs), f)` (DuckDB's reduce has no init value; the prepended 0 plays
  *     that role).
  *   - `CAST(floor(CAST(x AS DOUBLE) * 1e6) AS BIGINT)` quantization of
  *     float embeddings: float→double widening is exact, floor is exact.
  *
  * Floating point appears only where IEEE-754 guarantees identical results
  * from identical inputs (+,-,*,/,sqrt are correctly rounded); transcendental
  * functions (exp/ln/pow) are never used in gated expressions.
  *
  * Each builder returns the Spark expression string (for
  * `org.apache.spark.sql.functions.expr`, fully codegen-compatible) and a
  * DuckDB SQL string; both are generated from the same constants so they
  * cannot drift.
  */
object Parity {

  /** Mersenne prime 2^31-1: modulus for all polynomial/affine hashing.
    * Products a*x with a,x < 2^31 stay under 2^62 — no 64-bit overflow.
    */
  val P: Long = 2147483647L

  /** Second, independent modulus (prime < 2^31) and base for the 62-bit
    * two-hash fingerprint: fp = hashA·2^31 + hashB with hashA mod P (base
    * 31) and hashB mod P2 (base 37). A collision needs BOTH residues to
    * collide — birthday bound ~2^31 documents instead of ~2^15.5, vs the
    * single 31-bit hash that silently merged distinct documents from ~50 k
    * docs (exact dedup / split assignment / curation all group on it).
    */
  val P2: Long = 2147483629L
  val Base2: Long = 37L

  /** 2^31 — hi/lo packing multiplier; fp < 2^62 stays a positive BIGINT. */
  val Pack: Long = 2147483648L

  // ------------------------------------------------------------------
  // Character-level polynomial rolling hashes folded into the 62-bit
  // fingerprint: hashA = Σ c_i·31^(n-i) mod P, hashB = Σ c_i·37^(n-i)
  // mod P2, fp = hashA·2^31 + hashB. The base primitive for token hashes
  // and document fingerprints.
  // ------------------------------------------------------------------
  private def polyAccSpark(col: String, base: Long, p: Long): String =
    s"aggregate(transform(split($col, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"0L, (acc, x) -> (acc * $base + x) % $p)"

  private def polyAccDuck(col: String, base: Long, p: Long): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split($col, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * $base + x) % $p)"

  def charPolyHashSpark(col: String): String =
    s"(${polyAccSpark(col, 31L, P)} * $Pack + ${polyAccSpark(col, Base2, P2)})"

  def charPolyHashDuck(col: String): String =
    s"(${polyAccDuck(col, 31L, P)} * $Pack + ${polyAccDuck(col, Base2, P2)})"

  /** The single 31-bit rolling hash — NOT a dedup fingerprint. Kept for
    * consumers whose contract is a bounded checksum (the multimodal stub
    * codec's byte loop), where collision resistance is irrelevant.
    */
  def charPolyHash31Duck(col: String): String = polyAccDuck(col, 31L, P)

  // ------------------------------------------------------------------
  // Tokenization + w-shingles (word n-grams joined by a space).
  // ------------------------------------------------------------------
  def tokensSpark(col: String): String = s"split($col, ' ')"
  def tokensDuck(col: String): String = s"string_split($col, ' ')"

  /** Distinct word-w-gram shingle strings. Guarded for docs shorter than w
    * (Spark's `sequence(0, negative)` would step backwards, so both sides
    * wrap in CASE).
    */
  def shinglesSpark(toks: String, w: Int): String =
    s"CASE WHEN size($toks) >= $w THEN array_distinct(transform(" +
      s"sequence(0, size($toks) - $w), i -> concat_ws(' ', slice($toks, i + 1, $w)))) " +
      s"ELSE array() END"

  def shinglesDuck(toks: String, w: Int): String =
    s"CASE WHEN len($toks) >= $w THEN list_distinct(list_transform(" +
      s"range(0, len($toks) - ${w - 1}), i -> array_to_string($toks[i + 1:i + $w], ' '))) " +
      s"ELSE [] END"

  /** Hash each element of a string array with the 31-bit char poly hash.
    * Shingle hashes deliberately STAY in [0, P): the MinHash affine
    * permutations (a·x + b) mod P are only uniform over that domain, and a
    * shingle collision merely adds one shared candidate shingle to an
    * approximate similarity estimate (the dedup FINGERPRINT, by contrast,
    * is the 62-bit charPolyHash — collisions there lose documents).
    */
  def hashedArraySpark(arr: String): String =
    s"transform($arr, s -> aggregate(transform(split(s, ''), " +
      s"c -> CAST(ascii(c) AS BIGINT)), 0L, (acc, x) -> (acc * 31 + x) % $P))"

  def hashedArrayDuck(arr: String): String =
    s"list_transform($arr, s -> list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(s, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P))"

  /** 62-bit two-hash variant of [[hashedArraySpark]] — the token-hash
    * primitive for SimHash, where every fingerprint bit must carry entropy
    * (a 31-bit token hash zeroes bits 31+ of the 60-bit SimHash, making
    * the upper Hamming bands constant keys and the band self-join O(n²)).
    */
  def hashedArray64Spark(arr: String): String =
    s"transform($arr, s -> (" +
      s"aggregate(transform(split(s, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"0L, (acc, x) -> (acc * 31 + x) % $P) * $Pack + " +
      s"aggregate(transform(split(s, ''), c -> CAST(ascii(c) AS BIGINT)), " +
      s"0L, (acc, x) -> (acc * $Base2 + x) % $P2)))"

  def hashedArray64Duck(arr: String): String =
    s"list_transform($arr, s -> (" +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(s, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * 31 + x) % $P) * $Pack + " +
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(string_split(s, ''), c -> CAST(unicode(c) AS BIGINT))), " +
      s"(acc, x) -> (acc * $Base2 + x) % $P2)))"

  // ------------------------------------------------------------------
  // MinHash: k affine permutations h_i(x) = (a_i·x + b_i) mod P over the
  // shingle-hash set; signature_i = min over shingles. Standard estimator:
  // P[sig_i(A)=sig_i(B)] = J(A,B). Constants from one seeded RNG so Spark
  // and DuckDB literals are identical by construction.
  // ------------------------------------------------------------------
  val NumHashes = 32
  val NumBands = 8
  val RowsPerBand: Int = NumHashes / NumBands // 4

  /** (a_i, b_i) for i < NumHashes; a ∈ [1, P-1], b ∈ [0, P-1]. */
  val minhashCoeffs: IndexedSeq[(Long, Long)] = {
    val rnd = new Random(42)
    IndexedSeq.fill(NumHashes)(
      (1L + rnd.nextLong(P - 1), rnd.nextLong(P)))
  }

  /** Grouped-aggregation form of the signature, for use over an exploded
    * shingle-hash column `h`: one codegen'd `min` per hash function
    * (two-phase HashAggregate — the fast path; an array-lambda form is
    * interpreted and ~30× slower). Docs with no shingles drop out of
    * the grouped form on both engines identically.
    */
  def minhashAggSpark(h: String): Seq[String] =
    minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * $h + $b) % $P) AS m$i"
    }

  def minhashAggDuck(h: String): Seq[String] =
    minhashCoeffs.zipWithIndex.map { case ((a, b), i) =>
      s"min(($a * $h + $b) % $P) AS m$i"
    }

  /** Reassemble the signature array from the m0..m31 agg columns. */
  def minhashSigFromCols: String =
    (0 until NumHashes).map(i => s"m$i").mkString("array(", ", ", ")")
  def minhashSigFromColsDuck: String =
    (0 until NumHashes).map(i => s"m$i").mkString("[", ", ", "]")

  /** LSH band key: combine the band's RowsPerBand signature entries into one
    * BIGINT with the same poly-hash fold (sig values < P < 2^31, fold keeps
    * mod P). `sig` is the signature array column, `band` ∈ [0, NumBands).
    */
  def bandKeySpark(sig: String, band: Int): String = {
    val lo = band * RowsPerBand
    val terms = (lo until lo + RowsPerBand)
      .map(i => s"element_at($sig, ${i + 1})")
    terms.foldLeft("CAST(0 AS BIGINT)")((acc, t) => s"(($acc * 31 + $t) % $P)")
  }

  def bandKeyDuck(sig: String, band: Int): String = {
    val lo = band * RowsPerBand
    val terms = (lo until lo + RowsPerBand).map(i => s"$sig[${i + 1}]")
    terms.foldLeft("CAST(0 AS BIGINT)")((acc, t) => s"(($acc * 31 + $t) % $P)")
  }

  /** Same band-key fold over the flat m0..m31 agg columns (identical
    * values to bandKeySpark over the assembled array — m_i == sig[i+1]).
    */
  def bandKeyFromCols(band: Int): String = {
    val lo = band * RowsPerBand
    val terms = (lo until lo + RowsPerBand).map(i => s"m$i")
    terms.foldLeft("CAST(0 AS BIGINT)")((acc, t) => s"(($acc * 31 + $t) % $P)")
  }

  // ------------------------------------------------------------------
  // SimHash (60-bit) over token hashes: bit b of the fingerprint is 1 iff
  // the majority of token occurrences have bit b set (2·Σbit_b > n).
  // Token hashes are the 62-bit two-hash pack (hashA·2^31 + hashB), so
  // every fingerprint bit 0..59 carries entropy: bits 0..30 come from
  // hashB, bits 31..59 from hashA. (With the old 31-bit token hash, bits
  // 31..59 were constant 0 — band 3 was a single bucket and the band
  // self-join degenerated to an O(n²) cross product.)
  // 60 bits keeps the value positive in a signed 64-bit BIGINT on both
  // engines; Hamming banding uses 4 bands × 15 bits (pigeonhole: any pair
  // within distance 3 collides on ≥ 1 band).
  //
  // Computed via explode/unnest + grouped SUMs — a codegen'd two-phase
  // HashAggregate — NOT via per-bit higher-order lambdas (interpreted,
  // ~100× slower; measured 174 s → 4 s on sf0.1).
  // ------------------------------------------------------------------
  val SimHashBits = 60
  val SimHashBands = 4
  val BandBits: Int = SimHashBits / SimHashBands // 15

  /** Grouped-aggregation columns over an exploded token-hash column `h`:
    * per-bit set counts s0..s59 plus the total n.
    */
  def simhashAggSpark(h: String): Seq[String] =
    (0 until SimHashBits).map(b => s"sum(($h div ${1L << b}) % 2) AS s$b") :+
      s"count(1) AS n"

  def simhashAggDuck(h: String): Seq[String] =
    (0 until SimHashBits).map(b => s"CAST(sum(($h // ${1L << b}) % 2) AS BIGINT) AS s$b") :+
      s"count(*) AS n"

  /** Fold the per-bit majority votes into the fingerprint (same text in
    * both dialects).
    */
  def simhashFromCounts: String =
    (0 until SimHashBits)
      .map(b => s"CASE WHEN 2 * s$b > n THEN CAST(${1L << b} AS BIGINT) ELSE CAST(0 AS BIGINT) END")
      .mkString("(", " + ", ")")

  /** Band `i` (0..3) of a simhash — 15-bit slice, the Hamming LSH key. */
  def simhashBandSpark(sh: String, i: Int): String =
    s"(($sh div ${1L << (BandBits * i)}) % ${1L << BandBits})"
  def simhashBandDuck(sh: String, i: Int): String =
    s"(($sh // ${1L << (BandBits * i)}) % ${1L << BandBits})"

  /** Popcount of xor — Hamming distance; O(1) bit_count on both engines. */
  def hammingSpark(a: String, b: String): String =
    s"CAST(bit_count($a ^ $b) AS BIGINT)"

  def hammingDuck(a: String, b: String): String =
    s"CAST(bit_count(xor($a, $b)) AS BIGINT)"

  // ------------------------------------------------------------------
  // Embedding quantization + exact-integer dot product. Quantizing each
  // float to floor(x·10^6) makes every downstream comparison exact; with
  // |x| ≤ ~1 and dim 64, |dot| ≤ 64·10^12 — far inside Long range.
  // ------------------------------------------------------------------
  val QScale = 1000000L

  def quantizeSpark(vec: String): String =
    s"transform($vec, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))"

  def quantizeDuck(vec: String): String =
    s"list_transform($vec, x -> CAST(floor(CAST(x AS DOUBLE) * $QScale) AS BIGINT))"

  def dotDuck(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, len($a) + 1), i -> $a[i] * $b[i])) AS BIGINT)"

  /** Cosine from exact integer dot/norms: identical doubles on both engines
    * because /, *, sqrt are IEEE correctly-rounded and the inputs are the
    * same integers.
    */
  def cosineSpark(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  def cosineDuck(dot: String, na: String, nb: String): String =
    s"CAST($dot AS DOUBLE) / (sqrt(CAST($na AS DOUBLE)) * sqrt(CAST($nb AS DOUBLE)))"

  // ------------------------------------------------------------------
  // Random-hyperplane LSH for embeddings: deterministic ±1 planes (seeded
  // RNG → literal arrays in both dialects); bucket = sign-bit pattern of
  // the plane dots. Plane dot over the quantized vector is exact integer.
  //
  // The plane COUNT is a corpus-density POLICY, not a manual dial
  // (round 8; replaces the r7 SPARK_GRAFT_LSH_PLANES env var): the
  // 2^planes bucket grid must grow ∝ log₂(corpus) so in-bucket density —
  // and with it the LSH candidate-pair stage — stays flat as the corpus
  // scales. planesForCount picks the smallest p in [NumPlanes, MaxPlanes]
  // with n ≤ TargetOccupancy·2^p, from ONE corpus count() scalar — the
  // same adaptivity-from-statistics move the reference makes for its
  // partial-key fan-out d = ⌊p1·m⌋+1
  // (stateless/src/main/scala/cluster/PartialKeyDynamicJoin.scala:57).
  // Exact integer thresholds, replicated literally in the DuckDB oracle's
  // CASE, so both dialects resolve identically at any scale. At the
  // sf0.01/sf0.1 gate fixtures (500 / 2 000 vectors) the policy resolves
  // to the default 8-plane grid; at sf1 (20 000) it resolves to 11 — the
  // r7-measured optimum that previously required the env var.
  //
  // The seeded fill is sequential by plane, so the first 8 rows of the
  // MaxPlanes grid are bit-identical to the historical 8-plane grid: a
  // policy upgrade widens the bucket id, it never re-shuffles the
  // existing bits.
  // ------------------------------------------------------------------
  val NumPlanes: Int = 8
  val MaxPlanes: Int = 24
  val TargetOccupancy: Long = 16L
  val EmbeddingDim = 64

  def planesForCount(n: Long): Int = {
    var p = NumPlanes
    while (p < MaxPlanes && n > (TargetOccupancy << p)) p += 1
    p
  }

  /** DuckDB replica of [[planesForCount]] over a count column `n`:
    * a CASE on the same literal thresholds. */
  def planesForCountDuck(n: String): String = {
    val arms = (NumPlanes until MaxPlanes)
      .map(p => s"WHEN $n <= ${TargetOccupancy << p} THEN $p")
      .mkString(" ")
    s"(CASE $arms ELSE $MaxPlanes END)"
  }

  val planes: IndexedSeq[IndexedSeq[Int]] = {
    val rnd = new Random(1234)
    IndexedSeq.fill(MaxPlanes)(IndexedSeq.fill(EmbeddingDim)(if (rnd.nextBoolean()) 1 else -1))
  }

  def planeDotSpark(qvec: String, j: Int): String = {
    val lit = planes(j).map(v => s"${v}L").mkString("array(", ", ", ")")
    s"aggregate(zip_with($qvec, $lit, (x, s) -> x * s), 0L, (acc, v) -> acc + v)"
  }

  def planeDotDuck(qvec: String, j: Int): String = {
    val lit = planes(j).map(v => s"CAST($v AS BIGINT)").mkString("[", ", ", "]")
    s"CAST(list_sum(list_transform(range(1, len($qvec) + 1), i -> $qvec[i] * ($lit)[i])) AS BIGINT)"
  }

  def lshBucketSpark(qvec: String, nPlanes: Int = NumPlanes): String =
    (0 until nPlanes).map { j =>
      s"CASE WHEN ${planeDotSpark(qvec, j)} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  def lshBucketDuck(qvec: String, nPlanes: Int = NumPlanes): String =
    (0 until nPlanes).map { j =>
      s"CASE WHEN ${planeDotDuck(qvec, j)} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("(", " + ", ")")

  /** DuckDB bucket whose plane count is decided AT QUERY TIME by a
    * column/scalar `np` (from [[planesForCountDuck]]): every MaxPlanes
    * bit is computed but gated on `j < np`, so the oracle follows the
    * policy for whatever corpus it runs against without re-generating
    * SQL. Oracle-side only — the Spark side resolves the count first and
    * builds just the planes it needs.
    */
  def lshBucketDuckDynamic(qvec: String, np: String): String =
    (0 until MaxPlanes).map { j =>
      s"CASE WHEN $j < $np AND ${planeDotDuck(qvec, j)} > 0 THEN ${1 << j} ELSE 0 END"
    }.mkString("(", " + ", ")")
}
