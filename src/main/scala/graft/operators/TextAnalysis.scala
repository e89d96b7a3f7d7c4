package graft.operators

import graft.Tables
import graft.functions.Parity._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, over
  * the shared `documents` table (doc_id, text, lang, source, n_chars).
  *
  * These extend the reference engine's surface (SURVEY.md Phase 4): the
  * reference processes short keyed records; a 100 TB corpus pipeline needs
  * per-document NLP-ish scoring. Everything here is a pure projection —
  * narrow, no shuffle, whole-stage-codegen'd higher-order functions over
  * the parquet scan — so it scales linearly with executors and is bound by
  * scan throughput, the right shape for 100 TB.
  *
  * Oracle parity: all numeric outputs are exact integers, or doubles built
  * only from +,-,*,/ on exact integers (bit-identical across engines).
  */
object TextAnalysis {

  private val docsSql = "SELECT doc_id, text FROM documents"

  // Stopword / language marker profiles (deterministic, embedded in both
  // dialects from these single definitions).
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is", "on")
  val EnMarkers: Seq[String] = Seq("the", "a", "of", "and", "to", "is")
  val EsMarkers: Seq[String] = Seq("el", "la", "de", "y", "que", "los")
  val FrMarkers: Seq[String] = Seq("le", "la", "de", "et", "les", "une")

  private def inList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("(", ", ", ")")

  private def countInSpark(toks: String, xs: Seq[String]): String =
    s"size(filter($toks, t -> t IN ${inList(xs)}))"
  /** Stopword-hit count over a token-array column — shared with the
    * streaming quality-histogram twin so both faces score identically. */
  private[graft] def stopCountSpark(toks: String): String =
    countInSpark(toks, Stopwords)
  private def countInDuck(toks: String, xs: Seq[String]): String =
    s"len(list_filter($toks, t -> t IN ${inList(xs)}))"

  // ------------------------------------------------------------------
  // Token statistics: whitespace tokens, BPE-ish regex tokens (alphabetic
  // runs), distinct tokens, average token length.
  // ------------------------------------------------------------------
  def tokenStats(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      expr(s"size(${tokensSpark("text")})").as("n_tokens"),
      expr("regexp_count(text, '[a-z]+')").as("n_words"),
      expr(s"size(array_distinct(${tokensSpark("text")}))").as("n_distinct"),
      expr(s"CAST(length(replace(text, ' ', '')) AS DOUBLE) / size(${tokensSpark("text")})")
        .as("avg_token_len"))

  val tokenStatsSql: String =
    s"""SELECT doc_id,
       |  len(${tokensDuck("text")}) AS n_tokens,
       |  len(regexp_extract_all(text, '[a-z]+')) AS n_words,
       |  len(list_distinct(${tokensDuck("text")})) AS n_distinct,
       |  CAST(length(replace(text, ' ', '')) AS DOUBLE) / len(${tokensDuck("text")}) AS avg_token_len
       |FROM ($docsSql)""".stripMargin

  // ------------------------------------------------------------------
  // Quality scoring: stopword ratio, lexical diversity, length band —
  // combined into one deterministic [0,1] score using only rational
  // arithmetic (no transcendental functions → bit-exact oracle).
  //   score = 0.4·diversity + 0.3·(1 − |stop_ratio − 0.2|) + 0.3·len_score
  //   len_score = least(n_tokens, 100) / 100
  // ------------------------------------------------------------------
  def qualityScore(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokensSpark("text")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"),
        expr(s"size($toks)").as("n_tokens"),
        expr(s"${countInSpark(toks, Stopwords)}").as("stop_cnt"),
        expr(s"size(array_distinct($toks))").as("n_distinct"))
      .select(
        col("doc_id"), col("n_tokens"), col("stop_cnt"),
        expr("CAST(stop_cnt AS DOUBLE) / n_tokens").as("stop_ratio"),
        expr("CAST(n_distinct AS DOUBLE) / n_tokens").as("diversity"),
        expr("0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)" +
          " + 0.3 * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_tokens - 0.2))" +
          " + 0.3 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0)").as("quality_score"))
  }

  val qualityScoreSql: String = {
    val toks = tokensDuck("text")
    s"""SELECT doc_id, n_tokens, stop_cnt,
       |  CAST(stop_cnt AS DOUBLE) / n_tokens AS stop_ratio,
       |  CAST(n_distinct AS DOUBLE) / n_tokens AS diversity,
       |  0.4 * (CAST(n_distinct AS DOUBLE) / n_tokens)
       |    + 0.3 * (1.0 - abs(CAST(stop_cnt AS DOUBLE) / n_tokens - 0.2))
       |    + 0.3 * (CAST(least(n_tokens, 100) AS DOUBLE) / 100.0) AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    len($toks) AS n_tokens,
       |    ${countInDuck(toks, Stopwords)} AS stop_cnt,
       |    len(list_distinct($toks)) AS n_distinct
       |  FROM ($docsSql))""".stripMargin
  }

  // ------------------------------------------------------------------
  // Language identification: marker-token voting with deterministic
  // argmax (en > es > fr priority on ties, 'und' when no marker hits).
  // An n-gram-profile heuristic in the classic Cavnar-Trenkle spirit,
  // reduced to unigram marker profiles.
  // ------------------------------------------------------------------
  def langId(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokensSpark("text")
    Tables.documents(spark, sfDir)
      .select(
        col("doc_id"), col("lang"),
        expr(countInSpark(toks, EnMarkers)).as("en_cnt"),
        expr(countInSpark(toks, EsMarkers)).as("es_cnt"),
        expr(countInSpark(toks, FrMarkers)).as("fr_cnt"))
      .select(
        col("doc_id"), col("lang"), col("en_cnt"), col("es_cnt"), col("fr_cnt"),
        expr("CASE WHEN en_cnt >= es_cnt AND en_cnt >= fr_cnt AND en_cnt > 0 THEN 'en' " +
          "WHEN es_cnt >= fr_cnt AND es_cnt > 0 THEN 'es' " +
          "WHEN fr_cnt > 0 THEN 'fr' ELSE 'und' END").as("lang_pred"))
  }

  val langIdSql: String = {
    val toks = tokensDuck("text")
    s"""SELECT doc_id, lang, en_cnt, es_cnt, fr_cnt,
       |  CASE WHEN en_cnt >= es_cnt AND en_cnt >= fr_cnt AND en_cnt > 0 THEN 'en'
       |       WHEN es_cnt >= fr_cnt AND es_cnt > 0 THEN 'es'
       |       WHEN fr_cnt > 0 THEN 'fr' ELSE 'und' END AS lang_pred
       |FROM (
       |  SELECT doc_id, lang,
       |    ${countInDuck(toks, EnMarkers)} AS en_cnt,
       |    ${countInDuck(toks, EsMarkers)} AS es_cnt,
       |    ${countInDuck(toks, FrMarkers)} AS fr_cnt
       |  FROM (SELECT doc_id, text, lang FROM documents))""".stripMargin
  }

  // ------------------------------------------------------------------
  // Document fingerprinting: whole-text polynomial rolling hash, plus the
  // minimum token-4-gram shingle hash (a winnowing-style selective
  // fingerprint — the min-hash of the rolling window hashes).
  // ------------------------------------------------------------------
  def fingerprint(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextHashOps
    val sh = TextHashOps.shingleHashes(col("text"), 4)
    Tables.documents(spark, sfDir).select(
      col("doc_id"),
      TextHashOps.polyHash(col("text")).as("fp"),
      when(size(sh) === 0, lit(P)).otherwise(array_min(sh)).as("fp_min_shingle"))
  }

  val fingerprintSql: String = {
    val sh = shinglesDuck(tokensDuck("text"), 4)
    s"""SELECT doc_id,
       |  ${charPolyHashDuck("text")} AS fp,
       |  CASE WHEN len($sh) = 0 THEN CAST($P AS BIGINT)
       |       ELSE list_min(${hashedArrayDuck(sh)}) END AS fp_min_shingle
       |FROM ($docsSql)""".stripMargin
  }

  // ------------------------------------------------------------------
  // Intra-document repetition collapse: drop each token that equals its
  // immediate predecessor ("batch batch batch" → "batch") — the
  // consecutive-run case of the C4/Gopher repetition filters, the
  // cleanup a crawl corpus needs BEFORE token counting so pathological
  // repetition doesn't inflate training mixes. Pure per-row projection
  // (array filter keyed on the predecessor element), fused into the
  // scan: no shuffle, linear in corpus size — the same 100 TB shape as
  // the rest of this module. The CASE guard keeps the predecessor
  // lookup total (element_at(_, 0) would raise under ANSI).
  // ------------------------------------------------------------------
  def collapseRepeats(spark: SparkSession, sfDir: String): DataFrame =
    // Tokenize ONCE into an aliased column — referencing tokensSpark
    // inline from both `size` and the lambda (and again for the
    // predecessor lookup inside it) would re-split the text per
    // reference; the alias keeps the split single-evaluated through
    // CollapseProject, same pattern as the minhash signature build.
    Tables.documents(spark, sfDir)
      .select(col("doc_id"), expr(tokensSpark("text")).as("toks"))
      .select(col("doc_id"),
        expr("size(toks)").as("n_tokens"),
        expr("filter(toks, (t, i) -> CASE WHEN i = 0 THEN true" +
          " ELSE t != element_at(toks, i) END)").as("kept"))
      .select(col("doc_id"), col("n_tokens"),
        expr("size(kept)").as("n_kept"),
        expr("n_tokens - size(kept)").as("n_collapsed"),
        expr("array_join(kept, ' ')").as("clean_text"))

  val collapseRepeatsSql: String = {
    val toks = tokensDuck("text")
    // DuckDB's lambda index is 1-based where Spark's is 0-based; both
    // forms read "keep the first token and every token differing from
    // its predecessor".
    s"""SELECT doc_id, n_tokens, len(kept) AS n_kept,
       |  n_tokens - len(kept) AS n_collapsed,
       |  array_to_string(kept, ' ') AS clean_text
       |FROM (
       |  SELECT doc_id, len(toks) AS n_tokens,
       |    list_filter(toks, (t, i) -> i = 1 OR t != toks[i-1]) AS kept
       |  FROM (SELECT doc_id, $toks AS toks FROM ($docsSql)))""".stripMargin
  }

  // ------------------------------------------------------------------
  // Feature hashing ("hashing trick"): every document becomes a sparse
  // FeatureDims-dimensional integer vector — dim = token_hash mod dims,
  // weight = term frequency — the bridge from the text stack to the
  // vector/ANN stack when no trained embeddings exist. Emitted SPARSE as
  // (doc_id, dim, w) rows: the dense form is a trivial pivot, and sparse
  // is what the similarity join below consumes. One explode + one grouped
  // count; the hash is the same 31-bit poly fold both engines already
  // share for shingles, so the two dialects build identical vectors.
  // ------------------------------------------------------------------
  val FeatureDims = 64L

  def featureHash(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"text.featureHash:$sfDir") {
      // ≤ 64 rows per doc out of the aggregate — tiny relative to the
      // corpus; two gated consumers (the vector gate + the cosine top-k).
      // Per-token hashes via the codegen WordShingleHashes kernel at
      // w = 1 (same 31-bit fold as the interpreted hashedArraySpark HOF,
      // pinned by KernelParitySpec) — the fingerprint pass stays inside
      // whole-stage codegen instead of an interpreted lambda chain.
      Tables.documents(spark, sfDir)
        .select(col("doc_id"),
          explode(graft.functions.TextHashOps.shingleHashes(
            col("text"), 1, distinct = false)).as("h"))
        .groupBy(col("doc_id"), pmod(col("h"), lit(FeatureDims)).as("dim"))
        .agg(count(lit(1)).as("w"))
    }

  val featureHashSql: String =
    s"""SELECT doc_id, h % $FeatureDims AS dim, count(*) AS w
       |FROM (SELECT doc_id, unnest(${hashedArrayDuck(tokensDuck("text"))}) AS h
       |      FROM ($docsSql))
       |GROUP BY doc_id, dim""".stripMargin

  // ------------------------------------------------------------------
  // Text-only cosine top-k over the feature-hash vectors — similarity
  // search with NO given embeddings, end-to-end from raw text. The dot
  // products ride an inverted-index equi-join on the dimension key
  // (sparse · sparse = sum of per-dim weight products), so the "brute
  // force" is one 64-key shuffle join + a grouped sum, never an
  // array-carrying cross product; norms join back onto the tiny scored
  // relation, and WindowGroupLimit keeps per-query k-row heaps. Pairs
  // sharing NO dimension have dot 0 and are not ranked (standard
  // inverted-index semantics, identical in both engines). All integer
  // arithmetic until one final cosine division per candidate. At scale
  // this is the exactness baseline for text vectors; the LSH/IVF paths
  // over trained embeddings remain the sublinear route.
  // ------------------------------------------------------------------
  def textCosineTopK(spark: SparkSession, sfDir: String): DataFrame =
    // Cached (k·|Q| rows): consumed by its own gate AND the RRF fusion
    // (Retrieval.hybridRrfTopK) — small expensive aggregate, two
    // consumers, per the persist policy.
    graft.CacheRegistry.cached(spark, s"text.cosineTopK:$sfDir") {
      textCosineTopKPlan(spark, sfDir)
    }

  private def textCosineTopKPlan(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fv = featureHash(spark, sfDir)
    val norms = fv.groupBy("doc_id")
      .agg(sum(col("w") * col("w")).as("nrm"))
    val dots = fv.where(col("doc_id") < Similarity.NumQueries).as("q")
      .join(fv.as("c"),
        col("q.dim") === col("c.dim") && col("q.doc_id") =!= col("c.doc_id"))
      .groupBy(col("q.doc_id").as("query_id"), col("c.doc_id").as("neighbor_id"))
      .agg(sum(col("q.w") * col("c.w")).as("dot"))
    dots
      .join(norms.select(col("doc_id").as("query_id"), col("nrm").as("qn")), "query_id")
      .join(norms.select(col("doc_id").as("neighbor_id"), col("nrm").as("cn")), "neighbor_id")
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= Similarity.TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val textCosineTopKSql: String =
    s"""WITH fv AS ($featureHashSql),
       |norms AS (
       |  SELECT doc_id, CAST(sum(w * w) AS BIGINT) AS nrm FROM fv GROUP BY doc_id),
       |dots AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
       |    CAST(sum(q.w * c.w) AS BIGINT) AS dot
       |  FROM fv q JOIN fv c ON q.dim = c.dim AND q.doc_id <> c.doc_id
       |  WHERE q.doc_id < ${Similarity.NumQueries}
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.query_id, d.neighbor_id, d.dot,
       |    ${cosineDuck("d.dot", "nq.nrm", "nc.nrm")} AS cos
       |  FROM dots d
       |  JOIN norms nq ON nq.doc_id = d.query_id
       |  JOIN norms nc ON nc.doc_id = d.neighbor_id)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= ${Similarity.TopK}""".stripMargin

  // ------------------------------------------------------------------
  // Dense form of the feature-hash vectors + the SUBLINEAR text ANN
  // path: FeatureDims deliberately equals the embedding dimension (64),
  // so the dense text vectors ride the EXACT SAME sign-LSH machinery as
  // the trained embeddings — Similarity.lshBucketCol on the Spark side,
  // Parity.lshBucketDuck on the oracle side, no new index code at all.
  // Candidates are restricted to the query's bucket (1/256 of the corpus
  // in expectation) and verified with the exact integer cosine — the
  // sublinear route whose exactness baseline is s_text_cosine_topk.
  // Dense assembly is one grouped map + a 64-slot fill per doc (exact
  // integers; collect_list order cannot matter because map keys are
  // unique dims).
  // ------------------------------------------------------------------
  def featureVectors(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"text.featureVectors:$sfDir") {
      require(FeatureDims == EmbeddingDim.toLong,
        "text vectors must match the LSH plane dimension")
      featureHash(spark, sfDir)
        .groupBy("doc_id")
        .agg(map_from_entries(collect_list(struct(col("dim"), col("w")))).as("m"))
        .select(col("doc_id"),
          transform(sequence(lit(0L), lit(FeatureDims - 1)),
            d => coalesce(element_at(col("m"), d), lit(0L))).as("v"))
        .withColumn("norm", graft.functions.VectorOps.longDot(col("v"), col("v")))
    }

  private val featureVectorsSql: String =
    s"""SELECT doc_id, v, ${dotDuck("v", "v")} AS norm FROM (
       |  SELECT doc_id, list(CAST(coalesce(w, 0) AS BIGINT) ORDER BY dim) AS v
       |  FROM (SELECT d.doc_id, r.range AS dim
       |        FROM (SELECT DISTINCT doc_id FROM ($featureHashSql) ) d
       |        CROSS JOIN range($FeatureDims) r)
       |  LEFT JOIN ($featureHashSql) fv USING (doc_id, dim)
       |  GROUP BY doc_id)""".stripMargin

  def textLshTopK(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val corpus = featureVectors(spark, sfDir)
      .withColumn("bucket", Similarity.lshBucketCol(col("v")))
    // MULTIPROBE from the start: tf vectors are nonnegative and share
    // common-token dimensions, so they cluster tighter in plane space
    // than centered embeddings — single-bucket probing measured only
    // 0.32 recall vs the exact baseline at sf0.01; probing the 8
    // single-bit-flip neighbors (9/256 of the corpus) lifts it to 0.69
    // at unchanged plan shape (BASELINE.md round-7 note).
    val probeOffsets = lit(0) +: (0 until NumPlanes).map(j => lit(1 << j))
    val queries = corpus.where(col("doc_id") < Similarity.NumQueries)
      .withColumn("probe", explode(array(probeOffsets: _*)))
      .withColumn("pbucket", expr("int(bucket ^ probe)"))
    val scored = broadcast(queries.as("q")).join(corpus.as("c"),
        col("q.pbucket") === col("c.bucket") && col("q.doc_id") =!= col("c.doc_id"))
      .select(col("q.doc_id").as("query_id"), col("c.doc_id").as("neighbor_id"),
        graft.functions.VectorOps.longDot(col("q.v"), col("c.v")).as("dot"),
        col("q.norm").as("qn"), col("c.norm").as("cn"))
      .withColumn("cos", expr(cosineSpark("dot", "qn", "cn")))
    scored
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id"))))
      .where(col("rnk") <= Similarity.TopK)
      .select("query_id", "neighbor_id", "rnk", "dot")
  }

  val textLshTopKSql: String = {
    val offsets = (Seq(0) ++ (0 until NumPlanes).map(j => 1 << j)).mkString("[", ", ", "]")
    s"""WITH dense AS ($featureVectorsSql),
       |corpus AS (
       |  SELECT doc_id, v, norm, ${lshBucketDuck("v")} AS bucket FROM dense),
       |probes AS (
       |  SELECT doc_id, v, norm,
       |    CAST(xor(CAST(bucket AS BIGINT), CAST(probe AS BIGINT)) AS INTEGER) AS pbucket
       |  FROM (SELECT *, unnest($offsets) AS probe FROM corpus
       |        WHERE doc_id < ${Similarity.NumQueries})),
       |scored AS (
       |  SELECT q.doc_id AS query_id, c.doc_id AS neighbor_id,
       |    ${dotDuck("q.v", "c.v")} AS dot,
       |    ${cosineDuck(dotDuck("q.v", "c.v"), "q.norm", "c.norm")} AS cos
       |  FROM probes q JOIN corpus c ON q.pbucket = c.bucket AND q.doc_id <> c.doc_id)
       |SELECT query_id, neighbor_id, rnk, dot FROM (
       |  SELECT query_id, neighbor_id, dot,
       |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rnk
       |  FROM scored)
       |WHERE rnk <= ${Similarity.TopK}""".stripMargin
  }

  // ------------------------------------------------------------------
  // PII redaction — the scrubbing pass every released training corpus
  // runs (emails/phones → typed placeholder tokens). The fixture corpus
  // is synthetic word-soup with no real PII, so the query PLANTS
  // deterministic PII first (an email on every 3rd doc, a phone on every
  // 2nd — both derived from doc_id, identically in both dialects) and
  // then redacts it: the gate exercises the actual regex machinery
  // (Spark's Java regex vs DuckDB's RE2 — the patterns below stay inside
  // the common subset: character classes, +, bounded repetition, no
  // backreferences/lookaround) end-to-end, including the zero-redaction
  // path on the unplanted rows. Counts are taken on the pre-scrub text.
  //
  // Scale shape: a pure per-row projection fused into the parquet scan —
  // no shuffle, no state; at 100 TB this runs at scan throughput and
  // parallelizes with executors, which is exactly why production PII
  // scrubbing is regex-first with a model-based pass only on the resid.
  // ------------------------------------------------------------------
  val EmailPat = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z]{2,}"
  val PhonePat = "[0-9]{3}-[0-9]{3,8}"

  private val plantSparkExpr =
    "concat(text," +
      " CASE WHEN doc_id % 3 = 0 THEN concat(' user', CAST(doc_id AS STRING), '@example.org')" +
      " ELSE '' END," +
      " CASE WHEN doc_id % 2 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS STRING), 4, '0'))" +
      " ELSE '' END)"

  private val plantDuckExpr =
    "concat(text," +
      " CASE WHEN doc_id % 3 = 0 THEN concat(' user', CAST(doc_id AS VARCHAR), '@example.org')" +
      " ELSE '' END," +
      " CASE WHEN doc_id % 2 = 0 THEN concat(' call 555-', lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'))" +
      " ELSE '' END)"

  def piiScrub(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documentsWide(spark, sfDir)
      .select(col("doc_id"), expr(plantSparkExpr).as("aug"))
      .select(col("doc_id"),
        expr(s"CAST(regexp_count(aug, '$EmailPat') AS BIGINT)").as("n_emails"),
        expr(s"CAST(regexp_count(aug, '$PhonePat') AS BIGINT)").as("n_phones"),
        expr(s"regexp_replace(regexp_replace(aug, '$EmailPat', '<EMAIL>'), " +
          s"'$PhonePat', '<PHONE>')").as("scrubbed"))

  val piiScrubSql: String =
    s"""SELECT doc_id,
       |  len(regexp_extract_all(aug, '$EmailPat')) AS n_emails,
       |  len(regexp_extract_all(aug, '$PhonePat')) AS n_phones,
       |  regexp_replace(regexp_replace(aug, '$EmailPat', '<EMAIL>', 'g'),
       |    '$PhonePat', '<PHONE>', 'g') AS scrubbed
       |FROM (SELECT doc_id, $plantDuckExpr AS aug
       |      FROM (SELECT doc_id, text FROM documents))""".stripMargin

  // ------------------------------------------------------------------
  // Intra-document repetition signals (Gopher-style quality filters):
  //   dup_token_frac_e6   — fraction of tokens that repeat an earlier
  //                         token, ppm ((n_tokens − n_distinct)·10⁶ div
  //                         n_tokens);
  //   top_bigram(_cnt/_frac_e6) — the document's most frequent adjacent
  //                         word pair and the standard cnt·2/n coverage
  //                         proxy (counts every occurrence; overlapping
  //                         occurrences are NOT merged, matching the
  //                         published repetition-filter definition, so
  //                         the ppm value can exceed 10⁶ on degenerate
  //                         "a a a …" docs — by design).
  // All fractions are integer ppm — bit-exact across engines. Argmax is
  // deterministic: max count, ties broken toward the lexicographically
  // LARGEST gram (Spark max-of-struct ≡ DuckDB ORDER BY cnt DESC, gram
  // DESC; both compare ASCII binary).
  //
  // Plan (r13 rewrite): MAP-ONLY. A document's bigrams live in its own
  // token array, so the per-doc argmax never needs a shuffle — sort the
  // gram array and run-length-fold it: on each element the run counter
  // extends or resets, and the best (cnt, gram) updates on >= so equal
  // counts resolve to the lexicographically LARGEST gram (ascending
  // sort ⇒ later = larger), exactly the old max-of-struct tiebreak. The
  // previous plan exploded every gram occurrence into two grouped
  // aggregates plus a join back — three exchanges of gram strings; this
  // form is one projection inside whole-stage codegen, O(n log n) per
  // doc, and at 100 TB it scales with the scan alone.
  //
  // Element-width note (r17 measured, r18 shipped): on a long-token
  // corpus the in-doc sort/fold over gram STRINGS is the cost — the
  // hashed fold (array_sort over the one-pass word_shingle_hashes
  // longs) runs the same documents 6.9× faster (19.6 s → 2.9 s,
  // RegimeBench on the 50 k-doc longtok tree), and unlike the
  // top-ngrams hash swap it needs NO second corpus scan to recover the
  // display gram. That form now ships as the gated twin
  // [[repetitionStatsHashed]] (`t_repetition_stats_hashed`) — same
  // output shape, tiebreak on the fingerprint instead of the gram
  // string. THIS string form stays the exactness face: its tiebreak is
  // lexicographic on the display gram and it is collision-free by
  // construction, which is the contract short-token corpora get for
  // free; the hashed twin is the long-token scale face.
  // ------------------------------------------------------------------
  def repetitionStats(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = tokensSpark("text")
    val gramsSorted =
      s"array_sort(CASE WHEN size($toks) >= 2 THEN transform(sequence(0, size($toks) - 2)," +
        s" i -> concat_ws(' ', slice($toks, i + 1, 2))) ELSE array() END)"
    val topFold =
      s"""aggregate($gramsSorted,
         |  struct('' AS prev, 0L AS run, 0L AS best_cnt, '' AS best_gram),
         |  (acc, g) -> CASE WHEN g = acc.prev AND acc.run + 1L >= acc.best_cnt
         |      THEN struct(g AS prev, acc.run + 1L AS run, acc.run + 1L AS best_cnt, g AS best_gram)
         |    WHEN g = acc.prev
         |      THEN struct(g AS prev, acc.run + 1L AS run, acc.best_cnt AS best_cnt, acc.best_gram AS best_gram)
         |    WHEN 1L >= acc.best_cnt
         |      THEN struct(g AS prev, 1L AS run, 1L AS best_cnt, g AS best_gram)
         |    ELSE struct(g AS prev, 1L AS run, acc.best_cnt AS best_cnt, acc.best_gram AS best_gram) END,
         |  acc -> struct(acc.best_gram AS gram, acc.best_cnt AS cnt))""".stripMargin
    Tables.documentsWide(spark, sfDir)
      .select(col("doc_id"),
        expr(s"size($toks)").cast("long").as("n_tokens"),
        expr(s"size(array_distinct($toks))").cast("long").as("n_distinct"),
        expr(topFold).as("top"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(n_tokens - n_distinct) * 1000000L div n_tokens").as("dup_token_frac_e6"),
        col("top.gram").as("top_bigram"),
        col("top.cnt").as("top_bigram_cnt"),
        expr("top.cnt * 2000000L div n_tokens").as("top_bigram_frac_e6"))
  }

  val repetitionStatsSql: String = {
    val toks = tokensDuck("text")
    s"""WITH base AS (SELECT doc_id, $toks AS toks FROM ($docsSql)),
       |stats AS (
       |  SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct
       |  FROM base),
       |grams AS (
       |  SELECT doc_id, unnest(CASE WHEN len(toks) >= 2
       |    THEN list_transform(range(0, len(toks) - 1),
       |      i -> array_to_string(toks[i + 1:i + 2], ' '))
       |    ELSE [] END) AS gram
       |  FROM base),
       |cnts AS (SELECT doc_id, gram, count(*) AS cnt FROM grams GROUP BY doc_id, gram),
       |top AS (
       |  SELECT doc_id, gram, cnt FROM (
       |    SELECT doc_id, gram, cnt,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, gram DESC) AS rnk
       |    FROM cnts)
       |  WHERE rnk = 1)
       |SELECT s.doc_id, s.n_tokens,
       |  (s.n_tokens - s.n_distinct) * 1000000 // s.n_tokens AS dup_token_frac_e6,
       |  coalesce(t.gram, '') AS top_bigram,
       |  CAST(coalesce(t.cnt, 0) AS BIGINT) AS top_bigram_cnt,
       |  CAST(coalesce(t.cnt, 0) AS BIGINT) * 2000000 // s.n_tokens AS top_bigram_frac_e6
       |FROM stats s LEFT JOIN top t ON s.doc_id = t.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // The repetition fold at 8-byte element width — the ONE hash-swap
  // lever RegimeBench measured as a WIN (r17: 19.62 s → 2.86 s, 6.9×,
  // on the 50 k-doc longtok tree), because unlike topNgramsHashed it
  // needs no second corpus scan to recover display strings: the per-doc
  // argmax is found over the 62-bit bigram-hash array (one-pass codegen
  // kernel, array_sort over longs, run-length fold — long compares
  // where the string form moves ~120-byte grams), and the winning
  // DISPLAY gram is recovered IN THE SAME ROW by locating the winning
  // fingerprint's first position in the unsorted hash array and slicing
  // two tokens — O(n) per doc, zero joins, zero extra scans. Still
  // map-only, still fused into the parquet scan.
  //
  // Contract deltas vs the string form, both deliberate and both
  // replicated exactly in the oracle so the gate stays hash-exact:
  //   - tiebreak: equal max counts resolve to the LARGEST FINGERPRINT
  //     (ascending hash sort + >= update), not the lexicographically
  //     largest gram — hash order ≠ gram order, and re-deriving gram
  //     order would re-introduce the string fold this lever removes;
  //   - n_distinct: distinct TOKEN HASHES (62-bit), not token strings;
  //   - collisions: two distinct grams sharing a 62-bit fingerprint
  //     within ONE document would merge their runs (and the recovery
  //     would display the first-positioned gram). Per-doc gram counts
  //     are ~10³–10⁴, so the in-doc birthday bound is ~2⁻⁴² per doc —
  //     negligible at any corpus size (the cross-doc population never
  //     meets in a fold; contrast topNgramsHashed, whose per-SOURCE
  //     population forced a runtime tripwire).
  // Where count ties are absent the output row equals the string twin's
  // (TextAnalysisSpec pins this on the fixture plus a hand-built tie).
  // ------------------------------------------------------------------
  def repetitionStatsHashed(spark: SparkSession, sfDir: String): DataFrame =
    repetitionStatsHashedOf(Tables.documentsWide(spark, sfDir))

  private[graft] def repetitionStatsHashedOf(docs: DataFrame): DataFrame = {
    val topFold =
      s"""aggregate(array_sort(hs),
         |  struct(-1L AS prev, 0L AS run, 0L AS best_cnt, -1L AS best_fp),
         |  (acc, h) -> CASE WHEN h = acc.prev AND acc.run + 1L >= acc.best_cnt
         |      THEN struct(h AS prev, acc.run + 1L AS run, acc.run + 1L AS best_cnt, h AS best_fp)
         |    WHEN h = acc.prev
         |      THEN struct(h AS prev, acc.run + 1L AS run, acc.best_cnt AS best_cnt, acc.best_fp AS best_fp)
         |    WHEN 1L >= acc.best_cnt
         |      THEN struct(h AS prev, 1L AS run, 1L AS best_cnt, h AS best_fp)
         |    ELSE struct(h AS prev, 1L AS run, acc.best_cnt AS best_cnt, acc.best_fp AS best_fp) END,
         |  acc -> struct(acc.best_fp AS fp, acc.best_cnt AS cnt))""".stripMargin
    docs
      .select(col("doc_id"), expr(tokensSpark("text")).as("toks"),
        graft.functions.TextHashOps.shingleHashesWide(col("text"), 2).as("hs"),
        graft.functions.TextHashOps.tokenHashes(col("text")).as("th"))
      .select(col("doc_id"), col("toks"), col("hs"),
        expr("CAST(size(th) AS BIGINT)").as("n_tokens"),
        expr("CAST(size(array_distinct(th)) AS BIGINT)").as("n_distinct"),
        expr(topFold).as("top"))
      .select(col("doc_id"), col("n_tokens"),
        expr("(n_tokens - n_distinct) * 1000000L div n_tokens").as("dup_token_frac_e6"),
        when(col("top.cnt") === 0L, lit(""))
          .otherwise(expr(
            "concat_ws(' ', slice(toks, CAST(array_position(hs, top.fp) AS INT), 2))"))
          .as("top_bigram"),
        col("top.cnt").as("top_bigram_cnt"),
        expr("top.cnt * 2000000L div n_tokens").as("top_bigram_frac_e6"))
  }

  /** Oracle: the identical hash-keyed recipe in DuckDB — per-gram 62-bit
    * two-hash fingerprints, argmax by (cnt DESC, fp DESC) (the largest-
    * fingerprint tiebreak of the ascending-sort fold), winner display
    * gram at the fingerprint's FIRST position, n_distinct over 62-bit
    * token hashes.
    */
  val repetitionStatsHashedSql: String = {
    val toks = tokensDuck("text")
    val grams =
      "CASE WHEN len(toks) >= 2 THEN list_transform(range(0, len(toks) - 1)," +
        " i -> array_to_string(toks[i + 1:i + 2], ' ')) ELSE [] END"
    s"""WITH base AS (SELECT doc_id, $toks AS toks FROM ($docsSql)),
       |stats AS (
       |  SELECT doc_id, CAST(len(ths) AS BIGINT) AS n_tokens,
       |    CAST(len(list_distinct(ths)) AS BIGINT) AS n_distinct
       |  FROM (SELECT doc_id, ${hashedArray64Duck("toks")} AS ths FROM base)),
       |gh AS (
       |  SELECT doc_id, toks, ${hashedArray64Duck(grams)} AS ghs
       |  FROM (SELECT doc_id, toks, $grams AS grams
       |        FROM (SELECT doc_id, toks FROM base))),
       |g AS (
       |  SELECT doc_id, u.pos AS pos, u.h AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, len(ghs) + 1),
       |      i -> {'pos': i, 'h': ghs[i]})) AS u
       |    FROM gh)),
       |cnts AS (
       |  SELECT doc_id, h, count(*) AS cnt, min(pos) AS first_pos
       |  FROM g GROUP BY doc_id, h),
       |top AS (
       |  SELECT doc_id, h, cnt, first_pos FROM (
       |    SELECT doc_id, h, cnt, first_pos,
       |      row_number() OVER (PARTITION BY doc_id ORDER BY cnt DESC, h DESC) AS rnk
       |    FROM cnts)
       |  WHERE rnk = 1),
       |win AS (
       |  SELECT t.doc_id, t.cnt,
       |    array_to_string(b.toks[t.first_pos:t.first_pos + 1], ' ') AS gram
       |  FROM top t JOIN base b ON t.doc_id = b.doc_id)
       |SELECT s.doc_id, s.n_tokens,
       |  (s.n_tokens - s.n_distinct) * 1000000 // s.n_tokens AS dup_token_frac_e6,
       |  coalesce(w.gram, '') AS top_bigram,
       |  CAST(coalesce(w.cnt, 0) AS BIGINT) AS top_bigram_cnt,
       |  CAST(coalesce(w.cnt, 0) AS BIGINT) * 2000000 // s.n_tokens AS top_bigram_frac_e6
       |FROM stats s LEFT JOIN win w ON s.doc_id = w.doc_id""".stripMargin
  }

  // ------------------------------------------------------------------
  // Per-source top-K frequent trigrams — the boilerplate MINER: where
  // chunk/span dedup REMOVES templated passages, this query reports
  // WHICH phrases dominate each source (license headers, navigation
  // chrome, generated-text tics) so a curator can eyeball them. Shape:
  // one corpus scan + trigram explode, two-phase (source, gram) count,
  // per-source WindowGroupLimit top-K (count desc, gram asc — total
  // order). The 8-byte-hash swap (shuffle poly hashes, recover display
  // grams from a top-K-only join) exists as topNgramsHashed — see its
  // scaladoc for the measured verdict on when that trade pays.
  // ------------------------------------------------------------------
  val TopNgramK = 5L
  val NgramW = 3

  def topNgrams(spark: SparkSession, sfDir: String): DataFrame = {
    val grams = Tables.documentsWide(spark, sfDir)
      .select(col("source"), expr(tokensSpark("text")).as("toks"))
      .select(col("source"), explode(expr(
        s"CASE WHEN size(toks) >= $NgramW THEN transform(sequence(0, size(toks) - $NgramW)," +
          s" i -> concat_ws(' ', slice(toks, i + 1, $NgramW))) ELSE array() END"))
        .as("gram"))
    grams.groupBy("source", "gram").agg(count(lit(1)).as("cnt"))
      .withColumn("rnk", org.apache.spark.sql.functions.row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("source").orderBy(col("cnt").desc, col("gram"))))
      .where(col("rnk") <= TopNgramK)
      .select("source", "gram", "cnt", "rnk")
  }

  val topNgramsSql: String = {
    val toks = tokensDuck("text")
    s"""WITH grams AS (
       |  SELECT source, unnest(CASE WHEN len(toks) >= $NgramW
       |    THEN list_transform(range(0, len(toks) - ${NgramW - 1}),
       |      i -> array_to_string(toks[i + 1:i + $NgramW], ' '))
       |    ELSE [] END) AS gram
       |  FROM (SELECT source, $toks AS toks FROM documents)),
       |cnts AS (SELECT source, gram, count(*) AS cnt FROM grams GROUP BY 1, 2)
       |SELECT source, gram, cnt, rnk FROM (
       |  SELECT source, gram, cnt,
       |    row_number() OVER (PARTITION BY source ORDER BY cnt DESC, gram) AS rnk
       |  FROM cnts)
       |WHERE rnk <= $TopNgramK""".stripMargin
  }

  // ------------------------------------------------------------------
  // The EXECUTED 8-byte-gram-hash swap — same output relation as
  // topNgrams, different physical plan. STATUS AFTER MEASUREMENT (r17,
  // graft.RegimeBench on the GenScale longtok trees built to be this
  // plan's best case — ~40-char tokens, ~120-byte trigram strings,
  // heavy-df boilerplate head): the hashed plan LOSES at every sandbox
  // scale and corpus shape measured — 1.7× slower at 50 k docs
  // (6.9 s → 11.9 s) and 1.4× at 500 k docs (16.8 s → 23.5 s) on the
  // long-token trees, 1.5–1.7× on the short-token vocab trees (r16) —
  // because its display-recovery step is a SECOND full tokenize+gram
  // scan, and on one node that scan costs more than the string-shuffle
  // bytes it saves (a local "shuffle" is memcpy-priced). The plan
  // remains a HYPOTHESIS for network-priced shuffle only: on a real
  // cluster the string form ships ~15× the bytes across the wire
  // (measured ratio of shuffled key widths), and no sandbox measurement
  // can price that. Kept because output identity is gated, the
  // fp-collision tripwire bounds its one correctness risk, and the
  // plan-shape spec pins the two-scan structure — but the scaladoc
  // claim is now the measured sentence above, not "the 100 TB shape".
  // Where the hash swap DOES pay locally, with no recovery pass to buy
  // back: the per-doc sorted-fold width lever (see repetitionStats —
  // 6.9× measured).
  // Plan:
  //   1. hash each trigram to its 62-bit fingerprint AT EXPLODE TIME, so
  //      the heavy (source, gram) count shuffle carries an 8-byte long
  //      instead of the ~25-byte gram string;
  //   2. rank-with-ties candidates per source on the hash counts
  //      (rank() ≤ K keeps every boundary tie — the hash ordering must
  //      not decide ties the display form breaks by gram string);
  //   3. recover display grams for the FEW candidate fps only: a second
  //      map-side pass re-derives (source, fp, gram), a broadcast
  //      semi-join against the tiny candidate set filters before any
  //      string shuffles, and a distinct collapses repeat occurrences;
  //   4. the final row_number re-ranks by (cnt DESC, gram ASC) exactly
  //      like the string form, so the gate can pin output identity.
  // The oracle is deliberately the PLAIN string recipe — the hashed plan
  // must reproduce the straightforward relation bit-for-bit. A 62-bit fp
  // collision between distinct grams of one source would merge their
  // counts (birthday bound ~2^31 distinct grams per source) — and
  // because the oracle only runs at fixture scale, a production-size
  // collision would otherwise be a SILENTLY wrong ranking. So the
  // recovery pass carries a collision tripwire (r15): after display
  // grams are re-derived, a per-(source, fp) window count asserts each
  // candidate fp recovered EXACTLY ONE distinct gram; a collision among
  // the top-K raises at run time instead of reordering the answer. The
  // check rides the already-tiny candidate relation (≤ K·ties rows per
  // source), so it costs one window over rows that were already
  // collected for re-ranking.
  // ------------------------------------------------------------------
  def topNgramsHashed(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.functions.TextHashOps
    def gramRows(withText: Boolean): DataFrame = {
      // r19: widened like the string form (both arms of the negative-
      // result comparison parallelize their tokenize+explode the same
      // way; the two-scan structure and the broadcast recovery — the
      // pinned shape — are unchanged).
      val g = Tables.documentsWide(spark, sfDir)
        .select(col("source"), expr(tokensSpark("text")).as("toks"))
        .select(col("source"), explode(expr(
          s"CASE WHEN size(toks) >= $NgramW THEN transform(sequence(0, size(toks) - $NgramW)," +
            s" i -> concat_ws(' ', slice(toks, i + 1, $NgramW))) ELSE array() END"))
          .as("gram"))
      val hashed = g.withColumn("gram_fp", TextHashOps.polyHash(col("gram")))
      if (withText) hashed else hashed.select("source", "gram_fp")
    }
    val cand = gramRows(withText = false)
      .groupBy("source", "gram_fp").agg(count(lit(1)).as("cnt"))
      .withColumn("crnk", rank().over(org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("cnt").desc)))
      .where(col("crnk") <= TopNgramK)
      .select(col("source").as("c_source"), col("gram_fp").as("c_fp"),
        col("cnt"))
    gramRows(withText = true)
      .join(broadcast(cand),
        col("source") === col("c_source") && col("gram_fp") === col("c_fp"))
      .select("source", "gram", "cnt", "c_fp").distinct()
      // collision tripwire: one distinct gram per recovered candidate fp
      // (assert_true returns NULL when the predicate holds, so the
      // filter passes every row; a collision raises instead of silently
      // merging two grams' counts under one fp)
      .withColumn("_fp_grams", count(lit(1)).over(org.apache.spark.sql
        .expressions.Window.partitionBy("source", "c_fp")))
      .where(expr("assert_true(_fp_grams = 1, " +
        "'topNgramsHashed: gram_fp collision among top-K candidates — " +
        "two distinct grams share one 62-bit fingerprint')").isNull)
      .select("source", "gram", "cnt")
      .withColumn("rnk", row_number().over(org.apache.spark.sql.expressions
        .Window.partitionBy("source").orderBy(col("cnt").desc, col("gram"))))
      .where(col("rnk") <= TopNgramK)
      .select("source", "gram", "cnt", "rnk")
  }

  // ------------------------------------------------------------------
  // Token-rarity scoring — the integer-exact stand-in for a unigram-LM
  // perplexity filter: documents whose tokens are corpus-rare (low
  // frequency sums, hapax-heavy) are the OOD/noise candidates a quality
  // cascade routes to review. All-integer outputs keep the oracle
  // bit-exact (a log-prob mean would SUM doubles — forbidden by the
  // parity rules); ordering by sum_wf/n_tokens downstream is a division
  // of two exact integers. Shape: vocab aggregate (token → corpus wf),
  // corpus explode + equi-join on the token, per-doc integer sums —
  // the bpeTokenize dictionary discipline; at 100 TB the vocab relation
  // broadcasts (or hash-joins on the token key past broadcast size) and
  // token strings never shuffle WITH the corpus rows.
  // ------------------------------------------------------------------
  def tokenRarity(spark: SparkSession, sfDir: String): DataFrame = {
    val toks = Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(expr(tokensSpark("text"))).as("tok"))
    val vocab = toks.groupBy("tok").agg(count(lit(1)).as("wf"))
    toks.join(vocab, "tok")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum("wf").as("sum_wf"),
        min("wf").as("min_wf"),
        sum(when(col("wf") === 1L, 1L).otherwise(0L)).as("n_hapax"))
  }

  val tokenRaritySql: String =
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(${tokensDuck("text")}) AS tok FROM ($docsSql)),
       |vocab AS (SELECT tok, count(*) AS wf FROM toks GROUP BY tok)
       |SELECT doc_id, count(*) AS n_tokens,
       |  CAST(sum(wf) AS BIGINT) AS sum_wf,
       |  min(wf) AS min_wf,
       |  CAST(sum(CASE WHEN wf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
       |FROM toks t JOIN vocab v ON t.tok = v.tok
       |GROUP BY doc_id""".stripMargin

  // ------------------------------------------------------------------
  // Per-source quality deciles — the threshold-picking analysis a
  // curator runs BEFORE choosing the quality cutoff: NTILE(10) over the
  // deterministic (score desc, doc_id) total order per source, with
  // per-decile doc/token mass and the score range. Ordering on the
  // per-row double is engine-stable (identical arithmetic both sides;
  // min/max SELECT doubles, never sum them). One windowed pass over the
  // score relation + a 10×sources-row aggregate; at 100 TB the exact
  // NTILE sort is the only heavy step — swap for approx_percentile
  // cutpoints (the a_quantiles_approx recipe) when a streaming-friendly
  // histogram is enough.
  // ------------------------------------------------------------------
  /** (doc_id, n_tokens, quality_score, source) — the scored relation all
    * three quality analyses (exact deciles, sketch cutpoints, histogram)
    * read; registry-shared so the tokenize+join builds once per session. */
  private def scoredDocs(spark: SparkSession, sfDir: String): DataFrame =
    graft.CacheRegistry.cached(spark, s"text.scoredDocs:$sfDir") {
      qualityScore(spark, sfDir)
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("quality_score"))
        .join(Tables.documents(spark, sfDir).select("doc_id", "source"),
          "doc_id")
    }

  def qualityDeciles(spark: SparkSession, sfDir: String): DataFrame = {
    scoredDocs(spark, sfDir)
      .withColumn("decile", org.apache.spark.sql.functions.ntile(10).over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy(col("quality_score").desc, col("doc_id"))).cast("long"))
      .groupBy("source", "decile")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("quality_score").as("min_score"), max("quality_score").as("max_score"))
  }

  val qualityDecilesSql: String =
    s"""WITH q AS ($qualityScoreSql),
       |j AS (
       |  SELECT d.source, q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
       |    q.quality_score,
       |    CAST(ntile(10) OVER (PARTITION BY d.source
       |      ORDER BY q.quality_score DESC, q.doc_id) AS BIGINT) AS decile
       |  FROM q JOIN (SELECT doc_id, source FROM documents) d
       |    ON q.doc_id = d.doc_id)
       |SELECT source, decile, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  min(quality_score) AS min_score, max(quality_score) AS max_score
       |FROM j GROUP BY source, decile""".stripMargin

  // ------------------------------------------------------------------
  // Quality deciles, sketch-cutpoint plan — the EXECUTED form of the
  // 100 TB lever documented on `qualityDeciles`: instead of the
  // per-source global NTILE sort (a total order over every row of the
  // corpus), ONE mergeable approx_percentile aggregate yields the nine
  // per-source cutpoints (p = 0.1 … 0.9), the 9-value rows broadcast
  // back, and bucket membership is a per-row comparison — so the only
  // shuffle carries sketch partials, never rows, and the heavy side is
  // embarrassingly map-side. Bucket b = 1 + #{cutpoints strictly below
  // the score} (ascending: bucket 10 is the top decile; a score EQUAL
  // to a cutpoint falls low, and duplicate cutpoint values may skip
  // buckets — a histogram, not an equal-count NTILE). Parity: at gate
  // scales n < accuracy, so the sketch is in exact mode and returns the
  // order statistic at rank ceil(p·n) — the DuckDB oracle computes that
  // rank recipe independently (row_number + ceil join, the
  // a_quantiles_approx discipline), making the sketch-vs-rank
  // equivalence itself the gate. Scores are engine-stable doubles
  // (identical rational arithmetic both sides).
  // ------------------------------------------------------------------
  val DecilePs: Seq[Double] = (1 to 9).map(_ / 10.0)

  def qualityDecilesApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = scoredDocs(spark, sfDir)
    val psLit = DecilePs.map(p => s"${p}D").mkString("array(", ", ", ")")
    // Exact-mode guard (r15): the rank-recipe oracle defines this output
    // ONLY while every per-source n stays below the sketch accuracy (the
    // KLL/GK sketch is exact under `accuracy` observations; above it the
    // sketch approximates and the gate identity no longer holds). The
    // count rides the same aggregate; a larger future fixture fails with
    // this message instead of a confusing hash mismatch.
    val cuts = scored.groupBy("source")
      .agg(expr(s"approx_percentile(quality_score, $psLit, " +
        s"${Analytics.ApproxQuantileAccuracy})").as("cuts"),
        // count the NON-NULL scores: approx_percentile ignores NULLs, so
        // this matches the sketch's observation count exactly (r15
        // ADVICE — count(*) could fire the guard early on NULL-bearing
        // inputs; quality_score is computed non-null today, so the two
        // agree on the live fixtures).
        count(col("quality_score")).as("_n"))
      .where(expr(s"assert_true(_n < ${Analytics.ApproxQuantileAccuracy}, " +
        "'qualityDecilesApprox: per-source n exceeds ApproxQuantileAccuracy" +
        " — sketch leaves exact mode, the rank-recipe gate no longer " +
        "defines the output')").isNull)
      .select("source", "cuts")
    scored.join(broadcast(cuts), "source")
      .withColumn("bucket",
        (lit(1) + expr("size(filter(cuts, c -> quality_score > c))")).cast("long"))
      .groupBy("source", "bucket")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"),
        min("quality_score").as("min_score"), max("quality_score").as("max_score"))
  }

  val qualityDecilesApproxSql: String = {
    // p as DECIMAL literals: Spark's exact-mode sketch lands on the
    // EXACT-arithmetic ceil(p·n) rank (probed across every decile
    // fraction and n ∈ multiples of 10 where the naive double product
    // would round one rank up), and DuckDB's DECIMAL p·n is exact too —
    // casting p to DOUBLE here would INTRODUCE the off-by-one.
    val psRows = DecilePs.map(p => s"($p)").mkString(", ")
    s"""WITH q AS ($qualityScoreSql),
       |j AS (
       |  SELECT d.source, q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens,
       |    q.quality_score
       |  FROM q JOIN (SELECT doc_id, source FROM documents) d
       |    ON q.doc_id = d.doc_id),
       |counts AS (SELECT source, count(*) AS n FROM j GROUP BY source),
       |ranked AS (
       |  SELECT source, quality_score,
       |    row_number() OVER (PARTITION BY source ORDER BY quality_score) AS r
       |  FROM j),
       |ps AS (SELECT * FROM (VALUES $psRows) AS t(p)),
       |cuts AS (
       |  SELECT ranked.source, ranked.quality_score AS c
       |  FROM ranked
       |  JOIN counts ON ranked.source = counts.source
       |  JOIN ps ON ranked.r = CAST(ceil(ps.p * counts.n) AS BIGINT)),
       |b AS (
       |  SELECT j.source, j.doc_id, j.n_tokens, j.quality_score,
       |    1 + count(cuts.c) AS bucket
       |  FROM j LEFT JOIN cuts
       |    ON j.source = cuts.source AND j.quality_score > cuts.c
       |  GROUP BY j.source, j.doc_id, j.n_tokens, j.quality_score)
       |SELECT source, CAST(bucket AS BIGINT) AS bucket, count(*) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
       |  min(quality_score) AS min_score, max(quality_score) AS max_score
       |FROM b GROUP BY source, bucket""".stripMargin
  }

  // ------------------------------------------------------------------
  // Quality histogram — the bounded-cardinality relation the cutpoint
  // analyses derive from: scores live in [0,1] by construction, so a
  // fixed 100-bin integer histogram per source is a (sources × 100)-row
  // output REGARDLESS of corpus size — the mergeable-summary shape that
  // also makes the continuous twin's state grid-bounded
  // (StreamingParity.qualityHistogramStream). bin = least(floor(
  // score·100), 99): the ×100/floor is the same IEEE arithmetic on the
  // same engine-stable score double on both sides, so bin ids are
  // exact integers. One two-phase aggregate; no sort, no window.
  // ------------------------------------------------------------------
  val QualityBins: Int = 100

  def qualityHistogram(spark: SparkSession, sfDir: String): DataFrame = {
    scoredDocs(spark, sfDir)
      .withColumn("bin", least(floor(col("quality_score") * 100.0),
        lit(QualityBins - 1)).cast("long"))
      .groupBy("source", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("sum_tokens"))
  }

  val qualityHistogramSql: String =
    s"""WITH q AS ($qualityScoreSql)
       |SELECT d.source,
       |  CAST(least(floor(q.quality_score * 100.0), ${QualityBins - 1}) AS BIGINT) AS bin,
       |  count(*) AS n_docs,
       |  CAST(sum(q.n_tokens) AS BIGINT) AS sum_tokens
       |FROM q JOIN (SELECT doc_id, source FROM documents) d
       |  ON q.doc_id = d.doc_id
       |GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Binned cutpoints — the histogram CONSUMED: re-derive the nine
  // decile cutpoints from the 100-bin summary alone, never touching a
  // row. target rank = ceil(p·n) computed in exact integers
  // ((p10·n + 9) div 10), cut bin = first bin whose cumulative doc
  // count reaches it — a ≤100-row-per-source window cumsum, the
  // per-trigger read the streaming histogram twin serves. Because
  // scores map monotonically to bins, this lands in EXACTLY the bin of
  // the sketch cutpoint (rank-ceil element), asserted cross-operator in
  // the spec — the approximation error of reading cutpoints off the
  // grid is bounded by one bin width by construction. All-integer
  // output: trivially hash-exact.
  // ------------------------------------------------------------------
  def qualityCutpointsBinned(spark: SparkSession, sfDir: String): DataFrame = {
    val hist = qualityHistogram(spark, sfDir).select("source", "bin", "n_docs")
    val cum = hist
      .withColumn("cum_docs", sum("n_docs").over(
        org.apache.spark.sql.expressions.Window.partitionBy("source")
          .orderBy("bin")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
    val tot = hist.groupBy("source").agg(sum("n_docs").as("n"))
    val ps = spark.range(1, 10).toDF("p10")
    cum.join(broadcast(tot), "source")
      .crossJoin(broadcast(ps))
      .where(col("cum_docs") >= expr("(p10 * n + 9) div 10"))
      .groupBy("source", "p10")
      .agg(min("bin").as("cut_bin"))
  }

  val qualityCutpointsBinnedSql: String =
    s"""WITH h AS ($qualityHistogramSql),
       |cum AS (
       |  SELECT source, bin, sum(n_docs) OVER (PARTITION BY source
       |    ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum_docs
       |  FROM h),
       |tot AS (SELECT source, CAST(sum(n_docs) AS BIGINT) AS n FROM h GROUP BY source),
       |ps AS (SELECT * FROM (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) AS t(p10))
       |SELECT cum.source, CAST(ps.p10 AS BIGINT) AS p10, min(cum.bin) AS cut_bin
       |FROM cum JOIN tot ON cum.source = tot.source CROSS JOIN ps
       |WHERE cum.cum_docs >= (ps.p10 * tot.n + 9) // 10
       |GROUP BY cum.source, ps.p10""".stripMargin

  // ------------------------------------------------------------------
  // Sufficient-statistics regression — the map-reduce ML-training
  // pattern: ONE scan accumulates exact-integer sums (n, Σx, Σy, Σx²,
  // Σxy, Σy²) per group, the model solves in closed form from those
  // scalars. Fit: tokens ~ chars per source — the tokens-per-byte
  // calibration a 100 TB run uses to budget tokenization cost from raw
  // size without tokenizing. Parity: every sum is an exact BIGINT (the
  // per-source moments fit 2^63 through sf1 with 10× margin; a cluster
  // run would widen to DECIMAL(38,0) exactly like q4's overflow
  // variant), and slope/intercept/corr are IEEE +,-,*,/,sqrt on those
  // identical integers — bit-equal across engines by the Parity rules.
  // Scale shape: one scan, one 2-phase aggregate on the source key,
  // |sources| output rows; the model "trains" in the reduce.
  // ------------------------------------------------------------------
  def tokenCharFit(spark: SparkSession, sfDir: String): DataFrame =
    Tables.documents(spark, sfDir)
      .select(
        col("source"),
        col("n_chars").cast("long").as("x"),
        expr(s"CAST(size(${tokensSpark("text")}) AS BIGINT)").as("y"))
      .groupBy("source").agg(
        count(lit(1)).as("n"),
        sum("x").as("sx"), sum("y").as("sy"),
        sum(expr("x * x")).as("sxx"),
        sum(expr("x * y")).as("sxy"),
        sum(expr("y * y")).as("syy"))
      .select(col("source"), col("n"),
        col("sx"), col("sy"), col("sxx"), col("sxy"), col("syy"),
        expr("CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)")
          .as("slope"),
        expr("(CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)" +
          " / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE)")
          .as("intercept"),
        expr("CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))" +
          " * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))")
          .as("corr"))

  val tokenCharFitSql: String =
    s"""WITH b AS (
       |  SELECT source, CAST(n_chars AS BIGINT) AS x,
       |    CAST(len(${tokensDuck("text")}) AS BIGINT) AS y
       |  FROM documents),
       |s AS (
       |  SELECT source, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
       |    CAST(sum(x * x) AS BIGINT) AS sxx,
       |    CAST(sum(x * y) AS BIGINT) AS sxy,
       |    CAST(sum(y * y) AS BIGINT) AS syy
       |  FROM b GROUP BY source)
       |SELECT source, n, sx, sy, sxx, sxy, syy,
       |  CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       |  (CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
       |     / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept,
       |  CAST(n * sxy - sx * sy AS DOUBLE) / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |     * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr
       |FROM s""".stripMargin

  // ------------------------------------------------------------------
  // Corpus drift monitoring — the day-over-day distribution check a
  // continuously-ingesting pipeline runs before retraining decisions:
  // per token, the frequency SHARE in snapshot A vs snapshot B and the
  // absolute share drift (ppm, exact integer division). Snapshots are
  // the deterministic doc_id-parity split, the same day-1/day-2
  // convention as incremental dedup. Σ drift_ppm over the output is the
  // L1 population-shift statistic (the integer-exact PSI stand-in — a
  // log-ratio PSI would sum doubles, forbidden by the parity rules).
  // Scale shape: one conditional two-phase aggregate on the token key
  // (no join between snapshots — the parity flag rides the explode) +
  // a broadcast 1-row totals relation; |vocab| output rows. The
  // token→8-byte-hash key swap for the drift aggregate was MEASURED
  // r17 (RegimeBench, longtok trees): the hashed key is 1.4–1.5×
  // SLOWER at both 50 k and 500 k docs — the per-token hash kernel
  // costs more than the locally-memcpy-priced string shuffle saves, the
  // same single-node verdict as topNgramsHashed; a network-priced
  // shuffle is the only regime where the swap can pay.
  // ------------------------------------------------------------------
  def vocabDrift(spark: SparkSession, sfDir: String): DataFrame = {
    // Registered: consumed twice (totals side + cross-join side) — the
    // same shape Curation.mixPerSource persists for the same reason.
    val cnts = graft.CacheRegistry.cached(spark, s"text.driftCnts:$sfDir") {
      Tables.documents(spark, sfDir)
        .select((col("doc_id") % 2 === 0).as("in_a"),
          explode(expr(tokensSpark("text"))).as("token"))
        .groupBy("token")
        .agg(sum(when(col("in_a"), 1L).otherwise(0L)).as("cnt_a"),
          sum(when(col("in_a"), 0L).otherwise(1L)).as("cnt_b"))
    }
    val tot = cnts.agg(sum("cnt_a").as("tot_a"), sum("cnt_b").as("tot_b"))
    // Empty-snapshot guard (day-1 bootstrap has no B side yet): share 0,
    // not an ANSI divide-by-zero — identical CASE in both dialects.
    cnts.crossJoin(broadcast(tot))
      .select(col("token"), col("cnt_a"), col("cnt_b"),
        expr("CASE WHEN tot_a = 0 THEN 0L ELSE cnt_a * 1000000L div tot_a END")
          .as("share_a_ppm"),
        expr("CASE WHEN tot_b = 0 THEN 0L ELSE cnt_b * 1000000L div tot_b END")
          .as("share_b_ppm"))
      .withColumn("drift_ppm",
        abs(col("share_a_ppm") - col("share_b_ppm")))
  }

  val vocabDriftSql: String =
    s"""WITH cnts AS (
       |  SELECT tok AS token,
       |    CAST(sum(CASE WHEN d % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
       |    CAST(sum(CASE WHEN d % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS cnt_b
       |  FROM (SELECT doc_id AS d, unnest(${tokensDuck("text")}) AS tok FROM documents)
       |  GROUP BY tok),
       |tot AS (
       |  SELECT CAST(sum(cnt_a) AS BIGINT) AS tot_a,
       |    CAST(sum(cnt_b) AS BIGINT) AS tot_b
       |  FROM cnts),
       |sh AS (
       |  SELECT token, cnt_a, cnt_b,
       |    CASE WHEN tot_a = 0 THEN 0 ELSE cnt_a * 1000000 // tot_a END AS share_a_ppm,
       |    CASE WHEN tot_b = 0 THEN 0 ELSE cnt_b * 1000000 // tot_b END AS share_b_ppm
       |  FROM cnts CROSS JOIN tot)
       |SELECT token, cnt_a, cnt_b, share_a_ppm, share_b_ppm,
       |  abs(share_a_ppm - share_b_ppm) AS drift_ppm
       |FROM sh""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "t_vocab_drift" -> (vocabDrift _),
    "t_top_ngrams" -> (topNgrams _),
    "t_top_ngrams_hashed" -> (topNgramsHashed _),
    "t_quality_deciles" -> (qualityDeciles _),
    "t_quality_deciles_approx" -> (qualityDecilesApprox _),
    "t_quality_histogram" -> (qualityHistogram _),
    "t_quality_cutpoints_binned" -> (qualityCutpointsBinned _),
    "t_token_rarity" -> (tokenRarity _),
    "t_repetition_stats" -> (repetitionStats _),
    "t_repetition_stats_hashed" -> (repetitionStatsHashed _),
    "t_pii_scrub" -> (piiScrub _),
    "t_feature_hash" -> (featureHash _),
    "s_text_cosine_topk" -> (textCosineTopK _),
    "s_text_lsh_topk" -> (textLshTopK _),
    "t_token_stats" -> (tokenStats _),
    "t_quality_score" -> (qualityScore _),
    "t_lang_id" -> (langId _),
    "t_fingerprint" -> (fingerprint _),
    "t_collapse_repeats" -> (collapseRepeats _),
    "t_token_char_fit" -> (tokenCharFit _))

  val oracles: Map[String, String] = Map(
    "t_vocab_drift" -> vocabDriftSql,
    "t_top_ngrams" -> topNgramsSql,
    "t_top_ngrams_hashed" -> topNgramsSql,
    "t_quality_deciles" -> qualityDecilesSql,
    "t_quality_deciles_approx" -> qualityDecilesApproxSql,
    "t_quality_histogram" -> qualityHistogramSql,
    "t_quality_cutpoints_binned" -> qualityCutpointsBinnedSql,
    "t_token_rarity" -> tokenRaritySql,
    "t_repetition_stats" -> repetitionStatsSql,
    "t_repetition_stats_hashed" -> repetitionStatsHashedSql,
    "t_pii_scrub" -> piiScrubSql,
    "t_feature_hash" -> featureHashSql,
    "s_text_cosine_topk" -> textCosineTopKSql,
    "s_text_lsh_topk" -> textLshTopKSql,
    "t_token_stats" -> tokenStatsSql,
    "t_quality_score" -> qualityScoreSql,
    "t_lang_id" -> langIdSql,
    "t_fingerprint" -> fingerprintSql,
    "t_collapse_repeats" -> collapseRepeatsSql,
    "t_token_char_fit" -> tokenCharFitSql)
}
