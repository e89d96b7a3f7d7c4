package graft.operators

import graft.functions.Parity._

/** Bounded sf1 oracles for the queries whose EQUALITY oracles are
  * infeasible in DuckDB at 10× scale (the r7 headroom pass recorded 8:
  * the 5 connected-components families — recursive-CTE transitive
  * closure materializes Σ|component|·|edges| pairs — the two all-pairs
  * exactness baselines, and the curation cascade that embeds the CC
  * closure). Every check here is O(edges), O(output) or O(sample·corpus)
  * — never all-pairs — so `tools/check_scale.py` verifies ALL gated
  * queries at sf1 inside a per-oracle budget: zero timeout rows.
  *
  * Three check modes:
  *   - `violations`: the SQL lists contract violations; PASS iff it
  *     returns ZERO rows. Used where the bounded check is an invariant
  *     set (sampled exact recomputation, subset containment), not a
  *     full relation equality.
  *   - `equality`: the SQL produces the full expected relation (like a
  *     normal oracle) but composed from ALREADY-VERIFIED spark outputs
  *     of other queries instead of an infeasible recomputation; PASS is
  *     the usual frame compare.
  *   - `cc`: the checker runs an independent driver-side UNION-FIND
  *     over the DuckDB-verified pair relation and compares every
  *     component label exactly (see [[Check]]) — complete verification
  *     where ANY SQL closure is quadratic in the corpus's mega-component.
  *
  * Available views: the fixture tables, `spark_out` (the query under
  * check), and `out_<query>` for every other query's output in the same
  * Verify run. A scale check may lean on `out_X` only where X itself is
  * verified at sf1 in the same run: by a full DuckDB equality oracle
  * (the pair relations d_simhash_pairs / d_minhash_lsh_pairs /
  * d_embedding_neardup_lsh), by its own cc check (d_dedup_clusters for
  * the composed cluster consumers), or — the one weaker anchor — by its
  * own BOUNDED check: d_jaccard_prefix_pairs' equality oracle is not
  * repeatable at sf1 (DuckDB plan instability on the exploded
  * self-join), so d_jaccard_pairs' V1 prefix-slice comparison rests on
  * prefix-pairs' violations check (TOTAL soundness, 1/67-sampled
  * completeness), not on a full equality proof. Trust still flows
  * forward only — prefix-pairs' own check reads nothing but fixture
  * tables and its own output — and the DAG is now ENFORCED, not
  * documented: check_scale.py topo-sorts every `out_*` reference among
  * the bounded checks before running anything, fails on any cycle, and
  * fails on a reference to a query that is not verified in the same run.
  *
  * The bounded checks are cross-validated where the exact oracles ARE
  * feasible: the full sf0.001 check_scale pass (94 ok) runs every
  * bounded check on fixtures whose equality oracles also pass in
  * check.py, and negative controls (a split cluster, an over-merged
  * edgeless singleton, a mislabeled vertex) were each planted and
  * confirmed caught before the first sf1 run.
  */
object ScaleOracles {

  /** mode ∈ {violations, equality, cc}. For `cc`, `sql` produces the
    * (id_a, id_b) edge relation and `aux` the vertex universe (one
    * column `vid`): the checker runs a FULL union-find over the edges —
    * exact min-label components for every vertex, linear time — and
    * compares every label. SQL transitive closure is not an option at
    * sf1: the corpus holds a 43 k-doc near-dup mega-component (86% of
    * docs — per-shard suffixed texts are near-dups of each other by
    * construction), and any closure/Σsize² formulation is quadratic in
    * it; sampling can't dodge a component that large either. A
    * driver-side union-find in the checker is independent of the Spark
    * implementation (pointer-jumping label propagation) and verifies
    * 100% of components, not a sample.
    */
  final case class Check(mode: String, sql: String, aux: String = "")

  /** d_jaccard_pairs bounded check: the Σdf² exactness baseline.
    *   V1 the prefix-filtered pair set (full equality oracle feasible at
    *      sf1, spark output `out_d_jaccard_prefix_pairs`) must appear
    *      IDENTICALLY among the baseline's pairs above the prefix
    *      threshold (AllPairs prefix filtering is lossless at J > 1/2,
    *      so this is set equality on that slice, not mere containment);
    *   V2 arithmetic sanity on every output row (orientation, J > 1/10
    *      threshold actually satisfied);
    *   V3 SAMPLED EXACT RECOMPUTATION: all pairs whose smaller id ≡ 0
    *      (mod 67) recomputed from the shingle relation — 1/67 of the
    *      quadratic work — and compared both directions.
    */
  private val jaccardPairsCheck: String =
    s"""WITH sh AS (${Dedup.shingleRelSql}),
       |out AS (SELECT id_a, id_b, inter, uni FROM spark_out),
       |v1 AS (
       |  SELECT 'prefix-slice-mismatch' AS violation, id_a AS a, id_b AS b FROM (
       |    (SELECT id_a, id_b, inter, uni FROM out_d_jaccard_prefix_pairs
       |     EXCEPT
       |     SELECT id_a, id_b, inter, uni FROM out
       |     WHERE inter * ${Dedup.PrefixJaccDen} > uni * ${Dedup.PrefixJaccNum})
       |    UNION ALL
       |    (SELECT id_a, id_b, inter, uni FROM out
       |     WHERE inter * ${Dedup.PrefixJaccDen} > uni * ${Dedup.PrefixJaccNum}
       |     EXCEPT
       |     SELECT id_a, id_b, inter, uni FROM out_d_jaccard_prefix_pairs))),
       |v2 AS (
       |  SELECT 'bad-pair-arith' AS violation, id_a AS a, id_b AS b FROM out
       |  WHERE inter * ${Dedup.JaccDen} <= uni * ${Dedup.JaccNum}
       |     OR inter < 1 OR inter > uni OR id_a >= id_b),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |samp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM (SELECT * FROM sh WHERE doc_id % 67 = 0) a
       |  JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sampfull AS (
       |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
       |  FROM samp
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE inter * ${Dedup.JaccDen} > (sa.n + sb.n - inter) * ${Dedup.JaccNum}),
       |v3 AS (
       |  SELECT 'sampled-exact-mismatch' AS violation, id_a AS a, id_b AS b FROM (
       |    (SELECT id_a, id_b, inter, uni FROM sampfull
       |     EXCEPT SELECT id_a, id_b, inter, uni FROM out WHERE id_a % 67 = 0)
       |    UNION ALL
       |    (SELECT id_a, id_b, inter, uni FROM out WHERE id_a % 67 = 0
       |     EXCEPT SELECT id_a, id_b, inter, uni FROM sampfull)))
       |SELECT * FROM (
       |  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
       |LIMIT 20""".stripMargin

  /** d_jaccard_prefix_pairs bounded check. The equality oracle
    * regenerates the prefix-index candidate join in DuckDB, which ran
    * inside a 120 s budget on the r7 machine state but exceeds 20
    * MINUTES on the r8 rerun (same SQL, same fixture — DuckDB plan
    * instability on the exploded self-join), so it cannot anchor a
    * repeatable gate. The bounded form is trust-independent of every
    * other query (fixture tables + own output only — d_jaccard_pairs'
    * check cross-references THIS output, so this one must not reference
    * back):
    *   V1 TOTAL soundness: for every output pair, |A∩B| recomputed from
    *      the shingle relation by a (pair × shingle) join and the uni
    *      arithmetic re-derived from per-doc sizes — O(output·|doc|),
    *      every row, no sampling;
    *   V2 threshold/orientation sanity on every row;
    *   V3 sampled completeness: all pairs with smaller id ≡ 0 (mod 67)
    *      recomputed exactly at the J > 1/2 threshold, compared both
    *      directions.
    */
  private val jaccardPrefixPairsCheck: String =
    s"""WITH sh AS (${Dedup.shingleRelSql}),
       |out AS (SELECT id_a, id_b, inter, uni FROM spark_out),
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |chk AS (
       |  SELECT o.id_a, o.id_b, o.inter, o.uni, count(*) AS inter2
       |  FROM out o
       |  JOIN sh a ON a.doc_id = o.id_a
       |  JOIN sh b ON b.doc_id = o.id_b AND b.sh = a.sh
       |  GROUP BY 1, 2, 3, 4),
       |v1 AS (
       |  SELECT 'pair-arith-mismatch' AS violation, o.id_a AS a, o.id_b AS b
       |  FROM out o
       |  LEFT JOIN chk c ON c.id_a = o.id_a AND c.id_b = o.id_b
       |  LEFT JOIN sizes sa ON sa.doc_id = o.id_a
       |  LEFT JOIN sizes sb ON sb.doc_id = o.id_b
       |  WHERE c.id_a IS NULL OR c.inter2 <> o.inter
       |     OR sa.n IS NULL OR sb.n IS NULL
       |     OR sa.n + sb.n - c.inter2 <> o.uni),
       |v2 AS (
       |  SELECT 'bad-pair-arith' AS violation, id_a AS a, id_b AS b FROM out
       |  WHERE inter * ${Dedup.PrefixJaccDen} <= uni * ${Dedup.PrefixJaccNum}
       |     OR inter < 1 OR inter > uni OR id_a >= id_b),
       |samp AS (
       |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
       |  FROM (SELECT * FROM sh WHERE doc_id % 67 = 0) a
       |  JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |sampfull AS (
       |  SELECT id_a, id_b, inter, sa.n + sb.n - inter AS uni
       |  FROM samp
       |  JOIN sizes sa ON sa.doc_id = id_a
       |  JOIN sizes sb ON sb.doc_id = id_b
       |  WHERE inter * ${Dedup.PrefixJaccDen}
       |        > (sa.n + sb.n - inter) * ${Dedup.PrefixJaccNum}),
       |v3 AS (
       |  SELECT 'sampled-exact-mismatch' AS violation, id_a AS a, id_b AS b FROM (
       |    (SELECT id_a, id_b, inter, uni FROM sampfull
       |     EXCEPT SELECT id_a, id_b, inter, uni FROM out WHERE id_a % 67 = 0)
       |    UNION ALL
       |    (SELECT id_a, id_b, inter, uni FROM out WHERE id_a % 67 = 0
       |     EXCEPT SELECT id_a, id_b, inter, uni FROM sampfull)))
       |SELECT * FROM (
       |  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
       |LIMIT 20""".stripMargin

  /** d_embedding_neardup bounded check: the all-pairs cosine baseline.
    *   V1 the LSH pair set (full equality oracle feasible at sf1) must
    *      appear identically in the baseline output (LSH candidates are
    *      a subset of all pairs, verified values included);
    *   V2 EVERY output row's dot/norms recomputed from the quantized
    *      vectors — O(|output|), full soundness, no estimates;
    *   V3 SAMPLED EXACT COMPLETENESS: the full neighborhood of every
    *      vec_id ≡ 0 (mod 199) recomputed against the whole corpus;
    *      every above-threshold pair it finds must exist in the output.
    */
  private val embeddingNearDupCheck: String = {
    val qSql =
      s"""SELECT vec_id, v, ${dotDuck("v", "v")} AS norm
         |FROM (SELECT vec_id, ${quantizeDuck("embedding")} AS v FROM embeddings)""".stripMargin
    s"""WITH q AS ($qSql),
       |out AS (SELECT id_a, id_b, dot, na, nb FROM spark_out),
       |v1 AS (
       |  SELECT 'lsh-pair-missing' AS violation, id_a AS a, id_b AS b FROM (
       |    SELECT id_a, id_b, dot, na, nb FROM out_d_embedding_neardup_lsh
       |    EXCEPT SELECT id_a, id_b, dot, na, nb FROM out)),
       |v2 AS (
       |  SELECT 'pair-arith-mismatch' AS violation, o.id_a AS a, o.id_b AS b
       |  FROM out o
       |  LEFT JOIN q a ON a.vec_id = o.id_a
       |  LEFT JOIN q b ON b.vec_id = o.id_b
       |  WHERE a.vec_id IS NULL OR b.vec_id IS NULL
       |     OR ${dotDuck("a.v", "b.v")} <> o.dot
       |     OR a.norm <> o.na OR b.norm <> o.nb
       |     OR NOT (${cosineDuck("o.dot", "o.na", "o.nb")} > ${Dedup.CosThreshold})
       |     OR o.id_a >= o.id_b),
       |samp AS (
       |  SELECT least(s.vec_id, c.vec_id) AS id_a,
       |         greatest(s.vec_id, c.vec_id) AS id_b
       |  FROM (SELECT * FROM q WHERE vec_id % 199 = 0) s
       |  JOIN q c ON s.vec_id <> c.vec_id
       |  WHERE ${cosineDuck(dotDuck("s.v", "c.v"), "s.norm", "c.norm")}
       |        > ${Dedup.CosThreshold}),
       |v3 AS (
       |  SELECT 'sampled-pair-missing' AS violation, s.id_a AS a, s.id_b AS b
       |  FROM (SELECT DISTINCT id_a, id_b FROM samp) s
       |  LEFT JOIN out o ON o.id_a = s.id_a AND o.id_b = s.id_b
       |  WHERE o.id_a IS NULL)
       |SELECT * FROM (
       |  SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3)
       |LIMIT 20""".stripMargin
  }

  val checks: Map[String, Check] = Map(
    "d_dedup_clusters" -> Check("cc",
      "SELECT id_a, id_b FROM out_d_simhash_pairs",
      "SELECT doc_id AS vid FROM documents"),
    "d_minhash_clusters" -> Check("cc",
      "SELECT id_a, id_b FROM out_d_minhash_lsh_pairs",
      "SELECT doc_id AS vid FROM documents"),
    "d_embedding_clusters" -> Check("cc",
      "SELECT id_a, id_b FROM out_d_embedding_neardup_lsh",
      "SELECT vec_id AS vid FROM embeddings"),
    // The two cluster CONSUMERS become equality oracles composed from the
    // d_dedup_clusters output that the violations check above just
    // verified — same relations the gated oracles compute, minus the
    // infeasible closure.
    "d_cluster_sizes" -> Check("equality",
      """SELECT cluster_size, count(*) AS n_clusters FROM (
        |  SELECT canonical_id, count(*) AS cluster_size
        |  FROM out_d_dedup_clusters GROUP BY canonical_id)
        |GROUP BY cluster_size""".stripMargin),
    "d_canonical_stats" -> Check("equality",
      """SELECT d.source, count(*) AS n_docs,
        |  CAST(sum(CASE WHEN c.canonical_id = c.doc_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_canonical
        |FROM (SELECT doc_id, source FROM documents) d
        |JOIN out_d_dedup_clusters c ON d.doc_id = c.doc_id
        |GROUP BY 1""".stripMargin),
    "p_curation_cascade" -> Check("equality",
      Curation.curationCascadeSqlWith(
        "SELECT doc_id, canonical_id FROM out_d_dedup_clusters")),
    // Same composition rule for the split-leakage consumer: its gate
    // oracle embeds the recursive closure (quadratic in the sf1
    // mega-component); here the union-find-verified cluster output
    // substitutes and the splits recompute linearly from documents.
    "p_split_leakage" -> Check("equality",
      s"""WITH splits AS (${Curation.splitAssignSql}),
         |j AS (
         |  SELECT c.doc_id, c.canonical_id, s.split
         |  FROM out_d_dedup_clusters c JOIN splits s ON c.doc_id = s.doc_id),
         |tc AS (SELECT DISTINCT canonical_id FROM j WHERE split = 'train')
         |SELECT split, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN t.canonical_id IS NOT NULL THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_leaked
         |FROM j LEFT JOIN tc t ON j.canonical_id = t.canonical_id
         |WHERE j.split <> 'train'
         |GROUP BY split""".stripMargin),
    // The day-2 incremental path's whole contract is row-identity with
    // the full recompute, and d_dedup_clusters is union-find-verified in
    // the same run — so the composed equality IS the complete check.
    "d_incremental_clusters" -> Check("equality",
      "SELECT doc_id, canonical_id FROM out_d_dedup_clusters"),
    "d_jaccard_pairs" -> Check("violations", jaccardPairsCheck),
    "d_jaccard_prefix_pairs" -> Check("violations", jaccardPrefixPairsCheck),
    "d_embedding_neardup" -> Check("violations", embeddingNearDupCheck))
}
