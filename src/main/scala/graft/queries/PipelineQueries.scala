package graft.queries

import org.apache.spark.sql.functions._
import graft.Tables
import graft.pipeline._
import graft.streaming.EventStreams

/** Beyond-reference LLM-data-pipeline operators over the `documents`,
  * `embeddings`, and `events` tables: dedup (exact/MinHash/SimHash/
  * n-gram/embedding), similarity search (brute-force + LSH), text
  * analysis, multimodal plumbing, and the batch shape of the streaming
  * windowed aggregation.
  *
  * EVERY query here is DuckDB-oracle-checked, including the hash/LSH
  * operators: the oracles replay the candidate generation itself —
  * inlined seed-42 hyperplanes for sign-LSH, HUGEINT FNV-1a for SimHash,
  * the full Lloyd trajectory for IVF — rather than an exact-search
  * stand-in, so both the pruning and the scoring are verified.
  */
object PipelineQueries {

  /** DuckDB oracle for the near-dup pair queries: exact Jaccard over word
    * k-shingle sets for ALL doc pairs above `threshold`. Mirrors
    * Dedup.shingleRows' normalization (lowercase, strip non-alnum, split
    * on whitespace, docs with < k tokens have no shingles). The threshold
    * is applied to the 6-decimal-rounded value, matching the Spark side.
    */
  private def jaccardAllPairsSql(k: Int, threshold: String): String = {
    val hi = k - 1 // DuckDB list slices are inclusive: toks[i : i+k-1]
    s"""WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
        |                     x -> x <> '') AS toks
        |  FROM read_parquet('{SFDIR}/documents.parquet')
        |), sets AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(toks) - $k + 2),
        |                                      i -> list_aggregate(toks[i:i+$hi], 'string_agg', ' '))) AS s
        |  FROM toks WHERE len(toks) >= $k
        |)
        |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |       ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |             / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
        |FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        |WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= $threshold
        |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** DuckDB connected-components dedup block shared by the p13/p15
    * oracles: exact all-pairs Jaccard edges (k=3 shingles) at `threshold`
    * over `docsCte` (a CTE named `corpus` with doc_id + text), then
    * min-label components via a recursive transitive-closure CTE, keeping
    * the min-id representative per cluster plus every unpaired doc.
    * Mirrors Dedup.nearDupClusters/dedupNearDuplicates semantics; the
    * Spark side stays banded-LSH + iterative label propagation — the
    * all-pairs/recursive form exists only on the tiny oracle side.
    */
  private def ccDedupTail(threshold: String): String =
    s"""toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
        |                     x -> x <> '') AS toks
        |  FROM corpus
        |), sets AS (
        |  SELECT doc_id,
        |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
        |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
        |  FROM toks WHERE len(toks) >= 3
        |), pairs AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
        |  WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= $threshold
        |), edges AS (
        |  SELECT doc_a AS src, doc_b AS dst FROM pairs
        |  UNION
        |  SELECT doc_b AS src, doc_a AS dst FROM pairs
        |), reach AS (
        |  SELECT src AS doc, src AS r FROM edges
        |  UNION
        |  SELECT e.src AS doc, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.doc
        |), labels AS (
        |  SELECT doc, MIN(r) AS label FROM reach GROUP BY doc
        |), drops AS (
        |  SELECT doc FROM labels WHERE doc <> label
        |)""".stripMargin

  /** DuckDB expression reproducing Similarity.lshSignature for the
    * embeddings table's 64-dim vectors: the hyperplane constants are the
    * SAME deterministic seed-42 planes the Spark side uses, inlined as
    * literals (Double.toString round-trips exactly, so both engines see
    * bit-identical plane values). `col` must be a DOUBLE[] expression.
    * This lets oracles verify the LSH semantics themselves — bucketed
    * candidate generation + exact scoring — not just an exact-search
    * equivalent.
    */
  private def bucketSql(col: String, planes: Int, seed: Long = 42L): String =
    Similarity.hyperplanes(64, planes, seed).zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product($col, ${p.mkString("[", ",", "]")}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** DuckDB replay of Similarity.ivfTrain(k, iters=2)'s full training
    * trajectory — Knuth-hash init, two Lloyd rounds, final assignment
    * (`a3` = vec_id, e, cid). Shared prefix of the p14 (ANN serving, k=8)
    * and p20 (semantic dedup, k=16 — larger k = smaller cells = fewer
    * within-cell pairs, the SemDeDup scale knob) oracles. */
  /** idGate WHERE clause for an absolute-target sample of the
    * embeddings table — min(1, target/count) replayed with the same
    * rounding as Curation.deterministicSample. */
  private def vecSampleGateSql(target: Int): String =
    s"\n    |  WHERE (vec_id % 100000 * 2654435761) % 1000000 < " +
      s"(SELECT CAST(ROUND(LEAST(1.0, $target.0 / COUNT(*)) * 1000000) AS BIGINT) " +
      "FROM read_parquet('{SFDIR}/embeddings.parquet'))"

  /** Shared oracle tail of the IVF recall audits (p90/p96): probe
    * selection, both rankings, per-query hit counts — over whatever
    * `v` CTE the prefix defined. */
  private val ivfAuditTailSql: String =
    """, qs AS (
      |  SELECT vec_id AS qid, e AS qv FROM v WHERE vec_id % 50 = 0
      |), probes AS (
      |  SELECT qid, cid FROM (
      |    SELECT qs.qid, c2.cid,
      |           ROW_NUMBER() OVER (PARTITION BY qs.qid
      |                              ORDER BY list_dot_product(c2.c, qs.qv) DESC, c2.cid ASC) AS rn
      |    FROM qs, c2) WHERE rn <= 3
      |), approx AS (
      |  SELECT qid, vid FROM (
      |    SELECT p.qid, a3.vec_id AS vid,
      |           ROW_NUMBER() OVER (PARTITION BY p.qid
      |                              ORDER BY ROUND(list_cosine_similarity(a3.e, qs.qv), 6) DESC, a3.vec_id ASC) AS rn
      |    FROM probes p JOIN a3 ON a3.cid = p.cid JOIN qs ON qs.qid = p.qid
      |  ) WHERE rn <= 10
      |), exact AS (
      |  SELECT qid, vid FROM (
      |    SELECT qs.qid, v.vec_id AS vid,
      |           ROW_NUMBER() OVER (PARTITION BY qs.qid
      |                              ORDER BY ROUND(list_cosine_similarity(v.e, qs.qv), 6) DESC, v.vec_id ASC) AS rn
      |    FROM v, qs
      |  ) WHERE rn <= 10
      |)
      |SELECT e.qid, CAST(COUNT(a.vid) AS BIGINT) AS n_hit,
      |       ROUND(CAST(COUNT(a.vid) AS DOUBLE) / COUNT(e.vid), 6) AS recall
      |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.vid = e.vid
      |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** Like [[ivfAssignSql]] but the recrawl split: Lloyd TRAINS on the
    * low-id 70% only (`train` rows) while the final `a3` assignment
    * covers EVERYTHING — the frozen-centroid incremental shape p98
    * verifies. `cutoff` stays available downstream. */
  private def ivfAssignIncrementalSql(k: Int): String =
    s"""WITH cutoff AS (
    |  SELECT MAX(vec_id) * 7 // 10 AS cut FROM read_parquet('{SFDIR}/embeddings.parquet')
    |), v AS (
    |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
    |         CAST((vec_id % 100000) * 2654435761 % $k AS INT) AS c0a,
    |         vec_id <= (SELECT cut FROM cutoff) AS train
    |  FROM read_parquet('{SFDIR}/embeddings.parquet')
    |), u0 AS (
    |  SELECT c0a AS cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM v WHERE train
    |), c0 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u0 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a1 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c0.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c0.c) DESC, c0.cid DESC) AS rn
    |    FROM v, c0 WHERE v.train
    |  ) WHERE rn = 1
    |), u1 AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a1
    |), c1 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u1 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a2 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c1.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c1.c) DESC, c1.cid DESC) AS rn
    |    FROM v, c1 WHERE v.train
    |  ) WHERE rn = 1
    |), u2 AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a2
    |), c2 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u2 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a3 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c2.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c2.c) DESC, c2.cid DESC) AS rn
    |    FROM v, c2
    |  ) WHERE rn = 1
    |)""".stripMargin

  private def ivfAssignSql(k: Int, docWhere: String = ""): String =
    s"""WITH v AS (
    |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
    |         CAST((vec_id % 100000) * 2654435761 % $k AS INT) AS c0a
    |  FROM read_parquet('{SFDIR}/embeddings.parquet')$docWhere
    |), u0 AS (
    |  SELECT c0a AS cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM v
    |), c0 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u0 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a1 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c0.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c0.c) DESC, c0.cid DESC) AS rn
    |    FROM v, c0
    |  ) WHERE rn = 1
    |), u1 AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a1
    |), c1 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u1 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a2 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c1.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c1.c) DESC, c1.cid DESC) AS rn
    |    FROM v, c1
    |  ) WHERE rn = 1
    |), u2 AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a2
    |), c2 AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM u2 GROUP BY cid, ord
    |  ) GROUP BY cid
    |), a3 AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT v.vec_id, v.e, c2.cid,
    |           ROW_NUMBER() OVER (PARTITION BY v.vec_id
    |                              ORDER BY list_dot_product(v.e, c2.c) DESC, c2.cid DESC) AS rn
    |    FROM v, c2
    |  ) WHERE rn = 1
    |)""".stripMargin

  /** p14 oracle: [[ivfAssignSql]] + probe selection + in-cell exact
    * cosine top-k. */
  private val ivfOracleSql: String = ivfAssignSql(8) +
    """, q AS (
    |  SELECT e AS qe FROM v WHERE vec_id = 0
    |), probes AS (
    |  SELECT cid FROM c2, q ORDER BY list_dot_product(c2.c, q.qe) DESC, cid ASC LIMIT 3
    |)
    |SELECT a3.vec_id, ROUND(list_cosine_similarity(a3.e, q.qe), 6) AS cosine
    |FROM a3, q WHERE a3.cid IN (SELECT cid FROM probes)
    |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** One subspace's full Lloyd replay for the PQ oracle: identical
    * trajectory to [[ivfAssignSql]] but over the `[lo:hi]` slice, CTEs
    * suffixed `_s`. Appends to a base CTE `src(vec_id, srcCol)` —
    * `v(e)` for raw-vector PQ (p38/p39), `res(r)` for residual PQ
    * (p42). */
  private def pqAssignSql(s: Int, lo: Int, hi: Int, k: Int,
      src: String = "v", srcCol: String = "e"): String = {
    def n(b: String) = s"${b}_$s"
    s""", ${n("v")} AS (
    |  SELECT vec_id, $srcCol[$lo:$hi] AS e,
    |         CAST((vec_id % 100000) * 2654435761 % $k AS INT) AS c0a
    |  FROM $src
    |), ${n("u0")} AS (
    |  SELECT c0a AS cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM ${n("v")}
    |), ${n("c0")} AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM ${n("u0")} GROUP BY cid, ord
    |  ) GROUP BY cid
    |), ${n("a1")} AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT vv.vec_id, vv.e, cc.cid,
    |           ROW_NUMBER() OVER (PARTITION BY vv.vec_id
    |                              ORDER BY list_dot_product(vv.e, cc.c) DESC, cc.cid DESC) AS rn
    |    FROM ${n("v")} vv, ${n("c0")} cc
    |  ) WHERE rn = 1
    |), ${n("u1")} AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM ${n("a1")}
    |), ${n("c1")} AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM ${n("u1")} GROUP BY cid, ord
    |  ) GROUP BY cid
    |), ${n("a2")} AS (
    |  SELECT vec_id, e, cid FROM (
    |    SELECT vv.vec_id, vv.e, cc.cid,
    |           ROW_NUMBER() OVER (PARTITION BY vv.vec_id
    |                              ORDER BY list_dot_product(vv.e, cc.c) DESC, cc.cid DESC) AS rn
    |    FROM ${n("v")} vv, ${n("c1")} cc
    |  ) WHERE rn = 1
    |), ${n("u2")} AS (
    |  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM ${n("a2")}
    |), ${n("c2")} AS (
    |  SELECT cid, list(m ORDER BY ord) AS c FROM (
    |    SELECT cid, ord, AVG(val) AS m FROM ${n("u2")} GROUP BY cid, ord
    |  ) GROUP BY cid
    |), ${n("a3")} AS (
    |  SELECT vec_id, cid FROM (
    |    SELECT vv.vec_id, cc.cid,
    |           ROW_NUMBER() OVER (PARTITION BY vv.vec_id
    |                              ORDER BY list_dot_product(vv.e, cc.c) DESC, cc.cid DESC) AS rn
    |    FROM ${n("v")} vv, ${n("c2")} cc
    |  ) WHERE rn = 1
    |)""".stripMargin
  }

  /** p89/p92 oracle body: the full portable-FNV banding replay.
    * `docWhere` filters the audited documents (empty for the full
    * sweep; the idGate predicate for the sampled variant) and `dfCap`
    * reproduces the maxDocFreq inverted-index bound on the exact side
    * (None = direct sets self-join — same discovered pair set as an
    * uncapped inverted index, since discovery requires >= 1 shared
    * shingle either way).
    */
  private def lshAuditSql(docWhere: String, dfCap: Option[Int]): String = {
    val exact = dfCap match {
      case Some(cap) =>
        """|  SELECT s2.doc_a, s2.doc_b
               |  FROM (
               |    SELECT DISTINCT la.doc AS doc_a, lb.doc AS doc_b
               |    FROM (SELECT doc, shingle FROM shr
               |          WHERE shingle IN (SELECT shingle FROM shr
               |                            GROUP BY 1 HAVING COUNT(*) <= __CAP__)) la
               |    JOIN (SELECT doc, shingle FROM shr
               |          WHERE shingle IN (SELECT shingle FROM shr
               |                            GROUP BY 1 HAVING COUNT(*) <= __CAP__)) lb
               |      ON la.shingle = lb.shingle AND la.doc < lb.doc
               |  ) s2 JOIN sets a ON a.doc = s2.doc_a JOIN sets b ON b.doc = s2.doc_b
               |  WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               |              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.12""".stripMargin.replace("__CAP__", cap.toString)
      case None =>
        """|  SELECT a.doc AS doc_a, b.doc AS doc_b
               |  FROM sets a JOIN sets b ON a.doc < b.doc
               |  WHERE len(list_intersect(a.s, b.s)) > 0
               |    AND ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               |              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.12""".stripMargin
    }
    """WITH toks AS (
             |  SELECT doc_id AS doc,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')__DOCWHERE__
             |), sets AS (
             |  SELECT doc,
             |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM toks WHERE len(toks) >= 3
             |), shr AS (
             |  SELECT doc, unnest(s) AS shingle FROM sets
             |), seeds AS (SELECT unnest(range(0, 32)) AS seed
             |), mh AS (
             |  SELECT doc, seed,
             |         MIN(CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
             |                       THEN h - CAST('18446744073709551616' AS HUGEINT)
             |                       ELSE h END AS BIGINT)) AS mh
             |  FROM (
             |    SELECT doc, seed,
             |           list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(CAST(seed AS VARCHAR) || '#' || shingle)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS h
             |    FROM shr, seeds
             |  ) GROUP BY doc, seed
             |), bnd AS (
             |  SELECT doc, CAST(seed // 2 AS INT) AS band,
             |         string_agg(CAST(mh AS VARCHAR), ',' ORDER BY seed) AS bstr
             |  FROM mh GROUP BY doc, CAST(seed // 2 AS INT)
             |), bkey AS (
             |  SELECT doc, band,
             |         CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
             |                   THEN h - CAST('18446744073709551616' AS HUGEINT)
             |                   ELSE h END AS BIGINT) AS bkey
             |  FROM (
             |    SELECT doc, band,
             |           list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(bstr)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS h
             |    FROM bnd
             |  )
             |), cand AS (
             |  SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
             |  FROM bkey a JOIN bkey b
             |    ON a.band = b.band AND a.bkey = b.bkey AND a.doc < b.doc
             |), ex AS (
             __EXACT__
             |), hit AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS c
             |  FROM ex JOIN cand USING (doc_a, doc_b)
             |), card AS (
             |  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM ex) AS n_exact,
             |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_candidates,
             |         (SELECT c FROM hit) AS n_hit
             |)
             |SELECT n_exact, n_candidates, n_hit, n_exact - n_hit AS n_missed,
             |       ROUND(CAST(n_hit AS DOUBLE) / CASE WHEN n_exact = 0 THEN NULL ELSE n_exact END, 6) AS recall,
             |       ROUND(CAST(n_hit AS DOUBLE) / CASE WHEN n_candidates = 0 THEN NULL ELSE n_candidates END, 6) AS precision
             |FROM card""".stripMargin
      .replace("__DOCWHERE__", docWhere)
      .replace("__EXACT__", exact.replace("\n", "\n             "))
  }

  /** p38 oracle: two subspace Lloyd replays + ADC candidate cut + exact
    * rescoring — Similarity.trainPq/pqTopK semantics (m=2, k=4, 64-dim). */
  private val pqOracleSql: String =
    """WITH v AS (
    |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
    |  FROM read_parquet('{SFDIR}/embeddings.parquet')
    |)""".stripMargin +
      pqAssignSql(0, 1, 32, 4) + pqAssignSql(1, 33, 64, 4) +
      """, q38 AS (
    |  SELECT e AS qe, e[1:32] AS q0, e[33:64] AS q1 FROM v WHERE vec_id = 0
    |), d0 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q38.q0) AS d
    |  FROM a3_0 a JOIN c2_0 c USING (cid), q38
    |), d1 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q38.q1) AS d
    |  FROM a3_1 a JOIN c2_1 c USING (cid), q38
    |), adc AS (
    |  SELECT vec_id, ROUND(d0.d + d1.d, 6) AS adc FROM d0 JOIN d1 USING (vec_id)
    |), cand AS (
    |  SELECT vec_id FROM adc ORDER BY adc DESC, vec_id ASC LIMIT 50
    |)
    |SELECT v.vec_id, ROUND(list_cosine_similarity(v.e, q38.qe), 6) AS cosine
    |FROM v JOIN cand USING (vec_id), q38
    |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** p39 oracle: the COMPOSED two-level replay — coarse IVF trajectory
    * ([[ivfAssignSql]], k=8) for cell membership + probe selection, both
    * subspace Lloyd replays ([[pqAssignSql]], m=2, k=4) for the codes,
    * then ADC restricted to the probed cells and exact rescoring —
    * Similarity.ivfPqTopK semantics end to end, including every
    * tie-break (cid ASC on probes, vec_id ASC on the candidate cut). */
  private val ivfPqOracleSql: String = ivfAssignSql(8) +
    pqAssignSql(0, 1, 32, 4) + pqAssignSql(1, 33, 64, 4) +
    """, q39 AS (
    |  SELECT e AS qe, e[1:32] AS q0, e[33:64] AS q1 FROM v WHERE vec_id = 0
    |), probes39 AS (
    |  SELECT cid FROM c2, q39
    |  ORDER BY list_dot_product(c2.c, q39.qe) DESC, cid ASC LIMIT 3
    |), incell AS (
    |  SELECT vec_id FROM a3 WHERE cid IN (SELECT cid FROM probes39)
    |), d0 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q39.q0) AS d
    |  FROM a3_0 a JOIN c2_0 c USING (cid), q39
    |), d1 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q39.q1) AS d
    |  FROM a3_1 a JOIN c2_1 c USING (cid), q39
    |), adc39 AS (
    |  SELECT i.vec_id, ROUND(d0.d + d1.d, 6) AS adc
    |  FROM incell i JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
    |), cand39 AS (
    |  SELECT vec_id FROM adc39 ORDER BY adc DESC, vec_id ASC LIMIT 50
    |)
    |SELECT v.vec_id, ROUND(list_cosine_similarity(v.e, q39.qe), 6) AS cosine
    |FROM v JOIN cand39 USING (vec_id), q39
    |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** p124 oracle: the serving-index DELETE lifecycle — the p39 replay
    * (coarse + both PQ subspace Lloyd trajectories, probe → ADC →
    * rescore) with the deleted ids (vec_id % 7 = 3) excluded from the
    * probed cells, exactly where the engine's tombstone anti-join
    * excludes them (before the ADC candidate cut, so the rescore pool
    * shifts identically). Emitted twice under phase labels: the
    * tombstoned probe (delete visible with no rewrite) and the
    * compacted probe (tombstones folded into the files) must BOTH
    * equal this ground truth.
    */
  private val annDeleteOracleSql: String = ivfAssignSql(8) +
    pqAssignSql(0, 1, 32, 4) + pqAssignSql(1, 33, 64, 4) +
    """, q124 AS (
    |  SELECT e AS qe, e[1:32] AS q0, e[33:64] AS q1 FROM v WHERE vec_id = 0
    |), probes124 AS (
    |  SELECT cid FROM c2, q124
    |  ORDER BY list_dot_product(c2.c, q124.qe) DESC, cid ASC LIMIT 3
    |), incell AS (
    |  SELECT vec_id FROM a3
    |  WHERE cid IN (SELECT cid FROM probes124) AND vec_id % 7 <> 3
    |), d0 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q124.q0) AS d
    |  FROM a3_0 a JOIN c2_0 c USING (cid), q124
    |), d1 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q124.q1) AS d
    |  FROM a3_1 a JOIN c2_1 c USING (cid), q124
    |), adc124 AS (
    |  SELECT i.vec_id, ROUND(d0.d + d1.d, 6) AS adc
    |  FROM incell i JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
    |), cand124 AS (
    |  SELECT vec_id FROM adc124 ORDER BY adc DESC, vec_id ASC LIMIT 50
    |), final124 AS (
    |  SELECT v.vec_id, ROUND(list_cosine_similarity(v.e, q124.qe), 6) AS cosine
    |  FROM v JOIN cand124 USING (vec_id), q124
    |  ORDER BY cosine DESC, vec_id ASC LIMIT 10
    |)
    |SELECT 'compacted' AS phase, vec_id, cosine FROM final124
    |UNION ALL
    |SELECT 'tombstoned' AS phase, vec_id, cosine FROM final124
    |ORDER BY phase, cosine DESC, vec_id""".stripMargin

  /** p42 oracle: residual IVF-PQ — coarse replay, the residual frame
    * r = e − c(cid), BOTH subspace Lloyd replays over the residual
    * slices, then the inner-product ADC decomposition
    * dot(q,v) ≈ dot(q,c_cell) + Σ_s dot(q_s, book_s[code]) restricted
    * to the probed cells, and exact rescoring. */
  private val ivfPqResidualOracleSql: String = ivfAssignSql(8) +
    """, res AS (
    |  SELECT a3.vec_id,
    |         list_transform(range(1, len(a3.e) + 1), i -> a3.e[i] - c2.c[i]) AS r
    |  FROM a3 JOIN c2 USING (cid)
    |)""".stripMargin +
    pqAssignSql(0, 1, 32, 4, src = "res", srcCol = "r") +
    pqAssignSql(1, 33, 64, 4, src = "res", srcCol = "r") +
    """, q42 AS (
    |  SELECT e AS qe, e[1:32] AS q0, e[33:64] AS q1 FROM v WHERE vec_id = 0
    |), probes42 AS (
    |  SELECT cid FROM c2, q42
    |  ORDER BY list_dot_product(c2.c, q42.qe) DESC, cid ASC LIMIT 3
    |), incell42 AS (
    |  SELECT vec_id, cid FROM a3 WHERE cid IN (SELECT cid FROM probes42)
    |), cc42 AS (
    |  SELECT ic.vec_id, list_dot_product(c2.c, q42.qe) AS cd
    |  FROM incell42 ic JOIN c2 USING (cid), q42
    |), d0 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q42.q0) AS d
    |  FROM a3_0 a JOIN c2_0 c USING (cid), q42
    |), d1 AS (
    |  SELECT a.vec_id, list_dot_product(c.c, q42.q1) AS d
    |  FROM a3_1 a JOIN c2_1 c USING (cid), q42
    |), adc42 AS (
    |  SELECT i.vec_id, ROUND(cc.cd + d0.d + d1.d, 6) AS adc
    |  FROM incell42 i JOIN cc42 cc USING (vec_id)
    |       JOIN d0 USING (vec_id) JOIN d1 USING (vec_id)
    |), cand42 AS (
    |  SELECT vec_id FROM adc42 ORDER BY adc DESC, vec_id ASC LIMIT 50
    |)
    |SELECT v.vec_id, ROUND(list_cosine_similarity(v.e, q42.qe), 6) AS cosine
    |FROM v JOIN cand42 USING (vec_id), q42
    |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin

  /** p20 oracle: [[ivfAssignSql]] + the greedy within-cell drop rule —
    * a vector is dropped iff some smaller-id vector in the SAME cell has
    * cosine ≥ threshold with it (Similarity.semanticDedup semantics). */
  private def semanticDedupOracleSql(threshold: String, k: Int): String =
    ivfAssignSql(k) +
      s""", dups AS (
      |  SELECT DISTINCT b.vec_id AS d
      |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  WHERE ROUND(list_cosine_similarity(a.e, b.e), 6) >= $threshold
      |)
      |SELECT vec_id, CAST(cid AS INT) AS centroid FROM a3
      |WHERE vec_id NOT IN (SELECT d FROM dups)
      |ORDER BY vec_id""".stripMargin

  /** DuckDB replay of the FNV-simhash near-dup pipeline (p03): FNV-1a
    * via list_reduce in HUGEINT arithmetic, bit votes, fingerprint — then
    * ALL-PAIRS Hamming ≤ radius over the fingerprints. The oracle does
    * NOT replay the banding: at maxHamming=3 the band layout guarantees
    * total candidate recall (Dedup.simhashBandLayout pigeonhole), so the
    * banded Spark plan must equal the exact all-pairs answer — a match
    * proves semantic completeness, not just implementation equivalence. */
  private val simhashOracleSql: String =
    """WITH t AS (
    |  SELECT doc_id,
    |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
    |                            x -> x <> '')) AS tok
    |  FROM read_parquet('{SFDIR}/documents.parquet')
    |), h AS (
    |  SELECT doc_id,
    |         list_reduce(
    |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
    |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
    |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
    |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
    |         ) AS uh
    |  FROM t
    |), sh AS (
    |  SELECT doc_id,
    |         CAST(CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
    |                   THEN uh - CAST('18446744073709551616' AS HUGEINT) ELSE uh END AS BIGINT) AS s
    |  FROM h
    |), votes AS (
    |  SELECT doc_id, b.b AS b,
    |         SUM(CASE WHEN ((s >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
    |  FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
    |  GROUP BY doc_id, b.b
    |), fp AS (
    |  SELECT doc_id,
    |         SUM(CASE WHEN cnt > 0 THEN CAST(1 AS HUGEINT) << CAST(b AS INT) ELSE CAST(0 AS HUGEINT) END) AS ufp
    |  FROM votes GROUP BY doc_id
    |), fps AS (
    |  SELECT doc_id, ufp,
    |         CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
    |                   THEN ufp - CAST('18446744073709551616' AS HUGEINT) ELSE ufp END AS BIGINT) AS sfp
    |  FROM fp
    |)
    |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
    |       CAST(bit_count(xor(a.sfp, b.sfp)) AS INTEGER) AS hamming
    |FROM fps a JOIN fps b ON a.doc_id < b.doc_id
    |WHERE bit_count(xor(a.sfp, b.sfp)) <= 3
    |ORDER BY doc_a, doc_b""".stripMargin

  /** The p77 oracle's fixed-point DCT basis, inlined as a DuckDB
    * list-of-lists literal from [[Multimodal.dctTable]] — one source of
    * truth for the basis integers on both sides. */
  private def dctTableSql: String =
    graft.pipeline.Multimodal.dctTable
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** p78: the fixed-point DFT basis tables as DuckDB literals. */
  private def dftCosSql: String =
    graft.pipeline.Multimodal.dftCosTable
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
  private def dftSinSql: String =
    graft.pipeline.Multimodal.dftSinTable
      .map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** p48 parameters: 40 merges is a nontrivial trajectory (the oracle
    * unrolls one CTE block per merge), maxWords comfortably above the
    * sf0.01/sf0.1 vocabularies so the dictionary truncation is
    * exercised as a no-op on both sides.
    */
  private val bpeMerges = 40
  private val bpeMaxWords = 20000

  /** DuckDB oracle CTE chain replaying the FULL BPE merge trajectory:
    * st0 = the (count desc, word asc)-truncated word dictionary with
    * space-joined character symbols, then per merge i an unrolled
    * (pr_i: weighted adjacent-pair counts → b_i: the (count desc, pair
    * asc) winner → st_i: fold-apply) block. The apply is a list_reduce
    * string fold — append WITHOUT a separator when the accumulator's
    * last piece is the merge's left symbol — which equals the greedy
    * left-to-right scan because a fused piece `a||b` can only equal the
    * left symbol `a` if `b` were empty, and symbols are never empty
    * (see Bpe.applyMerge).
    *
    * Every chain CTE is MATERIALIZED: DuckDB inlines CTEs by default,
    * and with two consumers per level (pr_i and st_i both read
    * st_{i-1}) the inlined tree doubles per merge — 2^numMerges scans
    * of the parquet file ("Too many open files" long before any
    * result). Materialization makes the replay linear in numMerges.
    */
  /** RE2 spelling of [[graft.pipeline.Dedup.SegScripts]] — the
    * non-space-delimited scripts segmented per codepoint. */
  private val segRe2 = "\\p{Han}\\p{Hiragana}\\p{Katakana}\\p{Thai}\\p{Lao}" +
    "\\p{Khmer}\\p{Myanmar}\\p{Tibetan}"

  /** DuckDB mirror of [[graft.pipeline.Dedup.segmentScripts]]. */
  private def segSql(textExpr: String): String =
    s"regexp_replace($textExpr, '([$segRe2])', ' \\1 ', 'g')"

  /** DuckDB mirror of [[graft.pipeline.Dedup.segTokensOf]] (the
    * script-aware canonical tokenizer): segment per codepoint, lower,
    * trim, strip everything outside [a-z0-9, kept scripts], whitespace
    * split, drop "" — byte-identical to the Spark expression on both
    * Latin and CJK/Thai text (verified on both engines). */
  private def segToksSql(textExpr: String): String =
    s"list_filter(string_split_regex(regexp_replace(lower(trim(${segSql(textExpr)})), " +
      s"'[^a-z0-9\\s$segRe2]', '', 'g'), '\\s+'), x -> x <> '')"

  private def bpeCtes(numMerges: Int, maxWords: Int): String = {
    val base =
      s"""WITH t AS (
         |  SELECT doc_id,
         |         ${segToksSql("text")} AS toks
         |  FROM read_parquet('{SFDIR}/documents.parquet')
         |), tok AS MATERIALIZED (
         |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
         |  FROM t WHERE len(toks) > 0
         |), st0 AS MATERIALIZED (
         |  SELECT word, cnt, array_to_string(string_split(word, ''), ' ') AS s
         |  FROM (SELECT tok AS word, COUNT(*) AS cnt FROM tok GROUP BY tok
         |        ORDER BY cnt DESC, word ASC LIMIT $maxWords)
         |)""".stripMargin
    val steps = (1 to numMerges).map { i =>
      val p = i - 1
      s""", pr$i AS (
         |  SELECT pp.a AS a, pp.b AS b, SUM(cnt) AS c FROM (
         |    SELECT cnt, unnest(list_transform(range(1, len(string_split(s, ' '))),
         |      j -> {'a': string_split(s, ' ')[j], 'b': string_split(s, ' ')[j + 1]})) AS pp
         |    FROM st$p) GROUP BY pp.a, pp.b
         |), b$i AS (
         |  SELECT a, b FROM pr$i ORDER BY c DESC, a ASC, b ASC LIMIT 1
         |), st$i AS MATERIALIZED (
         |  SELECT word, cnt,
         |         list_reduce(string_split(s, ' '),
         |           (acc, x) -> CASE WHEN (acc = b$i.a OR ends_with(acc, ' ' || b$i.a)) AND x = b$i.b
         |                            THEN acc || x ELSE acc || ' ' || x END) AS s
         |  FROM st$p, b$i
         |)""".stripMargin
    }.mkString
    base + steps
  }

  private val tcEpochs = 3
  private val tcBuckets = 256

  /** DuckDB oracle CTE chain replaying TextClassifier.train's FULL
    * fixed-point gradient-descent trajectory (scale 1e9, lr 1/2, labels
    * y = [lang='en']): f = per-doc hashed-unigram counts with the same
    * HUGEINT FNV-1a as the simhash oracle (bucket = hash mod 2^k, which
    * matches Spark's signed pmod exactly because 2^k divides 2^64),
    * then per epoch an unrolled (m_i: margin sum → s_i: rounded sigmoid
    * → fd_i: floor-div residual factor → g_i: exact gradient sum → w_i:
    * floor-div update) block. All integer arithmetic except the sigmoid,
    * which both sides round to the 1e9 grid before it can compound —
    * the ivfTrain/BPE trajectory-replay pattern. Floor divisions are
    * spelled pmod-style ((x % d) + d) % d so C-style `%` sign semantics
    * cancel out; both numerators are exactly divisible by construction.
    * Weight CTEs are MATERIALIZED: m_i and w_i both read w_{i-1}, so
    * the default inlining would double the tree per epoch (see bpeCtes).
    */
  /** @param labelSql    SQL expression over `t`'s columns producing the
    *                     0/1 training label (default: the p53/p56
    *                     lang='en' proxy; p121 derives it from the
    *                     deterministic LLM teacher's reply rule)
    * @param trainFilter SQL predicate over `t` restricting the TRAINING
    *                     set (p121 labels only the annotation-budget
    *                     sample; scoring CTEs over the full corpus are
    *                     the caller's suffix)
    */
  private def classifierCtes(epochs: Int, buckets: Int,
      labelSql: String = "CASE WHEN lang = 'en' THEN 1 ELSE 0 END",
      trainFilter: String = "TRUE"): String = {
    val base =
      s"""WITH t AS (
         |  SELECT doc_id, lang, text,
         |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
         |                     x -> x <> '') AS tk
         |  FROM read_parquet('{SFDIR}/documents.parquet')
         |), lab AS MATERIALIZED (
         |  SELECT doc_id, $labelSql AS y,
         |         CAST(len(tk) AS BIGINT) AS n
         |  FROM t WHERE len(tk) > 0 AND ($trainFilter)
         |), tok AS (
         |  SELECT doc_id, unnest(tk) AS tok FROM t WHERE ($trainFilter)
         |), hb AS (
         |  SELECT doc_id,
         |         CAST(list_reduce(
         |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
         |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
         |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
         |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
         |         ) % $buckets AS INT) AS bucket
         |  FROM tok
         |), f AS MATERIALIZED (
         |  SELECT doc_id, bucket, CAST(count(*) AS HUGEINT) AS c
         |  FROM hb GROUP BY doc_id, bucket
         |), nn AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS nd FROM lab
         |), w0 AS MATERIALIZED (
         |  SELECT CAST(unnest(range(0, $buckets)) AS INT) AS b, CAST(0 AS HUGEINT) AS w
         |)""".stripMargin
    val steps = (1 to epochs).map { i =>
      val p = i - 1
      s""", m$i AS (
         |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
         |  FROM f JOIN w$p w ON f.bucket = w.b GROUP BY f.doc_id
         |), s$i AS (
         |  SELECT l.doc_id, l.y, l.n,
         |         CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS HUGEINT) AS s9
         |  FROM m$i m JOIN lab l USING (doc_id)
         |), fd$i AS (
         |  SELECT doc_id, (r - ((r % n) + n) % n) // n AS fd FROM (
         |    SELECT doc_id, s9 - CAST(y AS HUGEINT) * 1000000000 AS r,
         |           CAST(n AS HUGEINT) AS n FROM s$i)
         |), g$i AS (
         |  SELECT f.bucket, SUM(fd.fd * f.c) AS g
         |  FROM f JOIN fd$i fd USING (doc_id) GROUP BY f.bucket
         |), w$i AS MATERIALIZED (
         |  SELECT b, w - (gg - ((gg % d) + d) % d) // d AS w FROM (
         |    SELECT w.b, w.w, COALESCE(g.g, CAST(0 AS HUGEINT)) AS gg,
         |           2 * nn.nd AS d
         |    FROM w$p w LEFT JOIN g$i g ON g.bucket = w.b CROSS JOIN nn)
         |)""".stripMargin
    }.mkString
    base + steps
  }

  /** Shared fixture for the trained-langid loop (p122): language order
    * (= argmax tie-break order) and 12-word language-flavored
    * vocabularies. The fixture TEXT is a pure function of
    * (doc_id, lang) — word j of doc i is vocab[lang][(i + 7j) mod 12]
    * — so the oracle rebuilds every document from the table alone.
    */
  private val liLangs = Seq("de", "en", "es", "fr", "zh")
  private val liVocab: Seq[Seq[String]] = Seq(
    Seq("der", "und", "sch", "ein", "nicht", "mit", "das", "auf", "für",
      "ist", "werden", "zeit"),
    Seq("the", "and", "with", "that", "have", "this", "from", "they",
      "which", "their", "about", "would"),
    Seq("que", "los", "una", "por", "con", "para", "ciudad", "hacer",
      "tiempo", "siempre", "más", "años"),
    Seq("les", "des", "une", "est", "dans", "pour", "qui", "avec",
      "plus", "être", "faire", "jamais"),
    Seq("的是", "不了", "在人", "有我", "他这", "中大", "来上", "国个",
      "到说", "们为", "子和", "你地"))

  /** DuckDB replay of the FULL trained-langid loop: fixture text
    * reconstruction, char-3-gram explode, FNV bucket hashing, one
    * p53-style fixed-point GD trajectory PER LANGUAGE (one-vs-rest,
    * shared zero-init w0), per-language eval margins, and the
    * >=-chained argmax CASE that spells the same (margin, earliest
    * lang) total order as the Spark side's struct array_max.
    */
  private def langIdCtes(epochs: Int, buckets: Int): String = {
    def fnvBucket(in: String): String =
      s"""CAST(list_reduce(
         |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
         |                        list_transform(regexp_extract_all(hex(encode($in)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
         |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
         |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
         |         ) % $buckets AS INT)""".stripMargin
    val vocabCols = liLangs.zip(liVocab).map { case (l, ws) =>
      ws.map(w => s"'$w'").mkString(s"[", ",", s"] AS v_$l")
    }.mkString(", ")
    val vocabCase = "CASE lang " +
      liLangs.dropRight(1).map(l => s"WHEN '$l' THEN v_$l ").mkString +
      s"ELSE v_${liLangs.last} END"
    val base =
      s"""WITH v AS (SELECT $vocabCols
         |), fx AS MATERIALIZED (
         |  SELECT doc_id, lang,
         |         array_to_string(list_transform(range(0, 20), j ->
         |           ($vocabCase)[CAST((doc_id + j * 7) % 12 AS INT) + 1]), ' ') AS text
         |  FROM read_parquet('{SFDIR}/documents.parquet') CROSS JOIN v
         |), f AS MATERIALIZED (
         |  SELECT doc_id, bucket, CAST(count(*) AS HUGEINT) AS c FROM (
         |    SELECT doc_id, ${fnvBucket("substr(text, CAST(p AS INT), 3)")} AS bucket
         |    FROM (SELECT doc_id, text, unnest(range(1, len(text) - 1)) AS p
         |          FROM fx WHERE doc_id % 2 = 0))
         |  GROUP BY doc_id, bucket
         |), lab AS MATERIALIZED (
         |  SELECT f0.doc_id, fx.lang, CAST(SUM(f0.c) AS HUGEINT) AS n
         |  FROM f f0 JOIN fx USING (doc_id) GROUP BY f0.doc_id, fx.lang
         |), nn AS (
         |  SELECT CAST(count(*) AS HUGEINT) AS nd FROM lab
         |), w0 AS MATERIALIZED (
         |  SELECT CAST(unnest(range(0, $buckets)) AS INT) AS b, CAST(0 AS HUGEINT) AS w
         |)""".stripMargin
    val trains = liLangs.map { l =>
      (1 to epochs).map { i =>
        val prev = if (i == 1) "w0" else s"w_${l}_${i - 1}"
        s""", m_${l}_$i AS (
           |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
           |  FROM f JOIN $prev w ON f.bucket = w.b GROUP BY f.doc_id
           |), s_${l}_$i AS (
           |  SELECT l.doc_id, CASE WHEN l.lang = '$l' THEN 1 ELSE 0 END AS y, l.n,
           |         CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS HUGEINT) AS s9
           |  FROM m_${l}_$i m JOIN lab l USING (doc_id)
           |), fd_${l}_$i AS (
           |  SELECT doc_id, (r - ((r % n) + n) % n) // n AS fd FROM (
           |    SELECT doc_id, s9 - CAST(y AS HUGEINT) * 1000000000 AS r,
           |           CAST(n AS HUGEINT) AS n FROM s_${l}_$i)
           |), g_${l}_$i AS (
           |  SELECT f.bucket, SUM(fd.fd * f.c) AS g
           |  FROM f JOIN fd_${l}_$i fd USING (doc_id) GROUP BY f.bucket
           |), w_${l}_$i AS MATERIALIZED (
           |  SELECT b, w - (gg - ((gg % d) + d) % d) // d AS w FROM (
           |    SELECT w.b, w.w, COALESCE(g.g, CAST(0 AS HUGEINT)) AS gg,
           |           2 * nn.nd AS d
           |    FROM $prev w LEFT JOIN g_${l}_$i g ON g.bucket = w.b CROSS JOIN nn)
           |)""".stripMargin
      }.mkString
    }.mkString
    val evalMargins =
      s""", ef AS MATERIALIZED (
         |  SELECT doc_id, bucket, CAST(count(*) AS HUGEINT) AS c FROM (
         |    SELECT doc_id, ${fnvBucket("substr(text, CAST(p AS INT), 3)")} AS bucket
         |    FROM (SELECT doc_id, text, unnest(range(1, len(text) - 1)) AS p
         |          FROM fx WHERE doc_id % 2 = 1))
         |  GROUP BY doc_id, bucket
         |)""".stripMargin +
        liLangs.map { l =>
          s""", mm_$l AS (
             |  SELECT ef.doc_id, SUM(ef.c * w.w) AS m
             |  FROM ef JOIN w_${l}_$epochs w ON ef.bucket = w.b GROUP BY ef.doc_id
             |)""".stripMargin
        }.mkString
    // >=-chain: lang k wins iff its margin >= every later lang's, and
    // no earlier lang won — exactly (max margin, earliest index)
    val predCase = "CASE " + liLangs.indices.dropRight(1).map { k =>
      val conds = (k + 1 until liLangs.length)
        .map(j => s"mm_${liLangs(k)}.m >= mm_${liLangs(j)}.m").mkString(" AND ")
      s"WHEN $conds THEN '${liLangs(k)}' "
    }.mkString + s"ELSE '${liLangs.last}' END"
    val joins = liLangs.map(l => s"JOIN mm_$l USING (doc_id)").mkString(" ")
    base + trains + evalMargins +
      s""", pr AS (
         |  SELECT fx.lang, $predCase AS lang_pred
         |  FROM fx $joins
         |), cm AS (
         |  SELECT lang, lang_pred, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM pr GROUP BY lang, lang_pred
         |)
         |SELECT lang, lang_pred, n_docs,
         |       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang), 6) AS share
         |FROM cm ORDER BY lang, lang_pred""".stripMargin
  }

  def defs: Seq[QueryDef] = Seq(

    // Exact dedup: first-id-wins per duplicate group (deterministic, unlike
    // dropDuplicates)
    QueryDef("p01_dedup_exact",
      (s, dir) => Dedup.exact(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "source", "n_chars"),
        keyCols = Seq("lang", "source"), idCol = "doc_id")
        .orderBy("lang", "source"),
      Some("""SELECT lang, source, MIN(doc_id) AS doc_id,
              ARG_MIN(n_chars, doc_id) AS n_chars
              FROM read_parquet('{SFDIR}/documents.parquet')
              GROUP BY lang, source ORDER BY lang, source""")),

    // MinHash-LSH near-dup pairs, Jaccard-verified (banded bucket join —
    // no crossJoin in the plan). Oracle: the all-pairs exact-Jaccard set —
    // LSH is only a candidate pruner here; the Jaccard-verify step means
    // the output must equal the exact answer whenever candidate recall is
    // total, which it is on this corpus (near-dup pairs sit far above the
    // threshold, where banded-LSH hit probability ≈ 1). The oracle is
    // all-pairs only on the DuckDB side; the Spark plan stays bucketed.
    QueryDef("p02_dedup_minhash",
      (s, dir) => Dedup.minhashNearDups(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
        .orderBy("doc_a", "doc_b"),
      Some(jaccardAllPairsSql(k = 3, threshold = "0.12"))),

    // SimHash near-dup pairs (radius-derived band buckets + Hamming
    // verify), hashed with the native codegen'd FNV-1a expression
    // (graft.functions.Fnv1a64) so the oracle can replay the fingerprint
    // pipeline — per-token hash (list_reduce FNV in HUGEINT arithmetic),
    // bit votes, fingerprint assembly. The radius (3) is within the band
    // layout's completeness guarantee, so the oracle checks the banded
    // plan against the exact ALL-PAIRS Hamming answer. (Hash-cost note,
    // measured sf0.1: fnv1a64 ≈ xxhash64 wall time — the pluggable hash
    // is a parity feature, not a perf trade.)
    QueryDef("p03_dedup_simhash",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        Dedup.simhashNearDups(
          Tables.load(s, dir, "documents"), "doc_id", "text", maxHamming = 3,
          hashFn = graft.functions.GraftFunctions.fnv1a64)
          .orderBy("doc_a", "doc_b")
      },
      Some(simhashOracleSql)),

    // n-gram Jaccard similarity on LSH candidates — the verification
    // surface alone, reported for all candidate pairs
    QueryDef("p04_ngram_jaccard",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        // one shared persisted (doc, shingle) frame for both the
        // candidate pass and the verification sets, and a persisted set
        // frame so the two verify-join sides share one collect_set
        // aggregate (see minhashNearDups)
        val sh = graft.pipeline.OperatorCache.materialize(
          Dedup.shingleRows(docs, "doc_id", "text", 2))
        val cands = Dedup.minhashCandidatesFrom(sh, numHashes = 16, bands = 8)
        val sets = graft.pipeline.OperatorCache.materialize(Dedup.shingleSetsFrom(sh))
        cands
          .join(sets.withColumnRenamed("sid", "doc_a")
            .withColumnRenamed("sset", "set_a"), "doc_a")
          .join(sets.withColumnRenamed("sid", "doc_b")
            .withColumnRenamed("sset", "set_b"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard"))
          .where(col("jaccard") >= 0.2)
          .orderBy("doc_a", "doc_b")
      },
      // same oracle construction as p02 (all-pairs exact Jaccard; see note
      // there), with 2-gram shingles and the 0.2 floor
      Some(jaccardAllPairsSql(k = 2, threshold = "0.2"))),

    // Embedding-cosine near-dup via sign-LSH buckets. Oracle reproduces
    // the bucketing with the same inlined seed-42 hyperplanes (see
    // bucketSql) — same-bucket pairs, exact cosine ≥ threshold.
    QueryDef("p05_embedding_neardup",
      (s, dir) => Dedup.embeddingNearDups(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.30, planes = 4)
        .orderBy("doc_a", "doc_b"),
      Some(s"""WITH b AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')
             |), s AS (
             |  SELECT a.vec_id AS doc_a, b2.vec_id AS doc_b,
             |         ROUND(list_cosine_similarity(a.e, b2.e), 6) AS cosine
             |  FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
             |)
             |SELECT doc_a, doc_b, cosine FROM s
             |WHERE cosine >= 0.30 ORDER BY doc_a, doc_b""".stripMargin)),

    // Brute-force cosine top-k (the exact baseline; TakeOrdered plan).
    // Oracle: DuckDB list_cosine_similarity on the same query vector.
    QueryDef("p06_ann_bruteforce",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        Similarity.bruteForceTopK(emb, "vec_id", "embedding", q, k = 10)
      },
      Some("""SELECT vec_id,
              ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), (SELECT CAST(embedding AS DOUBLE[]) FROM read_parquet('{SFDIR}/embeddings.parquet') WHERE vec_id = 0)), 6) AS cosine
              FROM read_parquet('{SFDIR}/embeddings.parquet') ORDER BY cosine DESC, vec_id ASC LIMIT 10""")),

    // LSH-bucketed ANN for the same query (scale path: bucket pruning +
    // multi-probe). Oracle reproduces the probe set — the query's bucket
    // plus every Hamming-1 neighbor, i.e. bit_count(xor) <= 1 — with the
    // same inlined hyperplanes, then exact cosine top-k within it.
    QueryDef("p07_ann_lsh",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        Similarity.annTopK(emb, "vec_id", "embedding", q, k = 10, planes = 6)
      },
      Some(s"""WITH b AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         ${bucketSql("CAST(embedding AS DOUBLE[])", 6)} AS bucket
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')
             |), q AS (SELECT bucket AS qb, e AS qe FROM b WHERE vec_id = 0)
             |SELECT b.vec_id, ROUND(list_cosine_similarity(b.e, q.qe), 6) AS cosine
             |FROM b, q WHERE bit_count(xor(b.bucket, q.qb)) <= 1
             |ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // Batch k-NN join: every query row gets its top-k neighbors via
    // shared LSH buckets (equi-join on bucket, ranked per query). Oracle
    // reproduces the bucket equi-join with the same inlined hyperplanes.
    QueryDef("p08_ann_join",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.annJoin(
          emb.where(col("vec_id") < 20), emb.where(col("vec_id") >= 20),
          "vec_id", "vec_id", "embedding", k = 3, planes = 4)
          .orderBy("query_id", "rank")
      },
      Some(s"""WITH b AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         ${bucketSql("CAST(embedding AS DOUBLE[])", 4)} AS bucket
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')
             |), s AS (
             |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             |         ROUND(list_cosine_similarity(q.e, c.e), 6) AS cosine
             |  FROM b q JOIN b c ON q.bucket = c.bucket AND q.vec_id < 20 AND c.vec_id >= 20
             |), r AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
             |                               ORDER BY cosine DESC, neighbor_id ASC) AS rn
             |  FROM s
             |)
             |SELECT query_id, neighbor_id, cosine, CAST(rn AS INT) AS rank
             |FROM r WHERE rn <= 3 ORDER BY query_id, rank""".stripMargin)),

    // Text statistics with a DuckDB-expressible oracle subset
    QueryDef("p09_text_stats",
      (s, dir) => Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_calc"),
          TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_words"),
          round(length(col("text")).cast("double") /
            greatest(TextAnalysis.tokenCountWs(col("text")), lit(1)).cast("double"), 4)
            .as("mean_word_len"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
              LENGTH(text) AS n_chars_calc,
              LEN(string_split_regex(TRIM(text), '\s+')) AS n_words,
              ROUND(CAST(LENGTH(text) AS DOUBLE) / GREATEST(LEN(string_split_regex(TRIM(text), '\s+')), 1), 4) AS mean_word_len
              FROM read_parquet('{SFDIR}/documents.parquet') ORDER BY doc_id""")),

    // Full text-analysis surface: quality score, language ID, BPE-ish
    // token count — every column re-expressed in DuckDB SQL as the oracle.
    // The fingerprint column (xxhash64, not portable) is carried by
    // p15_clean_corpus's rows-only projection and ScalaTest instead.
    QueryDef("p10_text_analysis",
      (s, dir) => TextAnalysis.analyze(
        Tables.load(s, dir, "documents"), "text")
        .select("doc_id", "n_words", "tokens_bpe", "quality", "lang_pred")
        .orderBy("doc_id"),
      Some("""WITH f AS (
             |  SELECT doc_id, text,
             |         LENGTH(text) AS n_chars,
             |         string_split_regex(TRIM(text), '\s+') AS words
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), g AS (
             |  SELECT doc_id,
             |         CAST(LEN(words) AS BIGINT) AS n_words,
             |         CAST(LEN(regexp_extract_all(text, '[A-Za-z0-9]+|[^A-Za-z0-9\s]')) AS INT) AS tokens_bpe,
             |         LEAST(CAST(LEN(words) AS DOUBLE) / 20.0, 1.0) AS len_score,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[\.,;:!\?''"()\[\]{}-]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.5 END AS punct_ok,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1.0 ELSE 0.5 END AS digit_ok,
             |         CAST(LEN(list_distinct(words)) AS DOUBLE) / CAST(GREATEST(LEN(words), 1) AS DOUBLE) AS uniq_ratio,
             |         list_reverse_sort([
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|that|it|was)\b')) AS DOUBLE), 'lang': 'en'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|un|los|se|por)\b')) AS DOUBLE), 'lang': 'es'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von|mit|den|nicht|ein)\b')) AS DOUBLE), 'lang': 'de'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(le|la|les|et|des|est|une|dans|que|pour)\b')) AS DOUBLE), 'lang': 'fr'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '(的|是|了|在|和|有|我|他|这|不)')) AS DOUBLE), 'lang': 'zh'}
             |         ])[1] AS best
             |  FROM f
             |)
             |SELECT doc_id, n_words, tokens_bpe,
             |       ROUND(((len_score * punct_ok) * digit_ok) * 0.5 + uniq_ratio * 0.5, 4) AS quality,
             |       CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
             |FROM g
             |ORDER BY doc_id""".stripMargin)),

    // Multimodal plumbing: synthetic binary assets → batched decode stub →
    // resize plan, all deterministic. Oracle reproduces the portable
    // metadata arithmetic (Knuth multiplicative hash; payload is the
    // sha2-256 hex repeated ×4 → 128 bytes constant) and the resize math.
    QueryDef("p11_multimodal",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").where(col("doc_id") < 200)
        val assets = Multimodal.syntheticAssets(s, docs, "doc_id")
        val decoded = Multimodal.decode(s, assets, batchSize = 32).toDF()
        Multimodal.resizePlan(decoded, maxSide = 256)
          .select("asset_id", "modality", "n_bytes", "width", "height",
            "target_width", "target_height")
          .orderBy("asset_id")
      },
      Some("""WITH m AS (
             |  SELECT doc_id AS asset_id,
             |         (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS modality,
             |         CAST(128 AS BIGINT) AS n_bytes,
             |         CAST(((doc_id % 100000) + 0) * 2654435761 % 1920 + 32 AS INT) AS width,
             |         CAST(((doc_id % 100000) + 1) * 2654435761 % 1080 + 32 AS INT) AS height
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id < 200
             |)
             |SELECT asset_id, modality, n_bytes, width, height,
             |       CAST(CEIL(width * LEAST(1.0, 256.0 / GREATEST(width, height))) AS INT) AS target_width,
             |       CAST(CEIL(height * LEAST(1.0, 256.0 / GREATEST(width, height))) AS INT) AS target_height
             |FROM m ORDER BY asset_id""".stripMargin)),

    // IVF coarse-quantized ANN: train k centroids, probe the 3 best cells.
    // Oracle replays the ENTIRE training trajectory in SQL — the portable
    // Knuth-hash init, two Lloyd iterations (mean per centroid, re-assign
    // to argmax dot, ties to the higher centroid id), final assignment,
    // probe selection, and in-cell exact cosine top-k.
    QueryDef("p14_ann_ivf",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val index = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        Similarity.ivfTopK(emb, "vec_id", "embedding", index, q, k = 10, nprobe = 3)
      },
      Some(ivfOracleSql)),

    // Composed corpus cleaning: quality floor + language allowlist +
    // near-dup removal in one pipeline. Oracle: the p10 quality/langid SQL
    // as the filter, then the recursive-CTE connected-components dedup
    // (see ccDedupTail). The xxhash64 fingerprint column is exercised by
    // ScalaTest instead (not DuckDB-portable).
    QueryDef("p15_clean_corpus",
      (s, dir) => TextAnalysis.cleanCorpus(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        minQuality = 0.2, languages = Set("en", "und"), dedupThreshold = 0.5)
        .select("doc_id", "lang", "quality", "lang_pred")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE f AS (
             |  SELECT doc_id, lang, text,
             |         LENGTH(text) AS n_chars,
             |         string_split_regex(TRIM(text), '\\s+') AS words
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), g AS (
             |  SELECT doc_id, lang, text,
             |         LEAST(CAST(LEN(words) AS DOUBLE) / 20.0, 1.0) AS len_score,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[\\.,;:!\\?''"()\\[\\]{}-]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.5 END AS punct_ok,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1.0 ELSE 0.5 END AS digit_ok,
             |         CAST(LEN(list_distinct(words)) AS DOUBLE) / CAST(GREATEST(LEN(words), 1) AS DOUBLE) AS uniq_ratio,
             |         list_reverse_sort([
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\\b(the|and|of|to|a|in|is|that|it|was)\\b')) AS DOUBLE), 'lang': 'en'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\\b(el|la|de|que|y|en|un|los|se|por)\\b')) AS DOUBLE), 'lang': 'es'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\\b(der|die|und|das|ist|von|mit|den|nicht|ein)\\b')) AS DOUBLE), 'lang': 'de'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\\b(le|la|les|et|des|est|une|dans|que|pour)\\b')) AS DOUBLE), 'lang': 'fr'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '(的|是|了|在|和|有|我|他|这|不)')) AS DOUBLE), 'lang': 'zh'}
             |         ])[1] AS best
             |  FROM f
             |), scored AS (
             |  SELECT doc_id, lang, text,
             |         ROUND(((len_score * punct_ok) * digit_ok) * 0.5 + uniq_ratio * 0.5, 4) AS quality,
             |         CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
             |  FROM g
             |), corpus AS (
             |  SELECT * FROM scored WHERE quality >= 0.2 AND lang_pred IN ('en', 'und')
             |), ${ccDedupTail("0.5")}
             |SELECT c.doc_id, c.lang, c.quality, c.lang_pred
             |FROM corpus c
             |ANTI JOIN drops ON c.doc_id = drops.doc
             |ORDER BY doc_id""".stripMargin)),

    // End-to-end near-dup dedup: LSH pairs → connected components → keep
    // the min-id representative per cluster. Oracle: all-pairs Jaccard
    // edges + recursive-CTE min-label components (candidate recall is
    // total on this corpus — see the p02 note; the verify step makes the
    // edge set exact, so components match exactly).
    QueryDef("p13_neardup_dedup",
      (s, dir) => Dedup.dedupNearDuplicates(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, lang, source, text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), ${ccDedupTail("0.12")}
             |SELECT c.doc_id, c.lang, c.source
             |FROM corpus c
             |ANTI JOIN drops ON c.doc_id = drops.doc
             |ORDER BY doc_id""".stripMargin)),

    // Incremental near-dup detection: the corpus half is indexed ONCE
    // (bandIndex — the layout you persist at scale), the batch half
    // probes it, and candidates are Jaccard-verified. Oracle: exact
    // cross-set all-pairs Jaccard (candidate recall is total on this
    // corpus, same argument as p02 — the verify step makes the output
    // exact whenever recall is).
    QueryDef("p19_dedup_incremental",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(col("doc_id") < 400)
        val batch = docs.where(col("doc_id") >= 400)
        val index = Dedup.bandIndex(corpus, "doc_id", "text",
          shingleK = 3, numHashes = 32, bands = 16)
        val cands = Dedup.incrementalCandidates(index, batch, "doc_id", "text",
          shingleK = 3, numHashes = 32, bands = 16)
        val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
        cands
          .join(sets.withColumnRenamed("sid", "doc_a")
            .withColumnRenamed("sset", "set_a"), "doc_a")
          .join(sets.withColumnRenamed("sid", "doc_b")
            .withColumnRenamed("sset", "set_b"), "doc_b")
          .select(col("doc_a"), col("doc_b"),
            round(Dedup.jaccard(col("set_a"), col("set_b")), 6).as("jaccard"))
          .where(col("jaccard") >= 0.12)
          .orderBy("doc_a", "doc_b")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), sets AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM toks WHERE len(toks) >= 3
             |), j AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
             |  FROM sets a JOIN sets b ON a.doc_id < 400 AND b.doc_id >= 400
             |)
             |SELECT doc_a, doc_b, jaccard FROM j
             |WHERE jaccard >= 0.12 ORDER BY doc_a, doc_b""".stripMargin)),

    // Streaming windowed aggregation, batch-executed (same code path the
    // stream runs; oracle via date_trunc)
    QueryDef("p12_stream_window",
      (s, dir) => EventStreams.windowedStats(
        Tables.load(s, dir, "events"), windowLen = "1 hour")
        .select(QueryDef.ntz(col("window_start")).as("window_start"),
          col("event_type"), col("n_events"),
          round(col("sum_value"), 4).as("sum_value"))
        .orderBy("window_start", "event_type"),
      Some("""SELECT date_trunc('hour', ts) AS window_start, event_type,
              COUNT(*) AS n_events,
              ROUND(SUM(value), 4) AS sum_value
              FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""")),

    // SemDeDup-style semantic dedup: IVF clustering (same Lloyd replay
    // as p14, k=16 — the cell-size knob that bounds within-cell pair
    // counts), then greedy within-cell drop of any vector with a
    // smaller-id neighbor at cosine ≥ 0.30. Oracle replays training +
    // assignment + the drop rule exactly.
    QueryDef("p20_semantic_dedup",
      (s, dir) => Similarity.semanticDedup(
        Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.30, k = 16, iters = 2)
        .select("vec_id", "centroid")
        .orderBy("vec_id"),
      Some(semanticDedupOracleSql("0.30", k = 16))),

    // Decontamination: corpus docs sharing ≥3 distinct 8-gram shingles
    // with the held-out blocklist (doc_id % 20 == 0 plays the benchmark)
    // are removed. Oracle replays the shingle construction and the
    // distinct-overlap count.
    QueryDef("p21_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
        val block = docs.where(pmod(col("doc_id"), lit(20)) === 0)
        Dedup.decontaminate(corpus, "doc_id", "text", block, "doc_id", "text",
          shingleK = 8, minOverlap = 3)
          .select("doc_id", "lang", "source")
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, source, text
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 <> 0
             |), block AS (
             |  SELECT text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 = 0
             |), btoks AS (
             |  SELECT list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM block
             |), bsh AS (
             |  SELECT DISTINCT shingle FROM (
             |    SELECT unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                 i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |    FROM btoks WHERE len(toks) >= 8
             |  )
             |), ctoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus
             |), csh AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |  FROM ctoks WHERE len(toks) >= 8
             |), contaminated AS (
             |  SELECT doc_id FROM csh JOIN bsh USING (shingle)
             |  GROUP BY doc_id HAVING COUNT(DISTINCT shingle) >= 3
             |)
             |SELECT c.doc_id, c.lang, c.source FROM corpus c
             |ANTI JOIN contaminated ON c.doc_id = contaminated.doc_id
             |ORDER BY doc_id""".stripMargin)),

    // TF-IDF top terms per doc. Weight rounds to 6 decimals BEFORE the
    // per-doc rank on BOTH sides, so ulp-level libm log differences
    // cannot flip ranks between engines.
    QueryDef("p22_tfidf",
      (s, dir) => TextAnalysis.tfidfTopTerms(
        Tables.load(s, dir, "documents"), "doc_id", "text", topN = 3)
        .orderBy("doc", "rank"),
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM terms GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM terms GROUP BY term
             |), n AS (
             |  SELECT COUNT(*) AS n_docs FROM read_parquet('{SFDIR}/documents.parquet')
             |), w AS (
             |  SELECT doc, term, tf, df,
             |         ROUND(CAST(tf AS DOUBLE) * LN(CAST(n_docs + 1 AS DOUBLE) / CAST(df + 1 AS DOUBLE)), 6) AS weight
             |  FROM tf JOIN dfreq USING (term), n
             |), r AS (
             |  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc ORDER BY weight DESC, term ASC) AS rn
             |  FROM w
             |)
             |SELECT doc, term, tf, df, weight, CAST(rn AS INT) AS rank
             |FROM r WHERE rn <= 3 ORDER BY doc, rank""".stripMargin)),

    // BM25 scoring of the corpus against a fixed query bag (k1=1.2,
    // b=0.75). Output keyed by doc only (no cross-engine score-order
    // dependency); avgdl is exact cross-engine because doc lengths are
    // integers (their double sum is exact below 2^53).
    QueryDef("p23_bm25",
      (s, dir) => TextAnalysis.bm25(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        queryTerms = Seq("join", "vector", "filter"))
        .orderBy("doc"),
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), q AS (
             |  SELECT doc, term FROM terms WHERE term IN ('join', 'vector', 'filter')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc = dl.doc, stats
             |)
             |SELECT doc, ROUND(SUM(c), 6) AS score, COUNT(*) AS n_matched
             |FROM contrib GROUP BY doc ORDER BY doc""".stripMargin)),

    // Token-level repetition statistics (the Gopher-style repetition
    // filter inputs): most-frequent-word and most-frequent-bigram
    // fractions per doc. Oracle replays tokenization, the bigram window,
    // and both max/total aggregates.
    QueryDef("p24_repetition",
      (s, dir) => TextAnalysis.repetitionStats(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH tl AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), wc AS (
             |  SELECT doc_id, tok, COUNT(*) AS c
             |  FROM (SELECT doc_id, unnest(toks) AS tok FROM tl) GROUP BY doc_id, tok
             |), ws AS (
             |  SELECT doc_id, SUM(c) AS n_words, MAX(c) AS top_word FROM wc GROUP BY doc_id
             |), bc AS (
             |  SELECT doc_id, bigram, COUNT(*) AS c
             |  FROM (SELECT doc_id,
             |               unnest(list_transform(range(1, len(toks)),
             |                                     i -> toks[i] || ' ' || toks[i + 1])) AS bigram
             |        FROM tl WHERE len(toks) >= 2)
             |  GROUP BY doc_id, bigram
             |), bs AS (
             |  SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bigram FROM bc GROUP BY doc_id
             |)
             |SELECT ws.doc_id AS doc, CAST(ws.n_words AS BIGINT) AS n_words,
             |       ROUND(CAST(top_word AS DOUBLE) / n_words, 6) AS top_word_fraction,
             |       COALESCE(ROUND(CAST(top_bigram AS DOUBLE) / n_bigrams, 6), 0.0) AS top_bigram_fraction
             |FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
             |ORDER BY doc""".stripMargin)),

    // PII scrubbing: deterministic synthetic PII (derived from doc_id,
    // constructed identically on both sides since the corpus has none)
    // redacted by the shared backreference-free patterns; per-kind
    // counts audited. Oracle replays the injection, the ordered
    // replace chain, and the counts in RE2.
    QueryDef("p25_pii_scrub",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val withPii = docs.select(col("doc_id"),
          concat(col("text"),
            when(pmod(col("doc_id"), lit(3)) === 0,
              concat(lit(" contact user"), col("doc_id"), lit("@example.com")))
              .when(pmod(col("doc_id"), lit(3)) === 1,
                concat(lit(" call 555-010-0100 or ping 10.0."),
                  pmod(col("doc_id"), lit(256)), lit(".7")))
              .otherwise(lit(""))).as("text"))
        val countCols = TextAnalysis.piiCounts(col("text"))
          .map { case (name, c) => c.as(name) }
        withPii.select(
          (col("doc_id") +: TextAnalysis.scrubPii(col("text")).as("scrubbed") +: countCols): _*)
          .orderBy("doc_id")
      },
      Some("""WITH base AS (
             |  SELECT doc_id,
             |         text || CASE WHEN doc_id % 3 = 0 THEN ' contact user' || doc_id || '@example.com'
             |                      WHEN doc_id % 3 = 1 THEN ' call 555-010-0100 or ping 10.0.' || (doc_id % 256) || '.7'
             |                      ELSE '' END AS text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), s1 AS (
             |  SELECT doc_id,
             |         regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1,
             |         len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_email
             |  FROM base
             |), s2 AS (
             |  SELECT doc_id,
             |         regexp_replace(t1, '\+?[0-9][0-9()\- ]{7,14}[0-9]', '<PHONE>', 'g') AS t2,
             |         n_email,
             |         len(regexp_extract_all(t1, '\+?[0-9][0-9()\- ]{7,14}[0-9]')) AS n_phone
             |  FROM s1
             |)
             |SELECT doc_id,
             |       regexp_replace(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g') AS scrubbed,
             |       n_email, n_phone,
             |       len(regexp_extract_all(t2, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS n_ip
             |FROM s2 ORDER BY doc_id""".stripMargin)),

    // Cross-document duplicate-span fraction: per doc, the fraction of
    // its 8-token windows shared with at least one other doc. Oracle
    // replays the window construction and both aggregates.
    QueryDef("p26_dup_spans",
      (s, dir) => Dedup.duplicateSpanFraction(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc"),
      Some("""WITH tl AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), spans AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS span
             |  FROM tl WHERE len(toks) >= 8
             |), dps AS (
             |  SELECT span, COUNT(DISTINCT doc_id) AS docs FROM spans GROUP BY span
             |)
             |SELECT s.doc_id AS doc, COUNT(*) AS n_spans,
             |       ROUND(SUM(CASE WHEN d.docs > 1 THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE), 6) AS dup_span_fraction
             |FROM spans s JOIN dps d ON s.span = d.span
             |GROUP BY s.doc_id ORDER BY doc""".stripMargin)),

    // SQ8 two-stage ANN: int8-quantized cosine over the 4×-compressed
    // index prunes to k×5 candidates, exact cosine rescoring picks the
    // top k. Oracle replays the per-vector quantization (HALF_UP to
    // steps of max|x|/127), both rankings, and both tie-breaks.
    QueryDef("p27_ann_sq8",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        Similarity.sq8TopK(emb, "vec_id", "embedding", q, k = 10)
      },
      Some("""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')
             |), q AS (
             |  SELECT e AS qe FROM v WHERE vec_id = 0
             |), qq AS (
             |  SELECT list_transform(qe, x ->
             |           CAST(round(x / (GREATEST(list_max(list_transform(qe, y -> abs(y))), 1e-30) / 127.0)) AS DOUBLE)) AS qv
             |  FROM q
             |), quant AS (
             |  SELECT vec_id, e,
             |         list_transform(e, x ->
             |           CAST(round(x / (GREATEST(list_max(list_transform(e, y -> abs(y))), 1e-30) / 127.0)) AS DOUBLE)) AS qvec
             |  FROM v
             |), cand AS (
             |  SELECT quant.vec_id, quant.e,
             |         ROUND(list_cosine_similarity(qvec, qq.qv), 6) AS qcos
             |  FROM quant, qq
             |  ORDER BY qcos DESC, vec_id ASC LIMIT 50
             |)
             |SELECT cand.vec_id, ROUND(list_cosine_similarity(cand.e, q.qe), 6) AS cosine
             |FROM cand, q ORDER BY cosine DESC, vec_id ASC LIMIT 10""".stripMargin)),

    // Unigram-LM quality proxy (CCNet-style perplexity filter without an
    // external model): per-doc mean −ln p(token) under the corpus
    // distribution with add-one smoothing. Oracle replays tokenization,
    // the global distribution, and the per-doc mean.
    QueryDef("p28_lm_score",
      (s, dir) => TextAnalysis.unigramNll(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY doc, term
             |), tot AS (
             |  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
             |), stats AS (
             |  SELECT SUM(ct) AS total, COUNT(*) AS vocab FROM tot
             |)
             |SELECT doc, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |       ROUND(SUM(-CAST(tf AS DOUBLE) * LN(CAST(ct + 1 AS DOUBLE) / CAST(total + vocab AS DOUBLE)))
             |             / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |FROM tf JOIN tot USING (term), stats
             |GROUP BY doc ORDER BY doc""".stripMargin)),

    // CCNet-style perplexity bucketing: corpus ranked by the
    // self-trained unigram-LM score and split into exact head/middle/
    // tail thirds under the (nll, doc) total order. The Spark side
    // fetches the two boundary order statistics (TakeOrderedAndProject)
    // and labels map-only; the oracle ranks with ROW_NUMBER — the hash
    // compare proves the two formulations pick identical sets.
    QueryDef("p61_perplexity_buckets",
      (s, dir) => TextAnalysis.perplexityBuckets(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY doc, term
             |), tot AS (
             |  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
             |), stats AS (
             |  SELECT SUM(ct) AS total, COUNT(*) AS vocab FROM tot
             |), sc AS (
             |  SELECT doc, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |         ROUND(SUM(-CAST(tf AS DOUBLE) * LN(CAST(ct + 1 AS DOUBLE) / CAST(total + vocab AS DOUBLE)))
             |               / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |  FROM tf JOIN tot USING (term), stats
             |  GROUP BY doc
             |), ranked AS (
             |  SELECT doc, n_tokens, nll,
             |         ROW_NUMBER() OVER (ORDER BY nll, doc) AS rk,
             |         COUNT(*) OVER () AS n
             |  FROM sc
             |)
             |SELECT doc, n_tokens, nll,
             |       CASE WHEN rk <= (n + 2) // 3 THEN 'head'
             |            WHEN rk <= (2 * n + 2) // 3 THEN 'middle'
             |            ELSE 'tail' END AS bucket
             |FROM ranked ORDER BY doc""".stripMargin)),

    // Reproducible stratified subsampling (training-mix weights): the
    // per-stratum keep decision is the portable Knuth-mix gate on the id
    // (engine-replayable integer arithmetic — sampling a training corpus
    // must be provenance-reproducible, which a seeded sample() across
    // unknown partitionings is not). en kept at 50%, everything else 20%.
    QueryDef("p30_sample_stratified",
      (s, dir) => Curation.stratifiedSample(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "source"),
        "doc_id", "lang", Map("en" -> 0.5), defaultFraction = 0.2)
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, source
             |FROM read_parquet('{SFDIR}/documents.parquet')
             |WHERE ((doc_id % 100000) * 2654435761) % 1000000
             |      < CASE WHEN lang = 'en' THEN 500000 ELSE 200000 END
             |ORDER BY doc_id""".stripMargin)),

    // Greedy sequence packing into fixed token budgets: shard by the
    // portable id mix (independent packing groups — one per writer task
    // at scale), order (tokens desc, id) within the shard, fill packs by
    // running token count. One shard-keyed window, no global sort; packs
    // overflow the budget by at most one doc (floor rule — exact
    // never-exceed packing needs running state no window or external
    // replay can express).
    QueryDef("p29_pack_sequences",
      (s, dir) => Curation.packSequences(
        Tables.load(s, dir, "documents")
          // null text counts as NULL, matching the oracle's
          // LEN(string_split_regex(TRIM(text))) — NOT the -1 that a bare
          // size(split(NULL)) yields; packSequences raises on NULL rather
          // than silently corrupting the shard's running fill
          .select(col("doc_id"),
            when(col("text").isNotNull,
              size(split(trim(col("text")), "\\s+"))).as("n_toks")),
        "doc_id", "n_toks", budgetTokens = 256L, shards = 8)
        .select(col("doc_id"), col("shard"), col("pack"), col("n_tokens"))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST((((doc_id % 100000) + 1) * 2654435761) % 1000000 % 8 AS INT) AS shard,
             |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), c AS (
             |  SELECT doc_id, shard, n_tokens,
             |         SUM(n_tokens) OVER (PARTITION BY shard
             |                             ORDER BY n_tokens DESC, doc_id
             |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t
             |)
             |SELECT doc_id, shard,
             |       CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 256.0) AS BIGINT) AS pack,
             |       n_tokens
             |FROM c ORDER BY doc_id""".stripMargin)),

    // Semantic decontamination: drop corpus vectors with cosine ≥ 0.35
    // to ANY held-out blocklist vector (eval-set leakage survives
    // paraphrase; the n-gram screen p21 misses it, the embedding screen
    // catches it). The blocklist (every 50th id) is inlined as one
    // typedlit literal — the screen is a MAP-ONLY filter, zero shuffles.
    // Oracle: NOT EXISTS over the all-pairs cosine, both sides comparing
    // the 6-decimal-rounded value.
    QueryDef("p31_semantic_decontaminate",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        Similarity.semanticDecontaminate(
          emb.where(col("vec_id") % 50 =!= 0), "embedding",
          emb.where(col("vec_id") % 50 === 0), "embedding",
          threshold = 0.35)
          .select("vec_id", "label").orderBy("vec_id")
      },
      Some("""WITH b AS (
             |  SELECT CAST(embedding AS DOUBLE[]) AS e
             |  FROM read_parquet('{SFDIR}/embeddings.parquet') WHERE vec_id % 50 = 0
             |), c AS (
             |  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e
             |  FROM read_parquet('{SFDIR}/embeddings.parquet') WHERE vec_id % 50 <> 0
             |)
             |SELECT vec_id, label FROM c
             |WHERE NOT EXISTS (
             |  SELECT 1 FROM b
             |  WHERE ROUND(list_cosine_similarity(c.e, b.e), 6) >= 0.35)
             |ORDER BY vec_id""".stripMargin)),

    // Sliding-window chunking: 16-token windows at stride 8 (50%
    // overlap) — retrieval-index entries / fixed-context examples from
    // cleaned docs. Map-only (tokens split once, windows sliced from the
    // array), no shuffle; the oracle replays the same starts with
    // range(0, len, 8) and inclusive list slices.
    QueryDef("p32_chunk_documents",
      (s, dir) => Curation.chunkDocuments(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", chunkTokens = 16, strideTokens = 8)
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(TRIM(${segSql("text")}), '\\s+'), x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), c AS (
             |  SELECT doc_id, toks, unnest(range(0, len(toks), 8)) AS start
             |  FROM t WHERE len(toks) > 0
             |)
             |SELECT doc_id, CAST(start / 8 AS INT) AS chunk_idx,
             |       array_to_string(toks[start + 1 : least(start + 16, len(toks))], ' ') AS chunk_text,
             |       CAST(least(16, len(toks) - start) AS BIGINT) AS n_tokens
             |FROM c ORDER BY doc_id, chunk_idx""".stripMargin)),

    // Bigram LM NLL (perplexity-filter ladder, one step above p28's
    // unigram): self-trained add-one-smoothed bigram model; word salad
    // with common unigrams but improbable adjacency scores high. The
    // oracle replays the token window via zipped unnests of the two
    // offset slices and the same smoothing arithmetic.
    QueryDef("p33_bigram_lm",
      (s, dir) => TextAnalysis.bigramNll(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), bgrows AS (
             |  SELECT doc_id,
             |         unnest(toks[1:len(toks)-1]) AS w1,
             |         unnest(toks[2:len(toks)]) AS w2
             |  FROM t WHERE len(toks) >= 2
             |), bg AS (
             |  SELECT doc_id, w1, w2, count(*) AS tf FROM bgrows GROUP BY doc_id, w1, w2
             |), pt AS (
             |  SELECT w1, w2, sum(tf) AS cb FROM bg GROUP BY w1, w2
             |), lt AS (
             |  SELECT w1, sum(cb) AS cl FROM pt GROUP BY w1
             |), v AS (
             |  SELECT count(DISTINCT tok) AS vocab
             |  FROM (SELECT w1 AS tok FROM pt UNION ALL SELECT w2 FROM pt)
             |)
             |SELECT doc_id AS doc, CAST(sum(tf) AS BIGINT) AS n_bigrams,
             |       ROUND(SUM(-CAST(tf AS DOUBLE) * LN(CAST(cb + 1 AS DOUBLE) / CAST(cl + vocab AS DOUBLE)))
             |             / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |FROM bg JOIN pt USING (w1, w2) JOIN lt USING (w1), v
             |GROUP BY doc_id ORDER BY doc""".stripMargin)),

    // Duplicate-span REMOVAL (C4/RefinedWeb-style): cut every token
    // inside an 8-token window whose text occurs in >1 doc; docs keep
    // their distinct remainder. The oracle replays the dense-positioned
    // tokens, the window spans, the shared-span set, the covered-range
    // explode, and the ordered reassembly.
    QueryDef("p34_remove_shared_spans",
      (s, dir) => Dedup.removeSharedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 8)
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tok AS (
             |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
             |  FROM t WHERE len(toks) > 0
             |), win AS (
             |  SELECT doc_id,
             |         unnest(range(0, len(toks) - 8 + 1)) AS pos,
             |         unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                               i -> array_to_string(toks[i:i+7], ' '))) AS span
             |  FROM t WHERE len(toks) >= 8
             |), shared AS (
             |  SELECT span FROM (
             |    SELECT span, count(DISTINCT doc_id) AS c FROM win GROUP BY span
             |  ) WHERE c > 1
             |), cov AS (
             |  SELECT DISTINCT doc_id, cpos AS pos FROM (
             |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos
             |    FROM win JOIN shared USING (span))
             |), kept AS (
             |  SELECT tok.doc_id, tok.pos, tok.tok FROM tok
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM cov WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
             |)
             |SELECT d.doc_id AS doc,
             |       COALESCE(r.txt, '') AS text_clean,
             |       CAST(COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_kept,
             |       CAST(d.total - COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_dropped
             |FROM (SELECT doc_id, len(toks) AS total FROM t WHERE len(toks) > 0) d
             |LEFT JOIN (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt, count(*) AS nk
             |  FROM kept GROUP BY doc_id
             |) r USING (doc_id)
             |ORDER BY doc""".stripMargin)),

    // Dedup audit report: (label, cluster_size) per non-trivial
    // cluster; the oracle reuses the recursive-CTE component labels and
    // groups them.
    QueryDef("p47_dedup_report",
      (s, dir) => Dedup.dedupReport(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", threshold = 0.7)
        .orderBy("label"),
      Some("""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet')
             |), """.stripMargin + ccDedupTail("0.7") +
        """
          |SELECT label, CAST(COUNT(*) AS BIGINT) AS cluster_size
          |FROM labels GROUP BY label HAVING COUNT(*) > 1
          |ORDER BY label""".stripMargin)),

    // Corpus-divergence card: unigram KL/JS between the en stratum and
    // the rest, add-one smoothing over the union vocabulary; the oracle
    // replays the token counts, the smoothing, and all three sums.
    QueryDef("p46_corpus_divergence",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        TextAnalysis.corpusDivergence(
          docs.where(col("lang") === "en"), "text",
          docs.where(col("lang") =!= "en"), "text")
      },
      Some("""WITH ta AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'), x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE lang = 'en'
             |), tb AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'), x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE lang <> 'en'
             |), ca AS (SELECT term, COUNT(*) AS ca FROM ta GROUP BY term
             |), cb AS (SELECT term, COUNT(*) AS cb FROM tb GROUP BY term
             |), j AS (
             |  SELECT COALESCE(ca.term, cb.term) AS term,
             |         COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
             |  FROM ca FULL OUTER JOIN cb USING (term)
             |), s AS (
             |  SELECT SUM(ca) AS na, SUM(cb) AS nb, COUNT(*) AS v FROM j
             |), pq AS (
             |  SELECT (ca + 1.0) / (na + v) AS p, (cb + 1.0) / (nb + v) AS q
             |  FROM j, s
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
             |       ROUND(SUM(p * ln(p / q)), 6) AS kl_pq,
             |       ROUND(SUM(q * ln(q / p)), 6) AS kl_qp,
             |       ROUND(SUM(p / 2 * ln(p / ((p + q) / 2))
             |                 + q / 2 * ln(q / ((p + q) / 2))), 6) AS js
             |FROM pq""".stripMargin)),

    // Within-doc repeated-span removal (keep-first): 3-token windows
    // repeating an earlier start in the SAME doc are cut; the oracle
    // replays dense positions, per-(doc,span) first starts, covered
    // ranges, and the ordered reassembly.
    QueryDef("p45_remove_repeated_spans",
      (s, dir) => Dedup.removeRepeatedSpans(
        Tables.load(s, dir, "documents"), "doc_id", "text", k = 3)
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tok AS (
             |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
             |  FROM t WHERE len(toks) > 0
             |), win AS (
             |  SELECT doc_id,
             |         unnest(range(0, len(toks) - 3 + 1)) AS pos,
             |         unnest(list_transform(range(1, len(toks) - 3 + 2),
             |                               i -> array_to_string(toks[i:i+2], ' '))) AS span
             |  FROM t WHERE len(toks) >= 3
             |), firstpos AS (
             |  SELECT doc_id, span, MIN(pos) AS fp FROM win GROUP BY doc_id, span
             |), cov AS (
             |  SELECT DISTINCT doc_id, cpos AS pos FROM (
             |    SELECT w.doc_id, unnest(range(w.pos, w.pos + 3)) AS cpos
             |    FROM win w JOIN firstpos f
             |      ON w.doc_id = f.doc_id AND w.span = f.span AND w.pos > f.fp)
             |), kept AS (
             |  SELECT tok.doc_id, tok.pos, tok.tok FROM tok
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM cov WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
             |)
             |SELECT d.doc_id AS doc,
             |       COALESCE(r.txt, '') AS text_clean,
             |       CAST(COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_kept,
             |       CAST(d.total - COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_dropped
             |FROM (SELECT doc_id, len(toks) AS total FROM t WHERE len(toks) > 0) d
             |LEFT JOIN (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt, count(*) AS nk
             |  FROM kept GROUP BY doc_id
             |) r USING (doc_id)
             |ORDER BY doc""".stripMargin)),

    // Blocklist-term screen (NSFW/compliance filter): whole-word hit
    // count via the single-pass graft_count_words_in scan, docs with
    // more than 2 hits dropped. Oracle keeps the \b-alternation regex
    // form (the hash compare enforces count-identity, as for p10/p15).
    QueryDef("p35_screen_blocklist",
      (s, dir) => TextAnalysis.screenBlockedTerms(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "text"),
        "text", Seq("customer", "vector", "stream"), maxHits = 2)
        .select("doc_id", "lang", "n_blocked")
        .orderBy("doc_id"),
      Some("""SELECT doc_id, lang, n_blocked FROM (
             |  SELECT doc_id, lang,
             |         CAST(LEN(regexp_extract_all(lower(text), '\b(customer|vector|stream)\b')) AS BIGINT) AS n_blocked
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |WHERE n_blocked <= 2
             |ORDER BY doc_id""".stripMargin)),

    // Token-budget mixture sampling: per-lang TOKEN budgets (en 20k,
    // default 5k) filled in the portable gate order; the straddling doc
    // overflows the boundary (exclusive prefix < budget). The oracle
    // replays the gate arithmetic and the per-stratum running sum.
    QueryDef("p36_sample_token_budget",
      (s, dir) => Curation.sampleByTokenBudget(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            // NULL text → NULL tokens, as in p29: a bare size() yields -1
            // for NULL and the operator's non-negative-token contract
            // would raise with a misleading 'got -1' (benign on this
            // fixture, which has no NULL text — but the pattern is the
            // template users copy); long to match the oracle's BIGINT
            // width on the returned column (as in p99)
            when(col("text").isNotNull,
              size(split(trim(col("text")), "\\s+"))).cast("long").as("n_toks")),
        "doc_id", "n_toks", "lang",
        budgets = Map("en" -> 20000L), defaultBudget = 5000L)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_toks,
             |         ((doc_id % 100000 + 2) * 2654435761) % 1000000 AS gate
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), c AS (
             |  SELECT doc_id, lang, n_toks,
             |         SUM(n_toks) OVER (PARTITION BY lang ORDER BY gate, doc_id
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           - n_toks AS cum
             |  FROM t
             |)
             |SELECT doc_id, lang, n_toks FROM c
             |WHERE cum < CASE WHEN lang = 'en' THEN 20000 ELSE 5000 END
             |ORDER BY doc_id""".stripMargin)),

    // Word-vocabulary encoding (tokenize-to-ids): top-24 frequency-
    // ranked vocab (the fixture vocabulary is 31 terms, so ~7 fall OOV), per-doc in-order ids with 0 = OOV. The ids array is
    // stringified for the compare so both engines hash the same scalar;
    // the oracle replays the rank (count desc, term asc) and the ordered
    // per-doc id list.
    QueryDef("p37_encode_tokens",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val vocab = TextAnalysis.buildVocab(docs, "text", maxSize = 24)
        TextAnalysis.encodeTokens(docs, "doc_id", "text", vocab)
          .select(col("doc").as("doc_id"),
            array_join(transform(col("ids"), i => i.cast("string")), " ").as("ids"),
            col("n_tokens"), col("n_oov"))
          .orderBy("doc_id")
      },
      Some(s"""WITH tok AS (
             |  SELECT doc_id, tok, pos FROM (
             |    SELECT doc_id,
             |           unnest(toks) AS tok,
             |           unnest(range(0, len(toks))) AS pos
             |    FROM (
             |      SELECT doc_id,
             |             ${segToksSql("text")} AS toks
             |      FROM read_parquet('{SFDIR}/documents.parquet'))
             |  )
             |), v AS (
             |  SELECT term, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, term ASC) AS INT) AS id
             |  FROM (SELECT tok AS term, count(*) AS cnt FROM tok GROUP BY tok)
             |  ORDER BY cnt DESC, term ASC LIMIT 24
             |)
             |SELECT doc_id,
             |       string_agg(CAST(COALESCE(v.id, 0) AS VARCHAR), ' ' ORDER BY pos) AS ids,
             |       count(*) AS n_tokens,
             |       CAST(SUM(CASE WHEN v.id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
             |FROM tok LEFT JOIN v ON tok.tok = v.term
             |GROUP BY doc_id
             |ORDER BY doc_id""".stripMargin)),

    // Product-quantized ANN (m=2 subspaces × k=4 codes, ADC candidate
    // cut, exact rescoring). The oracle replays BOTH subspaces' full
    // Lloyd trajectories, the per-code query tables, the rounded ADC
    // ranking, and the rescore — so codebook training, encoding, and
    // both ranking stages are all verified.
    QueryDef("p38_ann_pq",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 2, k = 4)
        Similarity.pqTopK(emb, "vec_id", "embedding", books, q, k = 10)
      },
      Some(pqOracleSql)),

    // IVF-PQ composed ANN: coarse quantizer (k=8) prunes to nprobe=3
    // cells, ADC (m=2, k=4 codebooks) ranks only within them, exact
    // cosine rescores the top 50. The oracle replays BOTH trainings and
    // the composed probe → ADC → rescore pipeline.
    QueryDef("p39_ann_ivfpq",
      (s, dir) => {
        // the composed call trains THREE Lloyd loops (coarse + 2 PQ
        // subspaces), each scanning the corpus iters+1 times — persist
        // the input once (the semanticDedup lesson: caching changes no
        // value, only how many times the scan plan executes; the
        // trajectory-sensitive thing is PARTITIONING, which persist
        // preserves)
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 2, k = 4)
        Similarity.ivfPqTopK(emb, "vec_id", "embedding", coarse, books, q, k = 10)
      },
      Some(ivfPqOracleSql)),

    // Serving-index lifecycle (delete + compact): build the IVF-PQ
    // serving layout, tombstone-delete vec_id % 7 = 3 (O(deletes), no
    // rewrite — probes anti-join the set immediately), probe; then
    // COMPACT (tombstones fold into the files, _tombstones clears,
    // partition scheme preserved) and probe again. Both phases must
    // equal the oracle's ground truth — the full p39 replay with the
    // deleted ids excluded from the probed cells.
    QueryDef("p124_ann_index_delete",
      (s, dir) => {
        import s.implicits._
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 2, k = 4)
        val path = s"target/graft-tmp/ann_lifecycle_p124_${math.abs(dir.hashCode)}"
        Similarity.writeIvfPq(emb, "embedding", path, coarse, books)
        Similarity.deleteFromIndex(
          emb.where(pmod(col("vec_id"), lit(7L)) === 3).select("vec_id"),
          "vec_id", path)
        def probe() = Similarity.probeIvfPq(s, path, "vec_id", "embedding",
          coarse, books, q, k = 10, nprobe = 3, rescoreFactor = 5)
        // materialize the tombstoned probe BEFORE compaction swaps the
        // files out from under its scan
        val tombstoned = probe().collect()
          .map(r => (r.getLong(0), r.getDouble(1))).toSeq
          .toDF("vec_id", "cosine").withColumn("phase", lit("tombstoned"))
        Similarity.compactIndex(s, path, "vec_id")
        probe().withColumn("phase", lit("compacted"))
          .unionByName(tombstoned)
          .select("phase", "vec_id", "cosine")
          .orderBy(col("phase"), col("cosine").desc, col("vec_id"))
      },
      Some(annDeleteOracleSql)),

    // Residual IVF-PQ: PQ codebooks trained on coarse-assignment
    // residuals (the true Faiss IndexIVFPQ), inner-product ADC =
    // per-cell constant + the same m table lookups, probed cells only.
    QueryDef("p42_ann_ivfpq_residual",
      (s, dir) => {
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val q = emb.where(col("vec_id") === 0)
          .select("embedding").head().getSeq[Float](0)
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPqResidual(
          emb, "vec_id", "embedding", coarse, m = 2, k = 4)
        Similarity.ivfPqResidualTopK(
          emb, "vec_id", "embedding", coarse, books, q, k = 10)
      },
      Some(ivfPqResidualOracleSql)),

    // Fuzzy decontamination: banded-LSH candidates corpus×blocklist,
    // exact-Jaccard verification ≥ 0.7, survivors kept. The oracle is
    // the all-pairs Jaccard ground truth (blocklist side is tiny), so
    // the hash compare also proves banding recall on the fixture's
    // contaminated pairs, as for p02/p04.
    QueryDef("p44_fuzzy_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        Dedup.fuzzyDecontaminate(
          docs.where(col("doc_id") % 50 =!= 0).select("doc_id", "lang", "text"),
          "doc_id", "text",
          docs.where(col("doc_id") % 50 === 0).select("doc_id", "text"),
          "doc_id", "text", threshold = 0.7)
          .select("doc_id", "lang").orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, lang, text
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 <> 0
             |), block AS (
             |  SELECT doc_id, text
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 = 0
             |), ct AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus
             |), cs AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM ct WHERE len(toks) >= 3
             |), bt AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM block
             |), bs AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM bt WHERE len(toks) >= 3
             |), contaminated AS (
             |  SELECT DISTINCT c.doc_id FROM cs c, bs b
             |  WHERE ROUND(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE)
             |              / (len(c.s) + len(b.s) - len(list_intersect(c.s, b.s))), 6) >= 0.7
             |)
             |SELECT doc_id, lang FROM corpus
             |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
             |ORDER BY doc_id""".stripMargin)),

    // Distributed BPE train: the oracle replays the ENTIRE merge
    // trajectory — unrolled (pairs -> best -> fold-apply) blocks, one
    // per merge, with the string-fold application proven equivalent to
    // the greedy scan (a fused piece can never be the left of another
    // fuse in the same pass) — and checks the ordered merge list.
    QueryDef("p48_bpe_merges",
      (s, dir) => {
        val model = Bpe.train(
          Tables.load(s, dir, "documents"), "text",
          numMerges = bpeMerges, maxWords = bpeMaxWords)
        Bpe.modelFrame(s, model).orderBy("rank")
      },
      Some(bpeCtes(bpeMerges, bpeMaxWords) +
        s"""
           |SELECT rank, a, b FROM (
           |${(1 to bpeMerges).map(i =>
              s"  SELECT $i AS rank, a, b FROM b$i").mkString("\n  UNION ALL\n")}
           |) ORDER BY rank""".stripMargin)),

    // BPE encode: the corpus re-tokenized against the trained merges;
    // the oracle applies its own replayed trajectory's final dictionary
    // state to every token and reassembles per doc.
    QueryDef("p48_bpe_encode",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val model = Bpe.train(docs, "text",
          numMerges = bpeMerges, maxWords = bpeMaxWords)
        Bpe.encode(docs, "doc_id", "text", model).orderBy("doc")
      },
      Some(bpeCtes(bpeMerges, bpeMaxWords) +
        s"""
           |SELECT tk.doc_id AS doc,
           |       CAST(COUNT(*) AS BIGINT) AS n_tokens,
           |       CAST(SUM(len(string_split(d.s, ' '))) AS BIGINT) AS n_pieces,
           |       string_agg(d.s, ' ' ORDER BY tk.pos) AS pieces
           |FROM tok tk JOIN st$bpeMerges d ON tk.tok = d.word
           |GROUP BY tk.doc_id
           |ORDER BY doc""".stripMargin)),

    // Composed curation end-to-end: quality floor -> near-dup dedup ->
    // Gopher screen (language-neutral rules; the stopword rule is
    // auto-disabled with an empty allowlist) -> exact fuzzy decon ->
    // cross-doc span surgery -> within-doc span surgery -> reproducible
    // split. The oracle chains the p15/p40/p44/p34/p45/p43 fragments in
    // the same stage order — the composition (which stage sees which
    // survivors, whose REWRITTEN text feeds the next stage) is exactly
    // what the individual oracles cannot check.
    QueryDef("p49_curate_e2e",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        TrainingPipeline.curate(
          docs.where(col("doc_id") % 50 =!= 0), "doc_id", "text",
          minQuality = 0.3, minWords = 20,
          blocklist = Some((docs.where(col("doc_id") % 50 === 0), "doc_id", "text")))
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE raw AS (
             |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 <> 0
             |), bl AS (
             |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 50 = 0
             |), f AS (
             |  SELECT doc_id, text,
             |         LENGTH(text) AS n_chars,
             |         string_split_regex(TRIM(text), '\\s+') AS words
             |  FROM raw
             |), g AS (
             |  SELECT doc_id, text,
             |         LEAST(CAST(LEN(words) AS DOUBLE) / 20.0, 1.0) AS len_score,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[\\.,;:!\\?''"()\\[\\]{}-]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.5 END AS punct_ok,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1.0 ELSE 0.5 END AS digit_ok,
             |         CAST(LEN(list_distinct(words)) AS DOUBLE) / CAST(GREATEST(LEN(words), 1) AS DOUBLE) AS uniq_ratio
             |  FROM f
             |), corpus AS (
             |  SELECT doc_id, text FROM g
             |  WHERE ROUND(((len_score * punct_ok) * digit_ok) * 0.5 + uniq_ratio * 0.5, 4) >= 0.3
             |), ${ccDedupTail("0.8")}
             |, cleaned AS (
             |  SELECT c.doc_id, c.text FROM corpus c ANTI JOIN drops ON c.doc_id = drops.doc
             |), gf AS (
             |  SELECT doc_id, text,
             |         CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_words,
             |         len(regexp_replace(TRIM(text), '\\s+', '', 'g')) AS n_wchars,
             |         (len(text) - len(replace(text, '#', '')))
             |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
             |         CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS alpha_words
             |  FROM cleaned
             |), screened AS (
             |  SELECT doc_id, text FROM gf
             |  WHERE n_words BETWEEN 20 AND 100000
             |    AND ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) BETWEEN 3.0 AND 10.0
             |    AND ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) <= 0.1
             |    AND ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) >= 0.8
             |), st AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
             |                     x -> x <> '') AS toks
             |  FROM screened
             |), ss AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                              i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM st WHERE len(toks) >= 3
             |), blt AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
             |                     x -> x <> '') AS toks
             |  FROM bl
             |), bls AS (
             |  SELECT doc_id, list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                              i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM blt WHERE len(toks) >= 3
             |), contaminated AS (
             |  SELECT DISTINCT c.doc_id FROM ss c, bls b
             |  WHERE ROUND(CAST(len(list_intersect(c.s, b.s)) AS DOUBLE)
             |              / (len(c.s) + len(b.s) - len(list_intersect(c.s, b.s))), 6) >= 0.7
             |), decon AS (
             |  SELECT doc_id, text FROM screened
             |  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
             |), dt AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
             |                     x -> x <> '') AS toks
             |  FROM decon
             |), dtok AS (
             |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
             |  FROM dt WHERE len(toks) > 0
             |), dwin AS (
             |  SELECT doc_id,
             |         unnest(range(0, len(toks) - 8 + 1)) AS pos,
             |         unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                               i -> array_to_string(toks[i:i+7], ' '))) AS span
             |  FROM dt WHERE len(toks) >= 8
             |), dshared AS (
             |  SELECT span FROM (
             |    SELECT span, count(DISTINCT doc_id) AS c FROM dwin GROUP BY span
             |  ) WHERE c > 1
             |), dcov AS (
             |  SELECT DISTINCT doc_id, cpos AS pos FROM (
             |    SELECT doc_id, unnest(range(pos, pos + 8)) AS cpos
             |    FROM dwin JOIN dshared USING (span))
             |), dkept AS (
             |  SELECT dtok.doc_id, dtok.pos, dtok.tok FROM dtok
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM dcov WHERE dcov.doc_id = dtok.doc_id AND dcov.pos = dtok.pos)
             |), crossdone AS (
             |  SELECT d.doc_id, COALESCE(r.txt, '') AS text
             |  FROM (SELECT doc_id FROM dt WHERE len(toks) > 0) d
             |  LEFT JOIN (
             |    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
             |    FROM dkept GROUP BY doc_id
             |  ) r USING (doc_id)
             |), rt AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\\s]', '', 'g'))), '\\s+'),
             |                     x -> x <> '') AS toks
             |  FROM crossdone
             |), rtok AS (
             |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
             |  FROM rt WHERE len(toks) > 0
             |), rwin AS (
             |  SELECT doc_id,
             |         unnest(range(0, len(toks) - 8 + 1)) AS pos,
             |         unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                               i -> array_to_string(toks[i:i+7], ' '))) AS span
             |  FROM rt WHERE len(toks) >= 8
             |), rfirst AS (
             |  SELECT doc_id, span, MIN(pos) AS fp FROM rwin GROUP BY doc_id, span
             |), rcov AS (
             |  SELECT DISTINCT doc_id, cpos AS pos FROM (
             |    SELECT w.doc_id, unnest(range(w.pos, w.pos + 8)) AS cpos
             |    FROM rwin w JOIN rfirst fr
             |      ON w.doc_id = fr.doc_id AND w.span = fr.span AND w.pos > fr.fp)
             |), rkept AS (
             |  SELECT rtok.doc_id, rtok.pos, rtok.tok FROM rtok
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM rcov WHERE rcov.doc_id = rtok.doc_id AND rcov.pos = rtok.pos)
             |), withindone AS (
             |  SELECT d.doc_id, COALESCE(r.txt, '') AS text
             |  FROM (SELECT doc_id FROM rt WHERE len(toks) > 0) d
             |  LEFT JOIN (
             |    SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt
             |    FROM rkept GROUP BY doc_id
             |  ) r USING (doc_id)
             |)
             |SELECT doc_id, text,
             |       CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 980000 THEN 'train'
             |            WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 990000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM withindone ORDER BY doc_id""".stripMargin)),

    // Any-length exact-substring removal (ExactSubstr): tokens inside
    // maximal cross-doc shared runs of length >= 5 are cut. The oracle
    // derives the removal from the OTHER side of the window/run
    // equivalence: covered positions -> gaps-and-islands maximal runs,
    // counted per doc — the run count cross-checks the Spark side's
    // lag-window derivation, not just the surviving text.
    QueryDef("p50_remove_shared_substrings",
      (s, dir) => Dedup.removeSharedSubstrings(
        Tables.load(s, dir, "documents"), "doc_id", "text", minLen = 5)
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tok AS (
             |  SELECT doc_id, unnest(toks) AS tok, unnest(range(0, len(toks))) AS pos
             |  FROM t WHERE len(toks) > 0
             |), win AS (
             |  SELECT doc_id,
             |         unnest(range(0, len(toks) - 5 + 1)) AS pos,
             |         unnest(list_transform(range(1, len(toks) - 5 + 2),
             |                               i -> array_to_string(toks[i:i+4], ' '))) AS span
             |  FROM t WHERE len(toks) >= 5
             |), shared AS (
             |  SELECT span FROM (
             |    SELECT span, count(DISTINCT doc_id) AS c FROM win GROUP BY span
             |  ) WHERE c > 1
             |), cov AS (
             |  SELECT DISTINCT doc_id, cpos AS pos FROM (
             |    SELECT doc_id, unnest(range(pos, pos + 5)) AS cpos
             |    FROM win JOIN shared USING (span))
             |), isl AS (
             |  SELECT doc_id, pos,
             |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
             |  FROM cov
             |), runs AS (
             |  SELECT doc_id, CAST(COUNT(DISTINCT grp) AS BIGINT) AS nr
             |  FROM isl GROUP BY doc_id
             |), kept AS (
             |  SELECT tok.doc_id, tok.pos, tok.tok FROM tok
             |  WHERE NOT EXISTS (
             |    SELECT 1 FROM cov WHERE cov.doc_id = tok.doc_id AND cov.pos = tok.pos)
             |)
             |SELECT d.doc_id AS doc,
             |       COALESCE(r.txt, '') AS text_clean,
             |       CAST(COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_kept,
             |       CAST(d.total - COALESCE(r.nk, 0) AS BIGINT) AS n_tokens_dropped,
             |       CAST(COALESCE(runs.nr, 0) AS BIGINT) AS n_runs_removed
             |FROM (SELECT doc_id, len(toks) AS total FROM t WHERE len(toks) > 0) d
             |LEFT JOIN (
             |  SELECT doc_id, string_agg(tok, ' ' ORDER BY pos) AS txt, count(*) AS nk
             |  FROM kept GROUP BY doc_id
             |) r USING (doc_id)
             |LEFT JOIN runs ON runs.doc_id = d.doc_id
             |ORDER BY doc""".stripMargin)),

    // CCNet-style duplicated-LINE (boilerplate) removal. The corpus
    // documents are single-line, so the query first builds a multi-line
    // frame VISIBLY ON BOTH SIDES: 12-token body lines plus a per-source
    // subscription header (~25 docs each) and a corpus-wide rights
    // footer (all docs) — then the operator must strip exactly the
    // injected boilerplate (and any body line that genuinely repeats
    // across >= 3 docs, e.g. in exact-duplicate clusters; the oracle
    // replays the same count). Reassembly is exact text in original
    // order, checked by the hash compare.
    QueryDef("p51_remove_dup_lines",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
        // upper bound clamped: an empty doc would otherwise hit
        // sequence(0,-1) = [0,-1] (descending default step) and emit a
        // spurious second empty line the oracle's range(0,0,12) lacks;
        // clamping to [0] yields one empty chunk whose join is "" —
        // byte-identical to the oracle's empty-list fold.
        val body = array_join(
          transform(
            sequence(lit(0),
              greatest(floor((size(toks) - 1) / lit(12)).cast("int"), lit(0))),
            i => array_join(slice(toks, i * 12 + 1, lit(12)), " ")),
          "\n")
        val lined = docs.select(col("doc_id"),
          concat_ws("\n",
            concat(lit("subscribe to the "), col("source"),
              lit(" newsletter for updates")),
            body,
            lit("all rights reserved worldwide by the publisher"))
            .as("text"))
        Dedup.removeDuplicateLines(lined, "doc_id", "text",
          minDocs = 3, minChars = 10)
          .orderBy("doc")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |         list_filter(string_split_regex(TRIM(text), '\s+'), x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), lined AS (
             |  SELECT doc_id,
             |         'subscribe to the ' || source || ' newsletter for updates' || chr(10) ||
             |         array_to_string(list_transform(range(0, len(toks), 12),
             |             st -> array_to_string(toks[st + 1 : least(st + 12, len(toks))], ' ')), chr(10)) ||
             |         chr(10) || 'all rights reserved worldwide by the publisher' AS text
             |  FROM t
             |), lines AS (
             |  SELECT doc_id, unnest(string_split(text, chr(10))) AS line,
             |         unnest(range(0, len(string_split(text, chr(10))))) AS pos
             |  FROM lined
             |), boiler AS (
             |  SELECT line FROM lines WHERE len(line) >= 10
             |  GROUP BY line HAVING count(DISTINCT doc_id) >= 3
             |), j AS (
             |  SELECT l.doc_id, l.pos, l.line, (b.line IS NOT NULL) AS dup
             |  FROM lines l LEFT JOIN boiler b ON l.line = b.line
             |)
             |SELECT doc_id AS doc,
             |       COALESCE(string_agg(CASE WHEN NOT dup THEN line END, chr(10) ORDER BY pos), '') AS text_clean,
             |       CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(sum(CASE WHEN dup THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
             |FROM j GROUP BY doc_id ORDER BY doc""".stripMargin)),

    // DSIR importance selection: docs with doc_id % 10 == 0 play the
    // target domain, the rest are the raw corpus; top-100 docs by the
    // fixed-point hashed-unigram log-likelihood ratio are selected. The
    // oracle replays feature hashing (byte-fold FNV mod 2^k), both
    // smoothed distributions, the per-bucket 1e9-grid log-ratios, the
    // exact integer doc scores, and the deterministic top-k frontier.
    QueryDef("p60_dsir_select",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(pmod(col("doc_id"), lit(10)) =!= 0)
        val targetD = docs.where(pmod(col("doc_id"), lit(10)) === 0)
        Curation.dsirSelect(corpus, "doc_id", "text",
          targetD, "doc_id", "text", k = 100, numBuckets = 256)
          .select("doc_id", "lang", "source", "weight9")
          .orderBy("doc_id")
      },
      Some("""WITH ctoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS tk
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 10 <> 0
             |), ttoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS tk
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 10 = 0
             |), cb AS MATERIALIZED (
             |  SELECT doc_id, bucket, CAST(count(*) AS BIGINT) AS c FROM (
             |    SELECT doc_id,
             |           CAST(list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(tok)), '..'), ch -> CAST(CAST(('0x' || ch) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
             |           ) % 256 AS INT) AS bucket
             |    FROM (SELECT doc_id, unnest(tk) AS tok FROM ctoks)
             |  ) GROUP BY doc_id, bucket
             |), tb AS (
             |  SELECT bucket, CAST(count(*) AS BIGINT) AS n FROM (
             |    SELECT CAST(list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(tok)), '..'), ch -> CAST(CAST(('0x' || ch) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
             |           ) % 256 AS INT) AS bucket
             |    FROM (SELECT unnest(tk) AS tok FROM ttoks)
             |  ) GROUP BY bucket
             |), sdist AS (
             |  SELECT bucket, SUM(c) AS n FROM cb GROUP BY bucket
             |), tot AS (
             |  SELECT (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM sdist) + 256 AS st,
             |         (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) FROM tb) + 256 AS tt
             |), lw AS MATERIALIZED (
             |  SELECT b.b AS bucket,
             |         CAST(round(1000000000.0 *
             |           (ln(CAST(COALESCE(t.n, 0) + 1 AS DOUBLE)) - ln(CAST(tot.tt AS DOUBLE))
             |            - ln(CAST(COALESCE(s.n, 0) + 1 AS DOUBLE)) + ln(CAST(tot.st AS DOUBLE)))) AS BIGINT) AS w
             |  FROM (SELECT CAST(unnest(range(0, 256)) AS INT) AS b) b
             |  LEFT JOIN sdist s ON s.bucket = b.b
             |  LEFT JOIN tb t ON t.bucket = b.b
             |  CROSS JOIN tot
             |), scores AS (
             |  SELECT cb.doc_id, SUM(cb.c * lw.w) AS w9
             |  FROM cb JOIN lw ON cb.bucket = lw.bucket GROUP BY cb.doc_id
             |), sel AS (
             |  SELECT doc_id, w9,
             |         ROW_NUMBER() OVER (ORDER BY w9 DESC, doc_id ASC) AS rk
             |  FROM scores
             |)
             |SELECT d.doc_id, d.lang, d.source, CAST(s.w9 AS BIGINT) AS weight9
             |FROM sel s JOIN read_parquet('{SFDIR}/documents.parquet') d USING (doc_id)
             |WHERE s.rk <= 100 ORDER BY d.doc_id""".stripMargin)),

    // C4-style line-level cleaning over a synthesized line-structured
    // corpus that exercises EVERY rule: 12-token chunk lines where even
    // chunks get terminal punctuation (odd ones fail that rule), every
    // 5th-index chunk is poisoned with "javascript" (line ban), a 1-word
    // "end." line fails the word floor, and doc_id-gated extra lines
    // trip the doc-level lorem-ipsum / curly-brace page gates. The
    // oracle replays construction + every predicate + reassembly, so
    // the hash compare pins the exact kept-line set and doc survivors.
    QueryDef("p59_c4_line_rules",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .where(length(trim(col("text"))) > 0)
        val toks = filter(split(trim(col("text")), "\\s+"), t => t =!= "")
        val body = array_join(
          transform(
            sequence(lit(0),
              greatest(floor((size(toks) - 1) / lit(12)).cast("int"), lit(0))),
            i => {
              val base = array_join(slice(toks, i * 12 + 1, lit(12)), " ")
              val banned = when(pmod(i, lit(5)) === 1,
                concat(lit("javascript "), base)).otherwise(base)
              when(pmod(i, lit(2)) === 0, concat(banned, lit(".")))
                .otherwise(banned)
            }),
          "\n")
        val lined = docs.select(col("doc_id"),
          concat_ws("\n",
            body,
            lit("end."),
            when(pmod(col("doc_id"), lit(20)) === 7,
              lit("lorem ipsum filler text here.")),
            when(pmod(col("doc_id"), lit(20)) === 3,
              lit("{ config block }")))
            .as("text"))
        TextAnalysis.c4CleanLines(lined, "doc_id", "text", minKeptLines = 2)
          .orderBy("doc")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(TRIM(text), '\s+'), x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE len(TRIM(text)) > 0
             |), lined AS (
             |  SELECT doc_id,
             |         array_to_string(list_transform(range(0, len(toks), 12),
             |             st -> (CASE WHEN (st // 12) % 5 = 1 THEN 'javascript ' ELSE '' END)
             |                   || array_to_string(toks[st + 1 : least(st + 12, len(toks))], ' ')
             |                   || (CASE WHEN (st // 12) % 2 = 0 THEN '.' ELSE '' END)), chr(10))
             |         || chr(10) || 'end.'
             |         || (CASE WHEN doc_id % 20 = 7 THEN chr(10) || 'lorem ipsum filler text here.' ELSE '' END)
             |         || (CASE WHEN doc_id % 20 = 3 THEN chr(10) || '{ config block }' ELSE '' END) AS text
             |  FROM t
             |), lines AS (
             |  SELECT doc_id, text, unnest(string_split(text, chr(10))) AS line,
             |         unnest(range(0, len(string_split(text, chr(10))))) AS pos
             |  FROM lined
             |), j AS (
             |  SELECT doc_id, pos, line,
             |         (regexp_matches(rtrim(line), '[.!?"]$')
             |          AND len(list_filter(string_split_regex(trim(line), '\s+'), x -> x <> '')) >= 3
             |          AND position('javascript' IN lower(line)) = 0) AS keep,
             |         (position('lorem ipsum' IN lower(text)) > 0
             |          OR position('{' IN lower(text)) > 0) AS docdrop
             |  FROM lines
             |)
             |SELECT doc_id AS doc,
             |       COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS text_clean,
             |       CAST(count(*) AS BIGINT) AS n_lines,
             |       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept
             |FROM j GROUP BY doc_id, docdrop
             |HAVING NOT docdrop AND SUM(CASE WHEN keep THEN 1 ELSE 0 END) >= 2
             |ORDER BY doc""".stripMargin)),

    // Deterministic epoch shuffle into training shards: shard from one
    // gate mix, within-shard order from an independent mix. The oracle
    // replays both mixes and the per-shard ROW_NUMBER — the hash compare
    // pins the exact (shard, pos) of every row, i.e. the full training
    // order, not just the assignment counts.
    QueryDef("p52_shard_corpus",
      (s, dir) => Curation.shardCorpus(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", nShards = 8)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         ((doc_id % 100000 + 3) * 2654435761) % 1000000 AS g,
             |         ((doc_id % 100000 + 4) * 2654435761) % 1000000 AS og
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id, lang, CAST(g % 8 AS INT) AS shard,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY g % 8 ORDER BY og, doc_id) - 1 AS BIGINT) AS pos
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Sharded JSONL export (the training-data handoff format): shard
    // assignment from p52's gate mix, Hive-partitioned one-dir-per-shard
    // write, then READ BACK — the returned frame is what a downstream
    // loader would see, so the oracle (which recomputes the expected
    // rows from the original parquet) pins the full write→read round
    // trip: JSON text escaping, scalar fidelity, and the shard value's
    // survival through the directory name.
    QueryDef("p57_export_jsonl",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select("doc_id", "lang", "text")
        val sharded = Curation.shardCorpus(docs, "doc_id", nShards = 8)
        val out = new java.io.File(
          sys.props("java.io.tmpdir"), "graft-p57-jsonl").getPath
        Curation.exportJsonlShards(sharded, out)
          .select(col("doc_id"), col("lang"), col("text"),
            col("shard").cast("int").as("shard"), col("pos"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang, text,
             |         ((doc_id % 100000 + 3) * 2654435761) % 1000000 AS g,
             |         ((doc_id % 100000 + 4) * 2654435761) % 1000000 AS og
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id, lang, text, CAST(g % 8 AS INT) AS shard,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY g % 8 ORDER BY og, doc_id) - 1 AS BIGINT) AS pos
             |FROM t ORDER BY doc_id""".stripMargin)),

    // fastText-style linear classifier, trained in-engine (CCNet's
    // model-based quality filter). The oracle replays the ENTIRE
    // fixed-point GD trajectory — FNV bucket hashing, margins, rounded
    // sigmoids, floor-div gradient updates — so the hash compare pins
    // every epoch, not just the final weights' shape.
    QueryDef("p53_classifier_model",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        val model = TextClassifier.train(docs, "doc_id", "text", "y",
          numBuckets = tcBuckets, epochs = tcEpochs)
        TextClassifier.modelFrame(s, model).orderBy("bucket")
      },
      Some(classifierCtes(tcEpochs, tcBuckets) +
        s"""
           |SELECT b AS bucket, CAST(w AS BIGINT) AS w
           |FROM w$tcEpochs ORDER BY bucket""".stripMargin)),

    // Per-doc scores from the trained model: rounded-sigmoid score9 on
    // the 1e9 grid plus the integer-exact margin-sign prediction. The
    // oracle runs one more margin/sigmoid block against its replayed
    // final weights.
    QueryDef("p53_classifier_scores",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        val model = TextClassifier.train(docs, "doc_id", "text", "y",
          numBuckets = tcBuckets, epochs = tcEpochs)
        TextClassifier.score(docs, "doc_id", "text", "y", model)
          .orderBy("doc")
      },
      Some(classifierCtes(tcEpochs, tcBuckets) +
        s"""
           |, mf AS (
           |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
           |  FROM f JOIN w$tcEpochs w ON f.bucket = w.b GROUP BY f.doc_id
           |)
           |SELECT l.doc_id AS doc, l.n AS n_tokens,
           |       CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS BIGINT) AS score9,
           |       CASE WHEN m.mm > 0 THEN 1 ELSE 0 END AS pred,
           |       CAST(l.y AS BIGINT) AS y
           |FROM mf m JOIN lab l USING (doc_id) ORDER BY doc""".stripMargin)),

    // Per-stratum provenance manifest with an order-independent XOR
    // content checksum over the portable FNV-1a64 text hashes — the
    // oracle recomputes every per-doc hash in HUGEINT and must land on
    // the identical 64-bit fold, so the check covers hash, signed
    // conversion, and aggregation.
    QueryDef("p54_corpus_manifest",
      (s, dir) => Curation.corpusManifest(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("source"),
      Some(s"""WITH h AS (
             |  SELECT source, doc_id,
             |         CAST(len(list_filter(string_split_regex(TRIM(${segSql("text")}), '\\s+'), x -> x <> '')) AS BIGINT) AS n_toks,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(text)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS uh
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), sgn AS (
             |  SELECT source, doc_id, n_toks,
             |         CAST(CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
             |                   THEN uh - CAST('18446744073709551616' AS HUGEINT) ELSE uh END AS BIGINT) AS h
             |  FROM h
             |)
             |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             |       MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
             |       bit_xor(h) AS checksum
             |FROM sgn GROUP BY source ORDER BY source""".stripMargin)),

    // Temperature mixture resampling (tau = 0.5 flattens the source
    // mix): the oracle replays the share/pow/normalize arithmetic with
    // the 6-decimal rate rounding and the same gate mix, so the hash
    // compare pins every doc's integer repeat count, i.e. the exact
    // resampled corpus composition.
    QueryDef("p55_temperature_resample",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_toks"))
        Curation.temperatureResample(docs, "doc_id", "n_toks", "source",
          temperature = 0.5)
          .orderBy("doc_id")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, source,
             |         CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tot AS (
             |  SELECT source, CAST(SUM(n_toks) AS BIGINT) AS ts FROM d GROUP BY source
             |), gr AS (
             |  SELECT CAST(SUM(ts) AS BIGINT) AS t FROM tot
             |), pw AS (
             |  SELECT source, ts, t, pow(CAST(ts AS DOUBLE) / CAST(t AS DOUBLE), 0.5) AS fst
             |  FROM tot CROSS JOIN gr
             |), rates AS (
             |  SELECT source,
             |         ROUND(fst / (SELECT SUM(fst) FROM pw) * CAST(t AS DOUBLE) / CAST(ts AS DOUBLE), 6) AS r
             |  FROM pw
             |)
             |SELECT d.doc_id, d.source, d.n_toks,
             |       CAST(floor(r) AS BIGINT) +
             |       CASE WHEN ((d.doc_id % 100000 + 5) * 2654435761) % 1000000
             |                 < CAST(round((r - floor(r)) * 1e6) AS BIGINT)
             |            THEN 1 ELSE 0 END AS n_repeats
             |FROM d JOIN rates USING (source) ORDER BY d.doc_id""".stripMargin)),

    // Model-based corpus screen (the CCNet/FineWeb recipe: train a fast
    // linear classifier on a quality proxy, keep what scores well): docs
    // at or above the corpus's lower-median score9 survive, with their
    // ORIGINAL columns (id-keyed semi-join). The floor is data-derived —
    // the exact rank-(n+1)/2 order statistic — because a fixed absolute
    // threshold went vacuous when the testdata was regenerated (every
    // score fell on one side, leaving a 0-row keep set the hash compare
    // pinned nothing with); the median keeps the frontier non-empty AND
    // non-total under any corpus drift. orderBy+limit compiles to
    // TakeOrderedAndProject (distributed top-k, no global sort); at real
    // scale the floor would come from approxQuantile on a sample —
    // exact here so the DuckDB oracle lands on the identical Long. The
    // oracle replays the full training trajectory and re-derives both
    // the floor and the keep set, so the hash compare pins the exact
    // keep/drop frontier — the thing a training-data provenance audit
    // has to be able to reproduce.
    QueryDef("p56_classifier_screen",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val model = TextClassifier.train(
          docs.withColumn("y", (col("lang") === "en").cast("int")),
          "doc_id", "text", "y", numBuckets = tcBuckets, epochs = tcEpochs)
        val scores = OperatorCache.materialize(TextClassifier.score(
          docs.withColumn("__y", lit(0)), "doc_id", "text", "__y", model))
        val n = scores.count()
        val k = ((n + 1) / 2).toInt
        val thr = scores.select("score9").orderBy("score9").limit(k)
          .agg(max("score9")).head.getLong(0)
        TextClassifier.screen(docs, "doc_id", "text", model, minScore9 = thr,
          precomputed = Some(scores))
          .select("doc_id", "lang", "source").orderBy("doc_id")
      },
      Some(classifierCtes(tcEpochs, tcBuckets) +
        s"""
           |, mf AS (
           |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
           |  FROM f JOIN w$tcEpochs w ON f.bucket = w.b GROUP BY f.doc_id
           |), sc AS (
           |  SELECT m.doc_id,
           |         CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS HUGEINT) AS s9
           |  FROM mf m JOIN lab l USING (doc_id)
           |), ranked AS (
           |  SELECT s9, row_number() OVER (ORDER BY s9) AS rk,
           |         count(*) OVER () AS n
           |  FROM sc
           |), thr AS (
           |  SELECT s9 AS t FROM ranked WHERE rk = (n + 1) // 2
           |), keep AS (
           |  SELECT doc_id FROM sc CROSS JOIN thr WHERE sc.s9 >= thr.t
           |)
           |SELECT d.doc_id, d.lang, d.source
           |FROM read_parquet('{SFDIR}/documents.parquet') d
           |JOIN keep USING (doc_id) ORDER BY d.doc_id""".stripMargin)),

    // Reproducible train/val/test split: consecutive gate intervals
    // sized by normalized weights; the oracle replays the gate
    // arithmetic and the interval thresholds.
    QueryDef("p43_split_corpus",
      (s, dir) => Curation.splitCorpus(
        Tables.load(s, dir, "documents").select("doc_id", "lang"),
        "doc_id", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         ((doc_id % 100000) * 2654435761) % 1000000 AS gate
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id, lang,
             |       CASE WHEN gate < 800000 THEN 'train'
             |            WHEN gate < 900000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM t ORDER BY doc_id""".stripMargin)),

    // Full Gopher repetition battery: top-{2,3,4}-gram char fractions +
    // duplicated-{5..10}-gram char COVERAGE (union of spans, chars
    // counted once). The oracle rebuilds positioned grams from the token
    // list, replays the deterministic top-gram tie-break, and re-merges
    // the duplicate spans with the same gaps-and-islands window — so the
    // hash compare pins occurrence counting, span arithmetic, and the
    // overlap-union semantics, per n.
    QueryDef("p58_gopher_repetition",
      (s, dir) => TextAnalysis.gopherRepetitionStats(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS tk
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tk2 AS (
             |  SELECT doc_id, tk FROM t WHERE len(tk) > 0
             |), p AS (
             |  SELECT doc_id, tok, i,
             |         COALESCE(SUM(len(tok) + 1) OVER (PARTITION BY doc_id ORDER BY i
             |                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cs
             |  FROM (SELECT doc_id, unnest(tk) AS tok, unnest(range(1, len(tk) + 1)) AS i FROM tk2)
             |), tot AS (
             |  SELECT doc_id, SUM(len(tok)) + COUNT(*) - 1 AS total FROM p GROUP BY doc_id
             |), gg AS (
             |  SELECT doc_id, n, gram, len(gram) AS glen, gstart, gstart + len(gram) AS gend
             |  FROM (
             |    SELECT p.doc_id, ns.n,
             |           array_to_string(tk2.tk[p.i : p.i + ns.n - 1], ' ') AS gram,
             |           p.cs AS gstart
             |    FROM p JOIN tk2 USING (doc_id)
             |    CROSS JOIN (SELECT unnest([2,3,4,5,6,7,8,9,10]) AS n) ns
             |    WHERE p.i + ns.n - 1 <= len(tk2.tk)
             |  )
             |), topc AS (
             |  SELECT doc_id, n, c * glen AS chars FROM (
             |    SELECT doc_id, n, gram, glen, COUNT(*) AS c,
             |           ROW_NUMBER() OVER (PARTITION BY doc_id, n
             |             ORDER BY COUNT(*) DESC, COUNT(*) * glen DESC, gram ASC) AS rk
             |    FROM gg GROUP BY doc_id, n, gram, glen
             |  ) WHERE rk = 1 AND n IN (2, 3, 4)
             |), d AS (
             |  SELECT doc_id, n, gstart, gend FROM (
             |    SELECT doc_id, n, gstart, gend,
             |           COUNT(*) OVER (PARTITION BY doc_id, n, gram) AS cnt
             |    FROM gg WHERE n >= 5
             |  ) WHERE cnt >= 2
             |), isl AS (
             |  SELECT doc_id, n, gstart, gend,
             |         SUM(nw) OVER (PARTITION BY doc_id, n ORDER BY gstart, gend
             |                       ROWS UNBOUNDED PRECEDING) AS island
             |  FROM (
             |    SELECT *, CASE WHEN pm IS NULL OR gstart > pm THEN 1 ELSE 0 END AS nw FROM (
             |      SELECT doc_id, n, gstart, gend,
             |             MAX(gend) OVER (PARTITION BY doc_id, n ORDER BY gstart, gend
             |                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm
             |      FROM d))
             |), dupc AS (
             |  SELECT doc_id, n, SUM(span) AS chars FROM (
             |    SELECT doc_id, n, island, MAX(gend) - MIN(gstart) AS span
             |    FROM isl GROUP BY doc_id, n, island
             |  ) GROUP BY doc_id, n
             |)
             |SELECT tot.doc_id AS doc, CAST(tot.total AS BIGINT) AS n_chars_norm,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN tc.n = 2 THEN tc.chars END), 0) AS DOUBLE) / tot.total, 6) AS top_2_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN tc.n = 3 THEN tc.chars END), 0) AS DOUBLE) / tot.total, 6) AS top_3_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN tc.n = 4 THEN tc.chars END), 0) AS DOUBLE) / tot.total, 6) AS top_4_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 5 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_5_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 6 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_6_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 7 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_7_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 8 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_8_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 9 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_9_gram_frac,
             |       ROUND(CAST(COALESCE(MAX(CASE WHEN dc.n = 10 THEN dc.chars END), 0) AS DOUBLE) / tot.total, 6) AS dup_10_gram_frac
             |FROM tot LEFT JOIN topc tc USING (doc_id) LEFT JOIN dupc dc USING (doc_id)
             |GROUP BY tot.doc_id, tot.total
             |ORDER BY doc""".stripMargin)),

    // Gopher-style rule screen: every rule feature + the composite pass
    // flag; the oracle replays each feature (whole-word stopword scan in
    // its regex form, the single-match-per-alpha-word regexp count) and
    // the rounded-before-compare thresholds.
    QueryDef("p40_quality_rules",
      (s, dir) => TextAnalysis.gopherQualityRules(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", minWords = 40, minStopwordHits = 2)
        .orderBy("doc"),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |         CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_words,
             |         len(regexp_replace(TRIM(text), '\s+', '', 'g')) AS n_wchars,
             |         (len(text) - len(replace(text, '#', '')))
             |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
             |         CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS alpha_words,
             |         CAST(len(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS BIGINT) AS stopword_hits
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), g AS (
             |  SELECT doc_id AS doc, n_words,
             |         ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) AS mean_word_len,
             |         ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) AS symbol_ratio,
             |         ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) AS alpha_frac,
             |         stopword_hits
             |  FROM f
             |)
             |SELECT doc, n_words, mean_word_len, symbol_ratio, alpha_frac, stopword_hits,
             |       (n_words BETWEEN 40 AND 100000
             |        AND mean_word_len BETWEEN 3.0 AND 10.0
             |        AND symbol_ratio <= 0.1 AND alpha_frac >= 0.8
             |        AND stopword_hits >= 2) AS pass
             |FROM g ORDER BY doc""".stripMargin)),

    // Corpus statistics card: per-lang doc/token totals + exact token
    // quantiles (the operator's `exact=false` path swaps in the t-digest
    // sketch for 100 TB; the oracle pins the exact path).
    QueryDef("p41_corpus_stats",
      (s, dir) => TextAnalysis.corpusStats(
        Tables.load(s, dir, "documents").select("lang", "text"),
        "text", "lang")
        .orderBy("stratum"),
      Some("""WITH t AS (
             |  SELECT lang AS stratum,
             |         CASE WHEN text IS NOT NULL
             |              THEN CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT)
             |              ELSE 0 END AS n_toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT stratum, COUNT(*) AS n_docs,
             |       -- CAST: DuckDB SUM(BIGINT) is HUGEINT, which pandas
             |       -- renders as float64 ("3549.000000") while Spark's
             |       -- long renders "3549" — the driver's CSV hash is
             |       -- dtype-sensitive even when values are equal.
             |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
             |       ROUND(AVG(n_toks), 6) AS mean_tokens,
             |       ROUND(quantile_cont(n_toks, 0.5), 6) AS p50_tokens,
             |       ROUND(quantile_cont(n_toks, 0.9), 6) AS p90_tokens
             |FROM t GROUP BY stratum ORDER BY stratum""".stripMargin)),

    // Broadcast Bloom-filter ingest gate (BloomGate): filter built over
    // the "already ingested" two-thirds of the corpus (doc_id % 3 <> 0),
    // probed by EVERY doc map-only against the 2^18-bit bitmap riding in
    // the plan as a literal — no join on the probe side, the 100 TB
    // recrawl-dedup shape. Probing the members too makes the oracle
    // two-sided: members MUST come back true (no false negatives — the
    // soundness property), non-members false at this bit density. The
    // oracle replays FNV double-hashing bit placement exactly in BIGINT
    // low-bit arithmetic.
    QueryDef("p62_bloom_gate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        BloomGate.gate(
          docs.where(col("doc_id") % 3 =!= 0), docs, "text",
          numBits = 1 << 18, k = 4)
          .select("doc_id", "maybe_seen").orderBy("doc_id")
      },
      Some("""WITH keyed AS (
             |  SELECT doc_id,
             |         COALESCE(list_aggregate(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                                             x -> x <> ''), 'string_agg', ' '), '') AS key
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), rawh AS (
             |  SELECT doc_id,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(key)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS r1,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode('#bloom' || key)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS r2
             |  FROM keyed
             |), hashed AS (
             |  SELECT doc_id,
             |         xor(CAST(r1 // 4294967296 AS BIGINT), CAST(r1 % 4294967296 AS BIGINT)) % 262144 AS h1,
             |         xor(CAST(r2 // 4294967296 AS BIGINT), CAST(r2 % 4294967296 AS BIGINT)) % 262144 | 1 AS h2
             |  FROM rawh
             |), pos AS (
             |  SELECT doc_id, unnest([(h1 + 0 * h2) % 262144, (h1 + 1 * h2) % 262144,
             |                         (h1 + 2 * h2) % 262144, (h1 + 3 * h2) % 262144]) AS p
             |  FROM hashed
             |), built AS (
             |  SELECT DISTINCT p FROM pos WHERE doc_id % 3 <> 0
             |), hits AS (
             |  SELECT pos.doc_id, COUNT(built.p) AS nhit
             |  FROM pos LEFT JOIN built ON pos.p = built.p
             |  GROUP BY pos.doc_id
             |)
             |SELECT doc_id, nhit = 4 AS maybe_seen
             |FROM hits ORDER BY doc_id""".stripMargin)),

    // Character-distribution gibberish signals (entropySignals): Shannon
    // entropy over the codepoint histogram + top-char concentration,
    // with the screen decision on the rounded values so the oracle pins
    // the exact keep/drop frontier. Both engines evaluate the identical
    // ln-ratio expression tree (H = ln(n)/ln2 − Σ c·ln(c)/ln2 / n).
    QueryDef("p63_entropy_signals",
      (s, dir) => TextAnalysis.entropySignals(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH base AS (
             |  SELECT doc_id AS doc, COALESCE(text, '') AS t
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), ch AS (
             |  SELECT doc, unnest(string_split(t, '')) AS c
             |  FROM base WHERE len(t) > 0
             |), cnt AS (
             |  SELECT doc, c, COUNT(*) AS k FROM ch GROUP BY doc, c
             |), st AS (
             |  SELECT doc, CAST(SUM(k) AS BIGINT) AS n_cps,
             |         COUNT(*) AS distinct_chars,
             |         ROUND(CAST(MAX(k) AS DOUBLE) / CAST(SUM(k) AS DOUBLE), 6) AS top_char_frac,
             |         ROUND(LN(CAST(SUM(k) AS DOUBLE)) / LN(2)
             |               - SUM(CAST(k AS DOUBLE) * (LN(CAST(k AS DOUBLE)) / LN(2)))
             |                 / CAST(SUM(k) AS DOUBLE), 6) AS char_entropy
             |  FROM cnt GROUP BY doc
             |), allr AS (
             |  SELECT * FROM st
             |  UNION ALL
             |  SELECT doc, 0, 0, 0.0, 0.0 FROM base WHERE len(t) = 0
             |)
             |SELECT doc, n_cps, distinct_chars, top_char_frac, char_entropy,
             |       (char_entropy < 2.5 OR top_char_frac > 0.25) AS suspect
             |FROM allr ORDER BY doc""".stripMargin)),

    // KMV distinct-cardinality sketch (kmvVocabAudit → KmvKMins, a
    // native TypedImperativeAggregate): per-lang vocabulary estimate
    // from the 16 unsigned-smallest FNV hashes (k=16 so the sketch
    // FILLS on this templated small-vocab corpus and the estimator
    // branch is actually pinned, not just the under-fill passthrough),
    // next to the exact
    // count. The oracle replays the sketch with a rank filter over
    // distinct hashes — matching the k-th order statistic (and the
    // estimate derived from it) pins the aggregate's dedup, unsigned
    // ordering, and partition-merge behavior.
    QueryDef("p64_kmv_cardinality",
      (s, dir) => TextAnalysis.kmvVocabAudit(
        Tables.load(s, dir, "documents"), "lang", "text", k = 16)
        .orderBy("stratum"),
      Some("""WITH toks AS (
             |  SELECT lang AS stratum,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS tok
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), h AS (
             |  SELECT DISTINCT stratum,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS uh
             |  FROM toks
             |), r AS (
             |  SELECT stratum,
             |         CAST(CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
             |                   THEN uh - CAST('18446744073709551616' AS HUGEINT) ELSE uh END AS BIGINT) AS s,
             |         ROW_NUMBER() OVER (PARTITION BY stratum ORDER BY uh) AS rn
             |  FROM h
             |), agg AS (
             |  SELECT stratum, COUNT(*) AS n_exact FROM h GROUP BY stratum
             |), kth AS (
             |  SELECT stratum, s FROM r WHERE rn = 16
             |)
             |SELECT a.stratum, a.n_exact,
             |       CASE WHEN a.n_exact < 16 THEN a.n_exact ELSE 16 END AS n_retained,
             |       k.s AS kth_hash,
             |       ROUND(CASE WHEN k.s IS NULL THEN CAST(a.n_exact AS DOUBLE)
             |                  ELSE CAST(15 AS DOUBLE) * 1.8446744073709552e19 /
             |                       (CAST(k.s AS DOUBLE) + CASE WHEN k.s < 0 THEN 1.8446744073709552e19 ELSE 0.0 END)
             |             END, 2) AS est_distinct
             |FROM agg a LEFT JOIN kth k USING (stratum)
             |ORDER BY a.stratum""".stripMargin)),

    // DoReMi-style domain reweighting (Curation.domainReweight): domains
    // with excess self-trained-LM loss over the corpus-wide reference
    // get upweighted via the closed-form multiplicative-weights update.
    // The domain sums run on exact micro-NLL integers (the per-doc nll
    // is already rounded to 6), so both engines aggregate identical
    // BIGINTs; doubles only touch the final 5-row ratio/exp/normalize.
    QueryDef("p65_domain_reweight",
      (s, dir) => Curation.domainReweight(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("domain"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY doc, term
             |), tot AS (
             |  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
             |), stats AS (
             |  SELECT SUM(ct) AS total, COUNT(*) AS vocab FROM tot
             |), sc AS (
             |  SELECT doc, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |         ROUND(SUM(-CAST(tf AS DOUBLE) * LN(CAST(ct + 1 AS DOUBLE) / CAST(total + vocab AS DOUBLE)))
             |               / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |  FROM tf JOIN tot USING (term), stats
             |  GROUP BY doc
             |), src AS (
             |  SELECT doc_id AS doc, source AS domain
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), d AS (
             |  SELECT domain, n_tokens,
             |         CAST(ROUND(nll * 1000000) AS BIGINT) * n_tokens AS micro
             |  FROM sc JOIN src USING (doc)
             |), dom AS (
             |  SELECT domain, COUNT(*) AS n_docs,
             |         CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |         CAST(SUM(micro) AS BIGINT) AS micro
             |  FROM d GROUP BY domain
             |), tt AS (
             |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
             |         CAST(SUM(micro) AS BIGINT) AS m
             |  FROM dom
             |), x AS (
             |  SELECT domain, n_docs, dom.n_tokens,
             |         (CAST(dom.micro AS DOUBLE) / 1000000.0) / CAST(dom.n_tokens AS DOUBLE) AS ld,
             |         (CAST(tt.m AS DOUBLE) / 1000000.0) / CAST(tt.t AS DOUBLE) AS lref,
             |         CAST(dom.n_tokens AS DOUBLE) / CAST(tt.t AS DOUBLE) AS share
             |  FROM dom, tt
             |), y AS (
             |  SELECT domain, n_docs, n_tokens, ld,
             |         GREATEST(ld - lref, 0.0) AS ex,
             |         share * EXP(1.0 * GREATEST(ld - lref, 0.0)) AS numer
             |  FROM x
             |), z AS (
             |  SELECT SUM(numer) AS den FROM y
             |)
             |SELECT domain, n_docs, n_tokens,
             |       ROUND(ld, 6) AS mean_nll, ROUND(ex, 6) AS excess,
             |       ROUND(numer / den, 6) AS weight
             |FROM y, z ORDER BY domain""".stripMargin)),

    // Interpolated Kneser–Ney trigram scoring (kneserNeyTrigramNll,
    // D=0.75): the KenLM-style filter model with continuation-count
    // lower orders. The oracle replays the whole model — trigram type
    // table, history mass, follower sets, continuation counts — and the
    // identical arithmetic tree, so the hash pins smoothing, backoff
    // weights, and the no-OOV scoring path.
    QueryDef("p66_kneser_ney",
      (s, dir) => TextAnalysis.kneserNeyTrigramNll(
        Tables.load(s, dir, "documents"), "doc_id", "text")
        .orderBy("doc"),
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tw AS (
             |  SELECT doc_id,
             |         unnest(toks[1:len(toks)-2]) AS w1,
             |         unnest(toks[2:len(toks)-1]) AS w2,
             |         unnest(toks[3:len(toks)]) AS w3
             |  FROM t WHERE len(toks) >= 3
             |), tg AS (
             |  SELECT doc_id AS doc, w1, w2, w3, COUNT(*) AS tf
             |  FROM tw GROUP BY doc_id, w1, w2, w3
             |), tri AS (
             |  SELECT w1, w2, w3, SUM(tf) AS c3 FROM tg GROUP BY w1, w2, w3
             |), hist AS (
             |  SELECT w1, w2, SUM(c3) AS h, COUNT(*) AS n1f FROM tri GROUP BY w1, w2
             |), cont2 AS (
             |  SELECT w2, w3, COUNT(*) AS n1l FROM tri GROUP BY w2, w3
             |), mid AS (
             |  SELECT w2, SUM(n1l) AS midtot, COUNT(*) AS nfol2 FROM cont2 GROUP BY w2
             |), unic AS (
             |  SELECT w3, COUNT(*) AS n1c FROM cont2 GROUP BY w3
             |), st AS (
             |  SELECT COUNT(*) AS bigtypes FROM cont2
             |), model AS (
             |  SELECT tri.w1, tri.w2, tri.w3,
             |         LN(GREATEST(CAST(c3 AS DOUBLE) - 0.75, 0.0) / CAST(h AS DOUBLE)
             |            + 0.75 * CAST(n1f AS DOUBLE) / CAST(h AS DOUBLE) *
             |              (GREATEST(CAST(n1l AS DOUBLE) - 0.75, 0.0) / CAST(midtot AS DOUBLE)
             |               + 0.75 * CAST(nfol2 AS DOUBLE) / CAST(midtot AS DOUBLE) *
             |                 (CAST(n1c AS DOUBLE) / CAST(bigtypes AS DOUBLE)))) AS lp
             |  FROM tri JOIN hist USING (w1, w2) JOIN cont2 USING (w2, w3)
             |       JOIN mid USING (w2) JOIN unic USING (w3), st
             |)
             |SELECT doc, CAST(SUM(tf) AS BIGINT) AS n_trigrams,
             |       ROUND(SUM(-CAST(tf AS DOUBLE) * lp) / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |FROM tg JOIN model USING (w1, w2, w3)
             |GROUP BY doc ORDER BY doc""".stripMargin)),

    // Deterministic weighted sampling without replacement
    // (Curation.prioritySample, Efraimidis–Spirakis A-ES): 64 docs drawn
    // ∝ token count, uniforms derived from the portable FNV hash so the
    // draw replays on any engine. u = (low53 + 0.5)/2^53 is exact double
    // arithmetic; the ranking key is the 6-rounded ln(u)/w with id
    // tie-break, so last-ulp ln() divergence can't move the frontier.
    QueryDef("p67_priority_sample",
      (s, dir) => Curation.prioritySample(
        Tables.load(s, dir, "documents")
          .where(col("text").isNotNull)
          .select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", k = 64)
        .orderBy(col("sample_key").desc, col("doc_id")),
      Some("""WITH w AS (
             |  SELECT doc_id, source,
             |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE text IS NOT NULL
             |), h AS (
             |  SELECT doc_id, source, n_tokens,
             |         CAST(list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(CAST(doc_id AS VARCHAR) || '#es')), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) % 9007199254740992 AS BIGINT) AS low53
             |  FROM w
             |)
             |SELECT doc_id, source, n_tokens,
             |       ROUND(LN((CAST(low53 AS DOUBLE) + 0.5) / 9007199254740992.0)
             |             / CAST(n_tokens AS DOUBLE), 6) AS sample_key
             |FROM h
             |ORDER BY sample_key DESC, doc_id LIMIT 64""".stripMargin)),

    // Count-Min Sketch token-frequency audit (cmsTokenFrequencies →
    // CmsSketch, a native TypedImperativeAggregate): depth=3, width=32
    // — small enough that the 31-term corpus vocabulary collides, so
    // the CMS OVERESTIMATE is live and the oracle pins the exact
    // collision pattern (cell sums + min-across-rows), not a vacuous
    // est==exact identity. All integer arithmetic — no float anywhere.
    QueryDef("p68_cms_frequencies",
      (s, dir) => TextAnalysis.cmsTokenFrequencies(
        Tables.load(s, dir, "documents"), "text", depth = 3, width = 32)
        .orderBy("term"),
      Some("""WITH tt AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS tok
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), hr AS (
             |  SELECT DISTINCT tok,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS r1,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode('#cms' || tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS r2
             |  FROM tt
             |), hd AS (
             |  SELECT tok,
             |         xor(CAST(r1 // 4294967296 AS BIGINT), CAST(r1 % 4294967296 AS BIGINT)) % 32 AS h1,
             |         xor(CAST(r2 // 4294967296 AS BIGINT), CAST(r2 % 4294967296 AS BIGINT)) % 32 | 1 AS h2
             |  FROM hr
             |), posmap AS (
             |  SELECT tok, i.i AS i, (h1 + i.i * h2) % 32 AS p
             |  FROM hd CROSS JOIN (SELECT unnest(range(0, 3)) AS i) i
             |), cnt AS (
             |  SELECT tok, COUNT(*) AS n_exact FROM tt GROUP BY tok
             |), cells AS (
             |  SELECT i, p, CAST(SUM(n_exact) AS BIGINT) AS c
             |  FROM posmap JOIN cnt USING (tok) GROUP BY i, p
             |), est AS (
             |  SELECT pm.tok, MIN(cells.c) AS n_est
             |  FROM posmap pm JOIN cells ON pm.i = cells.i AND pm.p = cells.p
             |  GROUP BY pm.tok
             |)
             |SELECT cnt.tok AS term, cnt.n_exact, est.n_est
             |FROM cnt JOIN est ON cnt.tok = est.tok
             |ORDER BY term""".stripMargin)),

    // Cross-source shingle-overlap matrix (Dedup.sourceOverlapMatrix):
    // shared 8-shingle types + both directed containments per source
    // pair — the dedup-planning card. k=3 here: at sf0.01 the corpus is
    // templated enough that 3-shingles actually cross sources, so the
    // matrix is dense and the containment arithmetic is live.
    QueryDef("p69_source_overlap",
      (s, dir) => Dedup.sourceOverlapMatrix(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source", k = 3)
        .orderBy("src_a", "src_b"),
      Some("""WITH t AS (
             |  SELECT doc_id, source,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), s AS (
             |  SELECT DISTINCT source AS src,
             |         unnest(list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                             i -> list_aggregate(toks[i:i+2], 'string_agg', ' ')))) AS shingle
             |  FROM t WHERE len(toks) >= 3
             |), per AS (
             |  SELECT src, COUNT(*) AS n FROM s GROUP BY src
             |), pairs AS (
             |  SELECT a.src AS src_a, b.src AS src_b, COUNT(*) AS shared
             |  FROM s a JOIN s b ON a.shingle = b.shingle AND a.src < b.src
             |  GROUP BY a.src, b.src
             |)
             |SELECT src_a, src_b, shared, pa.n AS n_a, pb.n AS n_b,
             |       ROUND(CAST(shared AS DOUBLE) / CAST(pa.n AS DOUBLE), 6) AS containment_a,
             |       ROUND(CAST(shared AS DOUBLE) / CAST(pb.n AS DOUBLE), 6) AS containment_b
             |FROM pairs JOIN per pa ON src_a = pa.src JOIN per pb ON src_b = pb.src
             |ORDER BY src_a, src_b""".stripMargin)),

    // End-to-end mixture composition (Curation.composeMixture): DoReMi
    // weights → cumulative-quota integer apportionment (telescopes to
    // exactly the 200-doc budget, pure BIGINT floor division) → the
    // per-domain (idGate, id)-ordered selection. The oracle replays the
    // entire chain, so the hash pins weights, apportionment boundaries,
    // and the selection frontier in one compare.
    QueryDef("p70_mixture_compose",
      (s, dir) => Curation.composeMixture(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source",
        budgetDocs = 200L)
        .orderBy("doc"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM toks GROUP BY doc, term
             |), tot AS (
             |  SELECT term, SUM(tf) AS ct FROM tf GROUP BY term
             |), stats AS (
             |  SELECT SUM(ct) AS total, COUNT(*) AS vocab FROM tot
             |), sc AS (
             |  SELECT doc, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             |         ROUND(SUM(-CAST(tf AS DOUBLE) * LN(CAST(ct + 1 AS DOUBLE) / CAST(total + vocab AS DOUBLE)))
             |               / CAST(SUM(tf) AS DOUBLE), 6) AS nll
             |  FROM tf JOIN tot USING (term), stats
             |  GROUP BY doc
             |), src AS (
             |  SELECT doc_id AS doc, source AS domain
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), d AS (
             |  SELECT domain, n_tokens,
             |         CAST(ROUND(nll * 1000000) AS BIGINT) * n_tokens AS micro
             |  FROM sc JOIN src USING (doc)
             |), dom AS (
             |  SELECT domain, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |         CAST(SUM(micro) AS BIGINT) AS micro
             |  FROM d GROUP BY domain
             |), tt AS (
             |  SELECT CAST(SUM(n_tokens) AS BIGINT) AS t,
             |         CAST(SUM(micro) AS BIGINT) AS m
             |  FROM dom
             |), x AS (
             |  SELECT domain,
             |         (CAST(dom.micro AS DOUBLE) / 1000000.0) / CAST(dom.n_tokens AS DOUBLE) AS ld,
             |         (CAST(tt.m AS DOUBLE) / 1000000.0) / CAST(tt.t AS DOUBLE) AS lref,
             |         CAST(dom.n_tokens AS DOUBLE) / CAST(tt.t AS DOUBLE) AS share
             |  FROM dom, tt
             |), y AS (
             |  SELECT domain,
             |         share * EXP(1.0 * GREATEST(ld - lref, 0.0)) AS numer
             |  FROM x
             |), z AS (
             |  SELECT SUM(numer) AS den FROM y
             |), w6 AS (
             |  SELECT domain,
             |         CAST(ROUND(ROUND(numer / den, 6) * 1000000) AS BIGINT) AS micro
             |  FROM y, z
             |), cumw AS (
             |  SELECT domain, micro,
             |         SUM(micro) OVER (ORDER BY domain
             |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             |         SUM(micro) OVER () AS tot
             |  FROM w6
             |), tgt AS (
             |  SELECT domain,
             |         (200 * cum) // tot - (200 * (cum - micro)) // tot AS target
             |  FROM cumw
             |), keyed AS (
             |  SELECT doc_id AS doc, source AS domain,
             |         ((doc_id % 100000) * 2654435761) % 1000000 AS gate
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), ranked AS (
             |  SELECT doc, domain,
             |         ROW_NUMBER() OVER (PARTITION BY domain ORDER BY gate, doc) AS rk
             |  FROM keyed
             |)
             |SELECT doc, domain FROM ranked JOIN tgt USING (domain)
             |WHERE rk <= target ORDER BY doc""".stripMargin)),

    // Per-rule drop attribution for the Gopher screen (Dolma-style
    // filter audit): per rule, docs failed, docs failed by THIS RULE
    // ALONE, and the corpus fail fraction, next to the total drop
    // count. One map-side-combined global aggregate; the oracle
    // replays the p40 feature tree, the per-rule flags, and the
    // unique-attribution arithmetic.
    QueryDef("p71_filter_attribution",
      (s, dir) => TextAnalysis.filterAttribution(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", minWords = 40, minStopwordHits = 2)
        .orderBy("rule"),
      Some("""WITH f AS (
             |  SELECT doc_id,
             |         CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_words,
             |         len(regexp_replace(TRIM(text), '\s+', '', 'g')) AS n_wchars,
             |         (len(text) - len(replace(text, '#', '')))
             |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
             |         CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS alpha_words,
             |         CAST(len(regexp_extract_all(lower(text), '\b(the|be|to|of|and|that|have|with)\b')) AS BIGINT) AS stopword_hits
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), g AS (
             |  SELECT doc_id AS doc, n_words,
             |         ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) AS mean_word_len,
             |         ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) AS symbol_ratio,
             |         ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) AS alpha_frac,
             |         stopword_hits
             |  FROM f
             |), fl AS (
             |  SELECT doc,
             |         (alpha_frac < 0.8) AS f_alpha_frac,
             |         NOT (mean_word_len BETWEEN 3.0 AND 10.0) AS f_mean_word_len,
             |         (stopword_hits < 2) AS f_stopword_hits,
             |         (symbol_ratio > 0.1) AS f_symbol_ratio,
             |         NOT (n_words BETWEEN 40 AND 100000) AS f_words_range
             |  FROM g
             |), c AS (
             |  SELECT *,
             |         CAST(f_alpha_frac AS INT) + CAST(f_mean_word_len AS INT)
             |           + CAST(f_stopword_hits AS INT) + CAST(f_symbol_ratio AS INT)
             |           + CAST(f_words_range AS INT) AS nf
             |  FROM fl
             |), tot AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             |         CAST(COUNT(*) FILTER (nf > 0) AS BIGINT) AS n_dropped,
             |         CAST(COUNT(*) FILTER (f_alpha_frac) AS BIGINT) AS s_alpha,
             |         CAST(COUNT(*) FILTER (f_alpha_frac AND nf = 1) AS BIGINT) AS u_alpha,
             |         CAST(COUNT(*) FILTER (f_mean_word_len) AS BIGINT) AS s_mwl,
             |         CAST(COUNT(*) FILTER (f_mean_word_len AND nf = 1) AS BIGINT) AS u_mwl,
             |         CAST(COUNT(*) FILTER (f_stopword_hits) AS BIGINT) AS s_stop,
             |         CAST(COUNT(*) FILTER (f_stopword_hits AND nf = 1) AS BIGINT) AS u_stop,
             |         CAST(COUNT(*) FILTER (f_symbol_ratio) AS BIGINT) AS s_sym,
             |         CAST(COUNT(*) FILTER (f_symbol_ratio AND nf = 1) AS BIGINT) AS u_sym,
             |         CAST(COUNT(*) FILTER (f_words_range) AS BIGINT) AS s_words,
             |         CAST(COUNT(*) FILTER (f_words_range AND nf = 1) AS BIGINT) AS u_words
             |  FROM c
             |), rules AS (
             |  SELECT 'alpha_frac' AS rule, s_alpha AS n_failed, u_alpha AS n_unique, n_docs, n_dropped FROM tot
             |  UNION ALL SELECT 'mean_word_len', s_mwl, u_mwl, n_docs, n_dropped FROM tot
             |  UNION ALL SELECT 'stopword_hits', s_stop, u_stop, n_docs, n_dropped FROM tot
             |  UNION ALL SELECT 'symbol_ratio', s_sym, u_sym, n_docs, n_dropped FROM tot
             |  UNION ALL SELECT 'words_range', s_words, u_words, n_docs, n_dropped FROM tot
             |)
             |SELECT rule, n_failed, n_unique,
             |       ROUND(CAST(n_failed AS DOUBLE) / CAST(n_docs AS DOUBLE), 6) AS fail_frac,
             |       n_docs, n_dropped
             |FROM rules ORDER BY rule""".stripMargin)),

    // Canonical-document selection: near-dup clusters (p13's LSH →
    // connected components, same total-recall argument) keep the max-
    // quality member instead of the min id. Oracle: quality replay (the
    // p10 score tree) + recursive-CTE components + ROW_NUMBER argmax —
    // the hash compare pins the exact keep frontier including quality
    // ties broken by id.
    QueryDef("p72_canonical_selection",
      (s, dir) => Dedup.canonicalByQuality(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
        .orderBy("cluster"),
      Some(s"""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), ${ccDedupTail("0.12")}, qf AS (
             |  SELECT doc_id, text,
             |         LENGTH(text) AS n_chars,
             |         string_split_regex(TRIM(text), '\\s+') AS words
             |  FROM corpus
             |), q AS (
             |  SELECT doc_id,
             |         ROUND(((LEAST(CAST(LEN(words) AS DOUBLE) / 20.0, 1.0)
             |           * CASE WHEN CAST(LEN(regexp_extract_all(text, '[\\.,;:!\\?''"()\\[\\]{}-]')) AS DOUBLE)
             |                       / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.5 END)
             |           * CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             |                       / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1.0 ELSE 0.5 END) * 0.5
             |           + (CAST(LEN(list_distinct(words)) AS DOUBLE) / CAST(GREATEST(LEN(words), 1) AS DOUBLE)) * 0.5, 4) AS quality
             |  FROM qf
             |), lab AS (
             |  SELECT c.doc_id AS doc, COALESCE(l.label, c.doc_id) AS cluster
             |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc
             |), r AS (
             |  SELECT lab.cluster, lab.doc, q.quality,
             |         ROW_NUMBER() OVER (PARTITION BY lab.cluster
             |                            ORDER BY q.quality DESC, lab.doc ASC) AS rn,
             |         COUNT(*) OVER (PARTITION BY lab.cluster) AS n_members
             |  FROM lab JOIN q ON lab.doc = q.doc_id
             |)
             |SELECT cluster, n_members, doc AS kept_doc, quality AS kept_score
             |FROM r WHERE rn = 1 ORDER BY cluster""".stripMargin)),

    // Domain-interleaved length curriculum: rank easy→hard within each
    // domain, round-robin across domains. order_idx is computed
    // per-row (rank·n_domains + domain_idx) — no global sort. Oracle
    // replays the rank and the interleave arithmetic.
    QueryDef("p73_curriculum_order",
      (s, dir) => Curation.curriculumOrder(
        Tables.load(s, dir, "documents"), "doc_id", "text", "source")
        .orderBy("doc"),
      Some("""WITH base AS (
             |  SELECT doc_id AS doc, source AS domain,
             |         CAST(len(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS difficulty
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), d AS (
             |  SELECT domain, CAST(ROW_NUMBER() OVER (ORDER BY domain) - 1 AS BIGINT) AS didx
             |  FROM (SELECT DISTINCT domain FROM base)
             |), n AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS ndom FROM d
             |), r AS (
             |  SELECT base.doc, base.domain, base.difficulty, d.didx,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY base.domain
             |                                 ORDER BY base.difficulty ASC, base.doc ASC) - 1 AS BIGINT) AS rk
             |  FROM base JOIN d USING (domain)
             |)
             |SELECT doc, domain, difficulty,
             |       rk * (SELECT ndom FROM n) + didx AS order_idx
             |FROM r ORDER BY doc""".stripMargin)),

    // Corpus snapshot diff: id-keyed full outer join of FNV-1a64
    // content hashes → added/removed/changed/unchanged per doc. The
    // "old" snapshot drops doc_id % 17 = 3, the "new" one revises
    // doc_id % 13 = 5 — so all four statuses occur and the oracle
    // (byte-fold FNV replay) pins each frontier.
    QueryDef("p74_corpus_diff",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val oldSnap = docs.where(pmod(col("doc_id"), lit(17)) =!= 3)
        val newSnap = docs.withColumn("text",
          when(pmod(col("doc_id"), lit(13)) === 5,
            concat(col("text"), lit(" [rev2]"))).otherwise(col("text")))
        Curation.corpusDiff(oldSnap, newSnap, "doc_id", "text")
          .orderBy("doc")
      },
      Some("""WITH o AS (
             |  SELECT doc_id AS doc,
             |         CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
             |                   THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS old_hash
             |  FROM (
             |    SELECT doc_id,
             |           list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(text)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS h
             |    FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 17 <> 3
             |  )
             |), n AS (
             |  SELECT doc_id AS doc,
             |         CAST(CASE WHEN h >= CAST('9223372036854775808' AS HUGEINT)
             |                   THEN h - CAST('18446744073709551616' AS HUGEINT) ELSE h END AS BIGINT) AS new_hash
             |  FROM (
             |    SELECT doc_id,
             |           list_reduce(
             |             list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                          list_transform(regexp_extract_all(hex(encode(
             |                            CASE WHEN doc_id % 13 = 5 THEN text || ' [rev2]' ELSE text END)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |             (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                          * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS h
             |    FROM read_parquet('{SFDIR}/documents.parquet')
             |  )
             |)
             |SELECT COALESCE(o.doc, n.doc) AS doc, o.old_hash, n.new_hash,
             |       CASE WHEN o.doc IS NULL THEN 'added'
             |            WHEN n.doc IS NULL THEN 'removed'
             |            WHEN o.old_hash = n.new_hash THEN 'unchanged'
             |            ELSE 'changed' END AS status
             |FROM o FULL JOIN n ON o.doc = n.doc ORDER BY doc""".stripMargin)),

    // Pairwise token co-occurrence + PMI under Apriori support pruning
    // (minSupport = 300 docs excludes the rare tail of this corpus's
    // vocabulary, so the broadcast frequent-token prune is exercised,
    // not a no-op). Oracle replays doc frequencies, the prune, the
    // pair counts, and the ln-ratio PMI on exact BIGINTs.
    QueryDef("p75_token_pmi",
      (s, dir) => TextAnalysis.cooccurrencePmi(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        minSupport = 300L)
        .orderBy("tok_a", "tok_b"),
      Some("""WITH dt AS (
             |  SELECT DISTINCT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS tok
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dfreq AS (
             |  SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dt GROUP BY tok
             |), freq AS (
             |  SELECT * FROM dfreq WHERE df >= 300
             |), pruned AS (
             |  SELECT dt.doc, dt.tok, freq.df FROM dt JOIN freq USING (tok)
             |), pairs AS (
             |  SELECT a.tok AS tok_a, b.tok AS tok_b,
             |         CAST(COUNT(*) AS BIGINT) AS n_ab,
             |         a.df AS df_a, b.df AS df_b
             |  FROM pruned a JOIN pruned b ON a.doc = b.doc AND a.tok < b.tok
             |  GROUP BY a.tok, b.tok, a.df, b.df
             |  HAVING COUNT(*) >= 300
             |), nd AS (
             |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT tok_a, tok_b, n_ab, df_a, df_b,
             |       ROUND(LN(CAST(n_ab AS DOUBLE) * CAST(n_docs AS DOUBLE)
             |                / (CAST(df_a AS DOUBLE) * CAST(df_b AS DOUBLE))), 6) AS pmi
             |FROM pairs, nd ORDER BY tok_a, tok_b""".stripMargin)),

    // Winnowing fingerprint overlap (Schleimer et al. 2003): k=4-token
    // grams, window w=5, rightmost-minimal selection via the packed
    // h31·2³²+(2³²−1−pos) key, docs sharing ≥2 distinct fingerprints.
    // Oracle replays gram construction, the FNV low-31 hash, the
    // windowed min, the selection frontier, and the pair counts.
    QueryDef("p76_winnow_fingerprint",
      (s, dir) => Dedup.winnowOverlapPairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        k = 4, w = 5, minShared = 2)
        .orderBy("doc_a", "doc_b"),
      Some("""WITH base AS (
             |  SELECT doc_id AS doc,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), g AS (
             |  SELECT doc,
             |         unnest(list_transform(range(1, len(toks) - 4 + 2),
             |                               i -> list_aggregate(toks[i:i+3], 'string_agg', ' '))) AS gram,
             |         unnest(range(0, len(toks) - 4 + 1)) AS pos
             |  FROM base WHERE len(toks) >= 4
             |), h AS (
             |  SELECT doc, pos,
             |         CAST(list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(gram)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) % 2147483648 AS BIGINT) AS h31
             |  FROM g
             |), keyd AS (
             |  SELECT doc, pos, h31 * 4294967296 + (4294967295 - pos) AS key FROM h
             |), wm AS (
             |  SELECT doc, pos,
             |         MIN(key) OVER (PARTITION BY doc ORDER BY pos
             |                        ROWS BETWEEN CURRENT ROW AND 4 FOLLOWING) AS wmin,
             |         COUNT(*) OVER (PARTITION BY doc) AS n_g
             |  FROM keyd
             |), sel AS (
             |  SELECT DISTINCT doc, wmin // 4294967296 AS fp
             |  FROM wm WHERE pos <= GREATEST(n_g - 5, 0)
             |)
             |SELECT a.doc AS doc_a, b.doc AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_shared
             |FROM sel a JOIN sel b ON a.fp = b.fp AND a.doc < b.doc
             |GROUP BY a.doc, b.doc
             |HAVING COUNT(*) >= 2
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Perceptual-hash image near-dup: REAL PNG payloads (patternedAssets
    // writes them, ImageIO decodes them back — PNG is lossless) hashed
    // with the fixed-point integer DCT pHash, then the same banded
    // Hamming join the text simhash uses. The oracle regenerates the
    // pixels from the integer (id,x,y) formula, replays the ENTIRE
    // hash (2×2 cell sums, both DCT passes on the inlined fixed-point
    // basis, the 32nd-order-statistic median, the bit pack) and does
    // all-pairs Hamming ≤ 4 — equal output proves decode fidelity plus
    // hash semantics plus the band layout's total-recall guarantee.
    QueryDef("p77_image_phash",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").where(col("doc_id") < 108)
        val assets = Multimodal.patternedAssets(s, docs, "doc_id")
        Multimodal.imageNearDups(s, assets, maxHamming = 4)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ids AS (
             |  SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id < 108
             |), xs AS (SELECT unnest(range(0, 64)) AS x
             |), ys AS (SELECT unnest(range(0, 64)) AS y
             |), px AS (
             |  SELECT id, x, y,
             |         LEAST(255, GREATEST(0,
             |           40
             |           + ((x // ([8,16,32])[CAST(id % 9 AS INT) % 3 + 1]
             |               + y // ([32,16,8])[CAST((id % 9) // 3 AS INT) % 3 + 1]) % 2) * 120
             |           + (((x * y * ((id % 9) + 3)) // 7) % 48)
             |           + CASE WHEN x >= (id * 31) % 62 AND x < (id * 31) % 62 + 2
             |                   AND y >= (id * 17) % 62 AND y < (id * 17) % 62 + 2
             |                  THEN 16 ELSE 0 END)) AS g
             |  FROM ids, xs, ys
             |), cell AS (
             |  SELECT id, x // 2 AS cx, y // 2 AS cy, CAST(SUM(g) AS BIGINT) AS s
             |  FROM px GROUP BY 1, 2, 3
             |), kt AS (
             |  SELECT CAST(xx.x AS INT) AS x, CAST(uu.u AS INT) AS u,
             |         ($dctTableSql)[CAST(xx.x AS INT) + 1][CAST(uu.u AS INT) + 1] AS kv
             |  FROM (SELECT unnest(range(0, 32)) AS x) xx,
             |       (SELECT unnest(range(0, 8)) AS u) uu
             |), t AS (
             |  SELECT cell.id, kt.u, cell.cy, CAST(SUM(cell.s * kt.kv) AS BIGINT) AS tv
             |  FROM cell JOIN kt ON kt.x = cell.cx GROUP BY 1, 2, 3
             |), cc AS (
             |  SELECT t.id, t.u, kt.u AS v, CAST(SUM(t.tv * kt.kv) AS BIGINT) AS cv
             |  FROM t JOIN kt ON kt.x = t.cy GROUP BY 1, 2, 3
             |), med AS (
             |  SELECT id, cv AS m FROM (
             |    SELECT id, cv, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cv) AS rn
             |    FROM cc WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32
             |), fph AS (
             |  SELECT cc.id,
             |         SUM(CASE WHEN NOT (u = 0 AND v = 0) AND cv > m
             |                  THEN CAST(1 AS HUGEINT) << CAST(8 * u + v AS INT)
             |                  ELSE CAST(0 AS HUGEINT) END) AS ufp
             |  FROM cc JOIN med USING (id) GROUP BY cc.id
             |), fps AS (
             |  SELECT id, CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
             |                       THEN ufp - CAST('18446744073709551616' AS HUGEINT)
             |                       ELSE ufp END AS BIGINT) AS sfp
             |  FROM fph
             |)
             |SELECT a.id AS doc_a, b.id AS doc_b,
             |       CAST(bit_count(xor(a.sfp, b.sfp)) AS INTEGER) AS hamming
             |FROM fps a JOIN fps b ON a.id < b.id
             |WHERE bit_count(xor(a.sfp, b.sfp)) <= 4
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Audio spectral-fingerprint matching: REAL WAV payloads (toneAssets
    // writes true WAVE containers, the JDK sound API decodes them back —
    // PCM is lossless) framed into 256-sample windows, per-frame
    // dominant peak over the fixed-point integer DFT bins, pairs
    // agreeing on ≥5 of 6 frame peaks. The oracle regenerates the
    // samples from the integer triangle-wave formula and replays the
    // DFT powers on the inlined basis, the argmax (ties → lowest bin),
    // and the landmark match join.
    QueryDef("p78_audio_fingerprint",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").where(col("doc_id") < 96)
        val assets = Multimodal.toneAssets(s, docs, "doc_id")
        Multimodal.audioMatches(s, assets, minFrames = 5)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ids AS (
             |  SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id < 96
             |), par AS (
             |  SELECT id, ([32,48,64,96,128,192])[CAST(id % 6 AS INT) + 1] AS P FROM ids
             |), ts AS (SELECT unnest(range(0, 1536)) AS t
             |), sm AS (
             |  SELECT id, t // 256 AS frame, t % 256 AS tt,
             |         CASE WHEN ((t + id * 13) % P) < P // 2
             |              THEN -8192 + (4 * 8192 * ((t + id * 13) % P)) // P
             |              ELSE 3 * 8192 - (4 * 8192 * ((t + id * 13) % P)) // P END AS s
             |  FROM par, ts
             |), ct AS (
             |  SELECT CAST(tx.t AS INT) AS tt, CAST(kk.k AS INT) AS k,
             |         ($dftCosSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS cq,
             |         ($dftSinSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS sq
             |  FROM (SELECT unnest(range(0, 256)) AS t) tx,
             |       (SELECT unnest(range(1, 9)) AS k) kk
             |), sp AS (
             |  SELECT sm.id, sm.frame, ct.k,
             |         CAST(SUM(sm.s * ct.cq) AS BIGINT) AS sc,
             |         CAST(SUM(sm.s * ct.sq) AS BIGINT) AS ss
             |  FROM sm JOIN ct ON ct.tt = sm.tt GROUP BY 1, 2, 3
             |), pk AS (
             |  SELECT id, frame, k AS peak_bin FROM (
             |    SELECT id, frame, k,
             |           ROW_NUMBER() OVER (PARTITION BY id, frame
             |                              ORDER BY sc * sc + ss * ss DESC, k ASC) AS rn
             |    FROM sp) WHERE rn = 1
             |)
             |SELECT a.id AS doc_a, b.id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_matched
             |FROM pk a JOIN pk b
             |  ON a.frame = b.frame AND a.peak_bin = b.peak_bin AND a.id < b.id
             |GROUP BY a.id, b.id
             |HAVING COUNT(*) >= 5
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // Video near-dup via frame-sampled pHash over REAL AVI containers:
    // RIFF hdrl/movi/idx1 layout walked by a real parser, frames stored
    // as uncompressed BI_RGB DIB (lossless — the standard raw-video AVI
    // form, so the oracle regenerates the EXACT decoded pixels; the
    // MJPEG form of the same container is spec-driven, JPEG being
    // lossy). Every 2nd frame hashed with the same fixed-point DCT
    // pHash, videos pairing on ≥3 of 4 sampled frames within Hamming 4.
    // Oracle regenerates each sampled frame's pixels from the
    // (id, f, x, y) formula and replays the full per-frame hash +
    // frame-wise all-pairs Hamming + the match-count frontier (banding
    // recall is total, as in p03/p77).
    QueryDef("p79_video_neardup",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").where(col("doc_id") < 72)
        val assets = Multimodal.videoAssets(s, docs, "doc_id")
        Multimodal.videoNearDups(s, assets, maxHamming = 4, everyN = 2, minFrames = 3)
          .orderBy("doc_a", "doc_b")
      },
      Some(s"""WITH ids AS (
             |  SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id < 72
             |), fr AS (SELECT unnest([0, 2, 4, 6]) AS f
             |), vids AS (
             |  SELECT id, f, (id % 6) + 9 * (id * 8 + f) AS vid FROM ids, fr
             |), xs AS (SELECT unnest(range(0, 64)) AS x
             |), ys AS (SELECT unnest(range(0, 64)) AS y
             |), px AS (
             |  SELECT id, f, x, y,
             |         LEAST(255, GREATEST(0,
             |           40
             |           + ((x // ([8,16,32])[CAST(vid % 9 AS INT) % 3 + 1]
             |               + y // ([32,16,8])[CAST((vid % 9) // 3 AS INT) % 3 + 1]) % 2) * 120
             |           + (((x * y * ((vid % 9) + 3)) // 7) % 48)
             |           + CASE WHEN x >= (vid * 31) % 62 AND x < (vid * 31) % 62 + 2
             |                   AND y >= (vid * 17) % 62 AND y < (vid * 17) % 62 + 2
             |                  THEN 16 ELSE 0 END)) AS g
             |  FROM vids, xs, ys
             |), cell AS (
             |  SELECT id, f, x // 2 AS cx, y // 2 AS cy, CAST(SUM(g) AS BIGINT) AS s
             |  FROM px GROUP BY 1, 2, 3, 4
             |), kt AS (
             |  SELECT CAST(xx.x AS INT) AS x, CAST(uu.u AS INT) AS u,
             |         ($dctTableSql)[CAST(xx.x AS INT) + 1][CAST(uu.u AS INT) + 1] AS kv
             |  FROM (SELECT unnest(range(0, 32)) AS x) xx,
             |       (SELECT unnest(range(0, 8)) AS u) uu
             |), t AS (
             |  SELECT cell.id, cell.f, kt.u, cell.cy, CAST(SUM(cell.s * kt.kv) AS BIGINT) AS tv
             |  FROM cell JOIN kt ON kt.x = cell.cx GROUP BY 1, 2, 3, 4
             |), cc AS (
             |  SELECT t.id, t.f, t.u, kt.u AS v, CAST(SUM(t.tv * kt.kv) AS BIGINT) AS cv
             |  FROM t JOIN kt ON kt.x = t.cy GROUP BY 1, 2, 3, 4
             |), med AS (
             |  SELECT id, f, cv AS m FROM (
             |    SELECT id, f, cv, ROW_NUMBER() OVER (PARTITION BY id, f ORDER BY cv) AS rn
             |    FROM cc WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32
             |), fph AS (
             |  SELECT cc.id, cc.f,
             |         SUM(CASE WHEN NOT (u = 0 AND v = 0) AND cv > m
             |                  THEN CAST(1 AS HUGEINT) << CAST(8 * u + v AS INT)
             |                  ELSE CAST(0 AS HUGEINT) END) AS ufp
             |  FROM cc JOIN med USING (id, f) GROUP BY cc.id, cc.f
             |), fps AS (
             |  SELECT id, f, CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
             |                          THEN ufp - CAST('18446744073709551616' AS HUGEINT)
             |                          ELSE ufp END AS BIGINT) AS sfp
             |  FROM fph
             |), fm AS (
             |  SELECT a.f, a.id AS doc_a, b.id AS doc_b
             |  FROM fps a JOIN fps b ON a.f = b.f AND a.id < b.id
             |  WHERE bit_count(xor(a.sfp, b.sfp)) <= 4
             |)
             |SELECT doc_a, doc_b, CAST(COUNT(*) AS BIGINT) AS n_frames
             |FROM fm GROUP BY 1, 2
             |HAVING COUNT(*) >= 3
             |ORDER BY doc_a, doc_b""".stripMargin)),

    // The COMPOSED multimodal curation loop, end to end as one job:
    // WebDataset tar shards in (key.png + key.wav per sample, real PNG
    // and WAV bytes) → JDK decode → image pHash near-dups ∩ audio
    // landmark matches (a pair is a duplicate only when BOTH modalities
    // agree) → connected components → min-id canonical per cluster →
    // curated tar shards + manifest OUT — and the checked frame is read
    // back from the published output, so a green hash proves the whole
    // loop including the tar round trip. The oracle replays the p77
    // pixel/DCT/median/bit-pack pipeline and the p78 triangle/DFT/argmax
    // pipeline verbatim, intersects the pair sets, runs recursive-CTE
    // components, and reproduces the canonical frontier. Fixture
    // geometry: image class = id % 9, audio class = id % 6 → multimodal
    // duplicates agree mod 18, so the 96 docs collapse to 18 clusters.
    QueryDef("p115_multimodal_curate",
      (s, dir) => {
        val scratch = s"target/graft-tmp/mmcurate_p115_${math.abs(dir.hashCode)}"
        val docs = Tables.load(s, dir, "documents")
          .where(col("doc_id") < 96).select("doc_id")
        val png = Multimodal.patternedAssets(s, docs, "doc_id").toDF()
          .select(col("asset_id").as("id"), col("data").as("png"))
        val wav = Multimodal.toneAssets(s, docs, "doc_id").toDF()
          .select(col("asset_id").as("id"), col("data").as("wav"))
        val input = png.join(wav, "id")
          .select(col("id").cast("string").as("key"), col("png"), col("wav"))
        graft.sources.WebDataset.writeShards(input, "key",
          Seq("png" -> col("png"), "wav" -> col("wav")), s"$scratch/in", shards = 4)
        Multimodal.curateShards(s, s"$scratch/in", s"$scratch/out")
          .orderBy("doc")
      },
      Some(s"""WITH RECURSIVE ids AS (
             |  SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id < 96
             |), xs AS (SELECT unnest(range(0, 64)) AS x
             |), ys AS (SELECT unnest(range(0, 64)) AS y
             |), px AS (
             |  SELECT id, x, y,
             |         LEAST(255, GREATEST(0,
             |           40
             |           + ((x // ([8,16,32])[CAST(id % 9 AS INT) % 3 + 1]
             |               + y // ([32,16,8])[CAST((id % 9) // 3 AS INT) % 3 + 1]) % 2) * 120
             |           + (((x * y * ((id % 9) + 3)) // 7) % 48)
             |           + CASE WHEN x >= (id * 31) % 62 AND x < (id * 31) % 62 + 2
             |                   AND y >= (id * 17) % 62 AND y < (id * 17) % 62 + 2
             |                  THEN 16 ELSE 0 END)) AS g
             |  FROM ids, xs, ys
             |), cell AS (
             |  SELECT id, x // 2 AS cx, y // 2 AS cy, CAST(SUM(g) AS BIGINT) AS s
             |  FROM px GROUP BY 1, 2, 3
             |), kt AS (
             |  SELECT CAST(xx.x AS INT) AS x, CAST(uu.u AS INT) AS u,
             |         ($dctTableSql)[CAST(xx.x AS INT) + 1][CAST(uu.u AS INT) + 1] AS kv
             |  FROM (SELECT unnest(range(0, 32)) AS x) xx,
             |       (SELECT unnest(range(0, 8)) AS u) uu
             |), t AS (
             |  SELECT cell.id, kt.u, cell.cy, CAST(SUM(cell.s * kt.kv) AS BIGINT) AS tv
             |  FROM cell JOIN kt ON kt.x = cell.cx GROUP BY 1, 2, 3
             |), cc AS (
             |  SELECT t.id, t.u, kt.u AS v, CAST(SUM(t.tv * kt.kv) AS BIGINT) AS cv
             |  FROM t JOIN kt ON kt.x = t.cy GROUP BY 1, 2, 3
             |), med AS (
             |  SELECT id, cv AS m FROM (
             |    SELECT id, cv, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cv) AS rn
             |    FROM cc WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32
             |), fph AS (
             |  SELECT cc.id,
             |         SUM(CASE WHEN NOT (u = 0 AND v = 0) AND cv > m
             |                  THEN CAST(1 AS HUGEINT) << CAST(8 * u + v AS INT)
             |                  ELSE CAST(0 AS HUGEINT) END) AS ufp
             |  FROM cc JOIN med USING (id) GROUP BY cc.id
             |), fps AS (
             |  SELECT id, CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
             |                       THEN ufp - CAST('18446744073709551616' AS HUGEINT)
             |                       ELSE ufp END AS BIGINT) AS sfp
             |  FROM fph
             |), ipairs AS (
             |  SELECT a.id AS doc_a, b.id AS doc_b
             |  FROM fps a JOIN fps b ON a.id < b.id
             |  WHERE bit_count(xor(a.sfp, b.sfp)) <= 4
             |), par AS (
             |  SELECT id, ([32,48,64,96,128,192])[CAST(id % 6 AS INT) + 1] AS P FROM ids
             |), ts AS (SELECT unnest(range(0, 1536)) AS t
             |), sm AS (
             |  SELECT id, t // 256 AS frame, t % 256 AS tt,
             |         CASE WHEN ((t + id * 13) % P) < P // 2
             |              THEN -8192 + (4 * 8192 * ((t + id * 13) % P)) // P
             |              ELSE 3 * 8192 - (4 * 8192 * ((t + id * 13) % P)) // P END AS s
             |  FROM par, ts
             |), ct AS (
             |  SELECT CAST(tx.t AS INT) AS tt, CAST(kk.k AS INT) AS k,
             |         ($dftCosSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS cq,
             |         ($dftSinSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS sq
             |  FROM (SELECT unnest(range(0, 256)) AS t) tx,
             |       (SELECT unnest(range(1, 9)) AS k) kk
             |), sp AS (
             |  SELECT sm.id, sm.frame, ct.k,
             |         CAST(SUM(sm.s * ct.cq) AS BIGINT) AS sc,
             |         CAST(SUM(sm.s * ct.sq) AS BIGINT) AS ss
             |  FROM sm JOIN ct ON ct.tt = sm.tt GROUP BY 1, 2, 3
             |), pk AS (
             |  SELECT id, frame, k AS peak_bin FROM (
             |    SELECT id, frame, k,
             |           ROW_NUMBER() OVER (PARTITION BY id, frame
             |                              ORDER BY sc * sc + ss * ss DESC, k ASC) AS rn
             |    FROM sp) WHERE rn = 1
             |), apairs AS (
             |  SELECT a.id AS doc_a, b.id AS doc_b
             |  FROM pk a JOIN pk b
             |    ON a.frame = b.frame AND a.peak_bin = b.peak_bin AND a.id < b.id
             |  GROUP BY a.id, b.id
             |  HAVING COUNT(*) >= 5
             |), pairs AS (
             |  -- INTERSECT spelled as a join: DuckDB's WITH RECURSIVE
             |  -- parser rejects non-UNION set ops anywhere in the block
             |  SELECT i.doc_a, i.doc_b
             |  FROM ipairs i JOIN apairs a
             |    ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
             |), edges AS (
             |  SELECT doc_a AS src, doc_b AS dst FROM pairs
             |  UNION
             |  SELECT doc_b AS src, doc_a AS dst FROM pairs
             |), reach AS (
             |  SELECT src AS doc, src AS r FROM edges
             |  UNION
             |  SELECT e.src AS doc, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.doc
             |), labels AS (
             |  SELECT doc, MIN(r) AS label FROM reach GROUP BY doc
             |), lab AS (
             |  SELECT i.id AS doc, COALESCE(l.label, i.id) AS cluster
             |  FROM ids i LEFT JOIN labels l ON i.id = l.doc
             |), m AS (
             |  SELECT cluster, MIN(doc) AS doc, CAST(COUNT(*) AS BIGINT) AS n_members
             |  FROM lab GROUP BY cluster
             |)
             |SELECT doc, cluster, n_members, CAST(2 AS BIGINT) AS n_parts
             |FROM m ORDER BY doc""".stripMargin)),

    // The ARCHIVE curation loop — p115's text sibling, the crawl-job
    // shape end to end: .warc.gz response shards in → extract text →
    // full curate pipeline (floors, CC dedup, Gopher screen, splits) →
    // survivors published as .warc.wet.gz conversion shards (the layout
    // the public crawls distribute) + a _manifest parquet — and the
    // checked frame is read back from the published WET, so a green
    // hash proves archive-in → curate → archive-out including text
    // fidelity through both container round trips. The oracle is the
    // same full-pipeline replay the p49/p95 family pins, over the whole
    // corpus (no batch cut).
    QueryDef("p116_archive_curate",
      (s, dir) => {
        val scratch = s"target/graft-tmp/archcurate_p116_${math.abs(dir.hashCode)}"
        graft.sources.Warc.writeShards(
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text", s"$scratch/in", shards = 4)
        TrainingPipeline.curateArchive(s, s"$scratch/in", s"$scratch/out")
          .orderBy("doc_id")
      },
      Some(s"""WITH RECURSIVE $curateStagesSql
             |SELECT doc_id, text,
             |       CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 980000 THEN 'train'
             |            WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 990000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM screened
             |ORDER BY doc_id""".stripMargin)),

    // INCREMENTAL multimodal curation — the recrawl shape for p115:
    // prior shards (ids < 13, covering duplicate classes 0..12) reduce
    // to fingerprint/landmark state; the batch (ids 13..95) curates
    // against that state WITHOUT re-decoding the prior corpus. Batch
    // docs in prior-seen classes drop (both modalities match prior);
    // the five fresh classes (13..17) survive as batch-internal
    // clusters with min-id canonicals. The oracle replays the FULL
    // p115 pipeline over prior ∪ batch and restricts to batch ids —
    // monotone ids make the batch-restricted outputs exactly equal
    // (curateShardsIncremental's scaladoc derives why, including the
    // bridge case), so a green hash PROVES incremental ≡ full on the
    // batch, the whole contract.
    QueryDef("p118_multimodal_curate_incremental",
      (s, dir) => {
        val scratch = s"target/graft-tmp/mmcurate_p118_${math.abs(dir.hashCode)}"
        def shardsOf(docs: org.apache.spark.sql.DataFrame, out: String): Unit = {
          val png = Multimodal.patternedAssets(s, docs, "doc_id").toDF()
            .select(col("asset_id").as("id"), col("data").as("png"))
          val wav = Multimodal.toneAssets(s, docs, "doc_id").toDF()
            .select(col("asset_id").as("id"), col("data").as("wav"))
          graft.sources.WebDataset.writeShards(
            png.join(wav, "id")
              .select(col("id").cast("string").as("key"), col("png"), col("wav")),
            "key", Seq("png" -> col("png"), "wav" -> col("wav")), out, shards = 4)
        }
        val all = Tables.load(s, dir, "documents").select("doc_id")
        shardsOf(all.where(col("doc_id") < 13), s"$scratch/prior")
        shardsOf(all.where(col("doc_id") >= 13 && col("doc_id") < 96),
          s"$scratch/batch")
        Multimodal.writeMmState(s, s"$scratch/prior", s"$scratch/state")
        Multimodal.curateShardsIncremental(
          s, s"$scratch/state", s"$scratch/batch", s"$scratch/out")
          .orderBy("doc")
      },
      Some(s"""WITH RECURSIVE ids AS (
             |  SELECT doc_id AS id FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id < 96
             |), xs AS (SELECT unnest(range(0, 64)) AS x
             |), ys AS (SELECT unnest(range(0, 64)) AS y
             |), px AS (
             |  SELECT id, x, y,
             |         LEAST(255, GREATEST(0,
             |           40
             |           + ((x // ([8,16,32])[CAST(id % 9 AS INT) % 3 + 1]
             |               + y // ([32,16,8])[CAST((id % 9) // 3 AS INT) % 3 + 1]) % 2) * 120
             |           + (((x * y * ((id % 9) + 3)) // 7) % 48)
             |           + CASE WHEN x >= (id * 31) % 62 AND x < (id * 31) % 62 + 2
             |                   AND y >= (id * 17) % 62 AND y < (id * 17) % 62 + 2
             |                  THEN 16 ELSE 0 END)) AS g
             |  FROM ids, xs, ys
             |), cell AS (
             |  SELECT id, x // 2 AS cx, y // 2 AS cy, CAST(SUM(g) AS BIGINT) AS s
             |  FROM px GROUP BY 1, 2, 3
             |), kt AS (
             |  SELECT CAST(xx.x AS INT) AS x, CAST(uu.u AS INT) AS u,
             |         ($dctTableSql)[CAST(xx.x AS INT) + 1][CAST(uu.u AS INT) + 1] AS kv
             |  FROM (SELECT unnest(range(0, 32)) AS x) xx,
             |       (SELECT unnest(range(0, 8)) AS u) uu
             |), t AS (
             |  SELECT cell.id, kt.u, cell.cy, CAST(SUM(cell.s * kt.kv) AS BIGINT) AS tv
             |  FROM cell JOIN kt ON kt.x = cell.cx GROUP BY 1, 2, 3
             |), cc AS (
             |  SELECT t.id, t.u, kt.u AS v, CAST(SUM(t.tv * kt.kv) AS BIGINT) AS cv
             |  FROM t JOIN kt ON kt.x = t.cy GROUP BY 1, 2, 3
             |), med AS (
             |  SELECT id, cv AS m FROM (
             |    SELECT id, cv, ROW_NUMBER() OVER (PARTITION BY id ORDER BY cv) AS rn
             |    FROM cc WHERE NOT (u = 0 AND v = 0)) WHERE rn = 32
             |), fph AS (
             |  SELECT cc.id,
             |         SUM(CASE WHEN NOT (u = 0 AND v = 0) AND cv > m
             |                  THEN CAST(1 AS HUGEINT) << CAST(8 * u + v AS INT)
             |                  ELSE CAST(0 AS HUGEINT) END) AS ufp
             |  FROM cc JOIN med USING (id) GROUP BY cc.id
             |), fps AS (
             |  SELECT id, CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
             |                       THEN ufp - CAST('18446744073709551616' AS HUGEINT)
             |                       ELSE ufp END AS BIGINT) AS sfp
             |  FROM fph
             |), ipairs AS (
             |  SELECT a.id AS doc_a, b.id AS doc_b
             |  FROM fps a JOIN fps b ON a.id < b.id
             |  WHERE bit_count(xor(a.sfp, b.sfp)) <= 4
             |), par AS (
             |  SELECT id, ([32,48,64,96,128,192])[CAST(id % 6 AS INT) + 1] AS P FROM ids
             |), ts AS (SELECT unnest(range(0, 1536)) AS t
             |), sm AS (
             |  SELECT id, t // 256 AS frame, t % 256 AS tt,
             |         CASE WHEN ((t + id * 13) % P) < P // 2
             |              THEN -8192 + (4 * 8192 * ((t + id * 13) % P)) // P
             |              ELSE 3 * 8192 - (4 * 8192 * ((t + id * 13) % P)) // P END AS s
             |  FROM par, ts
             |), ct AS (
             |  SELECT CAST(tx.t AS INT) AS tt, CAST(kk.k AS INT) AS k,
             |         ($dftCosSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS cq,
             |         ($dftSinSql)[CAST(tx.t AS INT) + 1][CAST(kk.k AS INT)] AS sq
             |  FROM (SELECT unnest(range(0, 256)) AS t) tx,
             |       (SELECT unnest(range(1, 9)) AS k) kk
             |), sp AS (
             |  SELECT sm.id, sm.frame, ct.k,
             |         CAST(SUM(sm.s * ct.cq) AS BIGINT) AS sc,
             |         CAST(SUM(sm.s * ct.sq) AS BIGINT) AS ss
             |  FROM sm JOIN ct ON ct.tt = sm.tt GROUP BY 1, 2, 3
             |), pk AS (
             |  SELECT id, frame, k AS peak_bin FROM (
             |    SELECT id, frame, k,
             |           ROW_NUMBER() OVER (PARTITION BY id, frame
             |                              ORDER BY sc * sc + ss * ss DESC, k ASC) AS rn
             |    FROM sp) WHERE rn = 1
             |), apairs AS (
             |  SELECT a.id AS doc_a, b.id AS doc_b
             |  FROM pk a JOIN pk b
             |    ON a.frame = b.frame AND a.peak_bin = b.peak_bin AND a.id < b.id
             |  GROUP BY a.id, b.id
             |  HAVING COUNT(*) >= 5
             |), pairs AS (
             |  SELECT i.doc_a, i.doc_b
             |  FROM ipairs i JOIN apairs a
             |    ON i.doc_a = a.doc_a AND i.doc_b = a.doc_b
             |), edges AS (
             |  SELECT doc_a AS src, doc_b AS dst FROM pairs
             |  UNION
             |  SELECT doc_b AS src, doc_a AS dst FROM pairs
             |), reach AS (
             |  SELECT src AS doc, src AS r FROM edges
             |  UNION
             |  SELECT e.src AS doc, reach.r AS r FROM edges e JOIN reach ON e.dst = reach.doc
             |), labels AS (
             |  SELECT doc, MIN(r) AS label FROM reach GROUP BY doc
             |), lab AS (
             |  SELECT i.id AS doc, COALESCE(l.label, i.id) AS cluster
             |  FROM ids i LEFT JOIN labels l ON i.id = l.doc
             |), m AS (
             |  SELECT cluster, MIN(doc) AS doc, CAST(COUNT(*) AS BIGINT) AS n_members
             |  FROM lab GROUP BY cluster
             |)
             |SELECT doc, cluster, n_members, CAST(2 AS BIGINT) AS n_parts
             |FROM m WHERE doc >= 13 ORDER BY doc""".stripMargin)),

    // The FULL crawl pipeline in one oracle: .warc.gz shards whose
    // response payloads are raw HTML pages → Html.toText extraction →
    // the complete curate pipeline → .warc.wet.gz out — p116 with the
    // real first stage attached (a web archive carries pages, not
    // prose). The oracle derives the extracted text with the SAME
    // rewrite chain (Html.toTextSql over the same page template) and
    // feeds it through the same curate-stage CTEs the p49 family pins —
    // so a green hash proves extract→curate composition on DERIVED
    // text, not just each stage alone.
    QueryDef("p119_html_archive_curate",
      (s, dir) => {
        val scratch = s"target/graft-tmp/htmlarch_p119_${math.abs(dir.hashCode)}"
        val page = concat(
          lit("<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- chrome --><p>"), col("text"),
          lit("</p><footer>fin</footer></body></html>"))
        graft.sources.Warc.writeShards(
          Tables.load(s, dir, "documents").select(col("doc_id"), page.as("html")),
          "doc_id", "html", s"$scratch/in", shards = 4)
        TrainingPipeline.curateArchive(s, s"$scratch/in", s"$scratch/out",
          extractHtml = true)
          .orderBy("doc_id")
      },
      Some({
        val htmlSql =
          "'<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc ' || CAST(doc_id AS VARCHAR) || " +
            "'</h1><!-- chrome --><p>' || text || " +
            "'</p><footer>fin</footer></body></html>'"
        val src = s"(SELECT doc_id, ${Html.toTextSql(s"($htmlSql)")} AS text " +
          "FROM read_parquet('{SFDIR}/documents.parquet'))"
        s"""WITH RECURSIVE ${curateStagesSqlFrom(src)}
           |SELECT doc_id, text,
           |       CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 980000 THEN 'train'
           |            WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 990000 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM screened
           |ORDER BY doc_id""".stripMargin
      })),

    // Sentence-aware chunking (p32's boundary-respecting sibling):
    // sentences split on terminal punctuation, packed into ≤24-token
    // chunks by the exclusive-running-sum floor rule — a chunk never
    // cuts a sentence. The oracle replays the boundary marking (same
    // regex, RE2 both sides), the per-sentence token counts, the
    // running-sum window under the same (doc, pos) order, and the
    // ordered string_agg reassembly.
    QueryDef("p120_chunk_sentences",
      (s, dir) => Curation.chunkBySentences(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", maxTokens = 24)
        .orderBy("doc_id", "chunk_idx"),
      Some(s"""WITH t AS (
             |  SELECT doc_id,
             |         regexp_replace(TRIM(text), '([.!?])\\s+', '\\1' || chr(1), 'g') AS marked
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), s AS (
             |  SELECT doc_id,
             |         unnest(string_split(marked, chr(1))) AS sent,
             |         unnest(range(1, len(string_split(marked, chr(1))) + 1)) AS pos
             |  FROM t
             |), f AS (
             |  SELECT doc_id, pos, TRIM(sent) AS sent,
             |         CAST(len(list_filter(string_split_regex(${segSql("TRIM(sent)")}, '\\s+'),
             |                              x -> x <> '')) AS BIGINT) AS n_toks
             |  FROM s WHERE TRIM(sent) <> ''
             |), c AS (
             |  SELECT doc_id, pos, sent, n_toks,
             |         SUM(n_toks) OVER (PARTITION BY doc_id ORDER BY pos
             |                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           - n_toks AS cum
             |  FROM f
             |)
             |SELECT doc_id, CAST(cum // 24 AS INT) AS chunk_idx,
             |       string_agg(sent, ' ' ORDER BY pos) AS chunk_text,
             |       CAST(COUNT(*) AS BIGINT) AS n_sentences,
             |       CAST(SUM(n_toks) AS BIGINT) AS n_tokens
             |FROM c GROUP BY doc_id, CAST(cum // 24 AS INT)
             |ORDER BY doc_id, chunk_idx""".stripMargin)),

    // The composed annotate → train → screen loop (FineWeb-Edu shape,
    // "LLM calls as operators" end to end): a DETERMINISTIC in-JVM
    // teacher labels the doc_id%5 sample good/bad by whitespace-token
    // parity of the raw text, TextClassifier distills those labels, and
    // the student screens the WHOLE corpus at the lower-median floor.
    // The oracle re-derives the teacher's labels in SQL (the reply is a
    // pure function of the prompt — that's what makes an LLM-distilled
    // filter auditable), replays the full fixed-point GD trajectory on
    // the sample, re-scores the corpus, and re-derives the floor and
    // the exact keep set, so a green hash proves the ENTIRE chain —
    // HTTP annotation included — not just the classifier arithmetic
    // p53/p56 already pin piecewise.
    QueryDef("p121_llm_distill_screen",
      (s, dir) => {
        val stub = graft.agent.StubLlmServer.start { prompt =>
          if (prompt.split("\\s+").count(_.nonEmpty) % 2 == 0) "good"
          else "bad"
        }
        try {
          Annotate.llmDistillScreen(
            Tables.load(s, dir, "documents"), "doc_id", "text",
            "{text}", "good", "bad",
            LlmAnnotateConfig(baseUrl = stub.url, model = "stub",
              apiKey = Some("sk-test"), maxRetries = 4,
              backoffMillis = 1L, concurrency = 8,
              requestsPerSecond = 1e6),
            samplePredicate = col("doc_id") % 5 === 0,
            numBuckets = tcBuckets, epochs = tcEpochs)
            .select("doc_id", "lang", "source").orderBy("doc_id")
        } finally stub.stop()
      },
      Some(classifierCtes(tcEpochs, tcBuckets,
        labelSql = "CASE WHEN len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) % 2 = 0 THEN 1 ELSE 0 END",
        trainFilter = "doc_id % 5 = 0") +
        s"""
           |, lab_all AS (
           |  SELECT doc_id, CAST(len(tk) AS BIGINT) AS n
           |  FROM t WHERE len(tk) > 0
           |), tok_all AS (
           |  SELECT doc_id, unnest(tk) AS tok FROM t
           |), hb_all AS (
           |  SELECT doc_id,
           |         CAST(list_reduce(
           |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
           |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
           |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
           |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
           |         ) % $tcBuckets AS INT) AS bucket
           |  FROM tok_all
           |), f_all AS MATERIALIZED (
           |  SELECT doc_id, bucket, CAST(count(*) AS HUGEINT) AS c
           |  FROM hb_all GROUP BY doc_id, bucket
           |), mf AS (
           |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
           |  FROM f_all f JOIN w$tcEpochs w ON f.bucket = w.b GROUP BY f.doc_id
           |), sc AS (
           |  SELECT m.doc_id,
           |         CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS HUGEINT) AS s9
           |  FROM mf m JOIN lab_all l USING (doc_id)
           |), ranked AS (
           |  SELECT s9, row_number() OVER (ORDER BY s9) AS rk,
           |         count(*) OVER () AS n
           |  FROM sc
           |), thr AS (
           |  SELECT s9 AS t FROM ranked WHERE rk = (n + 1) // 2
           |), keep AS (
           |  SELECT doc_id FROM sc CROSS JOIN thr WHERE sc.s9 >= thr.t
           |)
           |SELECT d.doc_id, d.lang, d.source
           |FROM read_parquet('{SFDIR}/documents.parquet') d
           |JOIN keep USING (doc_id)
           |ORDER BY d.doc_id""".stripMargin)),

    // TRAINED language ID (the p94 upgrade): hashed char-3-gram
    // one-vs-rest linear models on the fixed-point GD, trained on the
    // even-doc_id half of a language-flavored labeled fixture (text is
    // a pure function of (doc_id, lang) so the oracle rebuilds it) and
    // evaluated on the held-out odd half. The oracle replays fixture
    // construction, gram hashing, ALL FIVE GD trajectories, the eval
    // margins, and the argmax tie-break, so a green hash pins every
    // cell of the confusion matrix — whose diagonal is the learned
    // recall the heuristic p94 audit showed it lacked.
    QueryDef("p122_langid_trained",
      (s, dir) => {
        val vLit = typedlit(liVocab)
        val lidx = liLangs.zipWithIndex.foldLeft(lit(-1)) {
          case (acc, (l, i)) => when(col("lang") === l, lit(i)).otherwise(acc)
        }
        val fx = Tables.load(s, dir, "documents").select("doc_id", "lang")
          .withColumn("text", concat_ws(" ",
            transform(sequence(lit(0), lit(19)), j =>
              element_at(element_at(vLit, lidx + 1),
                pmod(col("doc_id") + j.cast("long") * 7L, lit(12L))
                  .cast("int") + 1))))
        val model = LangId.train(fx.where(col("doc_id") % 2 === 0),
          "doc_id", "text", "lang", liLangs,
          n = 3, numBuckets = 256, epochs = 2)
        LangId.confusion(fx.where(col("doc_id") % 2 === 1),
          "doc_id", "text", "lang", model)
          .orderBy("lang", "lang_pred")
      },
      Some(langIdCtes(epochs = 2, buckets = 256))),

    // Line-level boilerplate features + keep/drop (jusText-style, the
    // extraction-quality step Html.toText alone lacks): each doc's text
    // wrapped into a page whose OTHER lines are a link farm (high link
    // density), a stopword-free "Copyright" line, and a mixed prose
    // line with one inline anchor; anchors are sentinel-marked BEFORE
    // tag stripping so per-line link chars survive extraction. The
    // oracle replays the marked strip chain (Html.toTextMarkedSql —
    // same rewrite list, engine-local backref spelling), the line
    // explode, every feature (lengths, words, link chars via the same
    // span arithmetic, stopword hits), both densities with the
    // round-before-compare rule, and the keep gates — so a green hash
    // pins every per-line keep/drop decision.
    QueryDef("p123_boilerplate_lines",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>t</title></head><body>" +
            "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
            "<p>Links: <a href=\"/1\">one link</a> <a href=\"/2\">two link" +
            "</a> <a href=\"/3\">three more</a> go</p><p>"),
          col("text"),
          lit("</p><p>Copyright 2024 MegaCorp</p>" +
            "<p>Read <a href=\"/m\">more</a> about the thing that we have " +
            "here with it</p></body></html>"))
        Html.lineFeatures(
          Tables.load(s, dir, "documents").select(col("doc_id"), html.as("h")),
          "doc_id", "h")
          .withColumn("keep",
            col("link_density") <= 0.4 && col("n_words") >= 5 &&
              col("stop_density") >= 0.03)
          .orderBy("doc", "pos")
      },
      Some({
        val htmlSql =
          "'<html><head><title>t</title></head><body>" +
            "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
            "<p>Links: <a href=\"/1\">one link</a> <a href=\"/2\">two link" +
            "</a> <a href=\"/3\">three more</a> go</p><p>' || text || " +
            "'</p><p>Copyright 2024 MegaCorp</p>" +
            "<p>Read <a href=\"/m\">more</a> about the thing that we have " +
            "here with it</p></body></html>'"
        val sp = "chr(2) || '[^' || chr(3) || ']*' || chr(3)"
        val stopPat =
          "'(?i)\\b(the|be|to|of|and|that|have|with|a|in|is|it)\\b'"
        s"""WITH h AS (
           |  SELECT doc_id, ${Html.toTextMarkedSql(s"($htmlSql)")} AS t
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), lines AS (
           |  SELECT doc_id, unnest(string_split(t, chr(10))) AS mline,
           |         unnest(range(0, len(string_split(t, chr(10))))) AS pos
           |  FROM h
           |), f AS (
           |  SELECT doc_id, CAST(pos AS BIGINT) AS pos,
           |         replace(replace(mline, chr(2), ''), chr(3), '') AS line,
           |         CAST(len(mline) - len(regexp_replace(mline, $sp, '', 'g'))
           |              - 2 * len(regexp_extract_all(mline, $sp)) AS BIGINT) AS link_chars
           |  FROM lines
           |), g AS (
           |  SELECT doc_id, pos, line, link_chars,
           |         CAST(len(line) AS BIGINT) AS n_chars,
           |         CAST(len(list_filter(string_split_regex(trim(line), '\\s+'), x -> x <> '')) AS BIGINT) AS n_words,
           |         CAST(len(regexp_extract_all(line, $stopPat)) AS BIGINT) AS stop_hits
           |  FROM f
           |), d AS (
           |  SELECT doc_id, pos, line, n_chars, n_words, link_chars, stop_hits,
           |         CASE WHEN n_chars = 0 THEN 1.0
           |              ELSE ROUND(CAST(link_chars AS DOUBLE) / n_chars, 6) END AS link_density,
           |         CASE WHEN n_words = 0 THEN 0.0
           |              ELSE ROUND(CAST(stop_hits AS DOUBLE) / n_words, 6) END AS stop_density
           |  FROM g
           |)
           |SELECT doc_id AS doc, pos, line, n_chars, n_words, link_chars,
           |       link_density, stop_hits, stop_density,
           |       (link_density <= 0.4 AND n_words >= 5 AND stop_density >= 0.03) AS keep
           |FROM d ORDER BY doc, pos""".stripMargin
      })),

    // HTML → text extraction (the WET-generation step): each doc's text
    // wrapped into a full page — head with title/style, nav chrome, an
    // h1, a comment, the prose paragraph, an entity-heavy trailing div,
    // a footer — then extracted by the Html.toText rewrite chain. The
    // oracle replays the IDENTICAL chain (Html.toTextSql emits it from
    // the same rewrite list — one source of truth), so a green hash
    // pins every rule: block drops, chrome drops, block-close newlines,
    // tag stripping, the fixed-order entity decode (&amp; last, so
    // &amp;lt; decodes one level to &lt;), and whitespace discipline.
    QueryDef("p117_html_extract",
      (s, dir) => {
        val html = concat(
          lit("<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- chrome --><p>"), col("text"),
          lit("</p><div>tail &amp; &quot;q&quot; &amp;lt;kept&amp;gt;" +
            "</div><footer>fin</footer></body></html>"))
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), Html.toText(html).as("extracted"))
          .orderBy("doc_id")
      },
      Some({
        val htmlSql =
          "'<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc ' || CAST(doc_id AS VARCHAR) || " +
            "'</h1><!-- chrome --><p>' || text || " +
            "'</p><div>tail &amp; &quot;q&quot; &amp;lt;kept&amp;gt;" +
            "</div><footer>fin</footer></body></html>'"
        s"""SELECT doc_id, ${Html.toTextSql(s"($htmlSql)")} AS extracted
           |FROM read_parquet('{SFDIR}/documents.parquet')
           |ORDER BY doc_id""".stripMargin
      })),

    // Feature-hashed text embeddings (the hashing trick): token →
    // bucket fnv % 16 with sign from hash bit 31, tf-weighted signed
    // sums, L2 normalize. dims = 16 is a power of two, so the unsigned
    // oracle mod and the engine's signed pmod agree on the low bits.
    // Exploded (doc, dim, val) output; exact-integer sums under the
    // rounded double finish.
    QueryDef("p82_hash_embed",
      (s, dir) => TextAnalysis.hashEmbed(
        Tables.load(s, dir, "documents"), "doc_id", "text", dims = 16)
        .orderBy("doc", "dim"),
      Some("""WITH toks AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS tok
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), h AS (
             |  SELECT doc,
             |         list_reduce(
             |           list_prepend(CAST('14695981039346656037' AS HUGEINT),
             |                        list_transform(regexp_extract_all(hex(encode(tok)), '..'), c -> CAST(CAST(('0x' || c) AS INT) AS HUGEINT))),
             |           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
             |                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)) AS uh
             |  FROM toks
             |), b AS (
             |  SELECT doc, CAST(uh % 16 AS INT) AS dim,
             |         CASE WHEN (uh // 2147483648) % 2 = 1 THEN 1 ELSE -1 END AS sgn
             |  FROM h
             |), sums AS (
             |  SELECT doc, dim, CAST(SUM(sgn) AS BIGINT) AS w
             |  FROM b GROUP BY doc, dim
             |), nz AS (
             |  SELECT * FROM sums WHERE w <> 0
             |), nrm AS (
             |  SELECT doc, SQRT(CAST(SUM(w * w) AS DOUBLE)) AS norm
             |  FROM nz GROUP BY doc
             |)
             |SELECT nz.doc, nz.dim, ROUND(CAST(w AS DOUBLE) / norm, 6) AS val
             |FROM nz JOIN nrm USING (doc) ORDER BY doc, dim""".stripMargin)),

    // PSI drift card between the even/odd ingest halves: fixed integer
    // binning, Laplace-smoothed fractions, per-bin terms on the 1e12
    // integer grid so the sum is association-free. Oracle replays the
    // binning, the grid (zero bins contribute their smoothed term),
    // and the identical double expression tree.
    QueryDef("p83_drift_psi",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val ref = docs.where(pmod(col("doc_id"), lit(2)) === 0)
        val cur = docs.where(pmod(col("doc_id"), lit(2)) === 1)
        TextAnalysis.driftPsi(ref, cur, Seq(
          ("n_chars", least(lit(9), (col("n_chars") / lit(100)).cast("int")), 10),
          ("n_words", least(lit(10),
            (TextAnalysis.tokenCountWs(col("text")) / lit(10)).cast("int")), 11),
        )).orderBy("feature")
      },
      Some("""WITH d AS (
             |  SELECT doc_id, text, n_chars
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), b AS (
             |  SELECT doc_id % 2 AS side, 'n_chars' AS feature,
             |         LEAST(9, CAST(n_chars // 100 AS INT)) AS bin FROM d
             |  UNION ALL
             |  SELECT doc_id % 2, 'n_words',
             |         LEAST(10, CAST(len(string_split_regex(TRIM(text), '\s+')) // 10 AS INT)) FROM d
             |), grid AS (
             |  SELECT 'n_chars' AS feature, 10 AS nb, unnest(range(0, 10)) AS bin
             |  UNION ALL
             |  SELECT 'n_words', 11, unnest(range(0, 11))
             |), hr AS (
             |  SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS cr
             |  FROM b WHERE side = 0 GROUP BY 1, 2
             |), hc AS (
             |  SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS cc
             |  FROM b WHERE side = 1 GROUP BY 1, 2
             |), j AS (
             |  SELECT g.feature, g.nb, g.bin,
             |         COALESCE(hr.cr, 0) AS cr, COALESCE(hc.cc, 0) AS cc
             |  FROM grid g
             |  LEFT JOIN hr ON hr.feature = g.feature AND hr.bin = g.bin
             |  LEFT JOIN hc ON hc.feature = g.feature AND hc.bin = g.bin
             |), tot AS (
             |  SELECT feature, MAX(nb) AS nb,
             |         CAST(SUM(cr) AS BIGINT) AS nr, CAST(SUM(cc) AS BIGINT) AS nc
             |  FROM j GROUP BY feature
             |), terms AS (
             |  SELECT j.feature, tot.nr, tot.nc,
             |         CAST(ROUND(
             |           ((CAST(cc + 1 AS DOUBLE) / CAST(nc + tot.nb AS DOUBLE))
             |            - (CAST(cr + 1 AS DOUBLE) / CAST(nr + tot.nb AS DOUBLE)))
             |           * LN((CAST(cc + 1 AS DOUBLE) / CAST(nc + tot.nb AS DOUBLE))
             |                / (CAST(cr + 1 AS DOUBLE) / CAST(nr + tot.nb AS DOUBLE)))
             |           * 1e12) AS BIGINT) AS micro
             |  FROM j JOIN tot USING (feature)
             |)
             |SELECT feature, ROUND(CAST(SUM(micro) AS DOUBLE) / 1e12, 6) AS psi,
             |       MAX(nr) AS n_ref, MAX(nc) AS n_cur
             |FROM terms GROUP BY feature ORDER BY feature""".stripMargin)),

    // Contrastive pair mining: LSH-verified near-dup positives + gate-
    // bucket-adjacent negatives, both with exact Jaccard labels.
    // Oracle: all-pairs Jaccard positives (total candidate recall, the
    // p02/p13 argument), the idGate/bucket/rank negative sampler
    // replayed with ROW_NUMBER, anti-join, and the same verification.
    QueryDef("p84_contrastive_pairs",
      (s, dir) => Curation.contrastivePairs(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16,
        buckets = 16, salt = 7)
        .orderBy("label", "doc_a", "doc_b"),
      Some("""WITH corpus AS (
             |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet')
             |), toks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus
             |), sets AS (
             |  SELECT doc_id,
             |         list_distinct(list_transform(range(1, len(toks) - 3 + 2),
             |                                      i -> list_aggregate(toks[i:i+2], 'string_agg', ' '))) AS s
             |  FROM toks WHERE len(toks) >= 3
             |), pos AS (
             |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             |         ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
             |  FROM sets a JOIN sets b ON a.doc_id < b.doc_id
             |  WHERE ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |              / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.12
             |), keyed AS (
             |  SELECT doc_id AS doc,
             |         ((doc_id % 100000 + 7) * 2654435761) % 1000000 AS g
             |  FROM corpus
             |), rk AS (
             |  SELECT doc, g % 16 AS bucket,
             |         ROW_NUMBER() OVER (PARTITION BY g % 16 ORDER BY g, doc) AS rn
             |  FROM keyed
             |), adj AS (
             |  SELECT LEAST(x.doc, y.doc) AS doc_a, GREATEST(x.doc, y.doc) AS doc_b
             |  FROM rk x JOIN rk y ON x.bucket = y.bucket AND y.rn = x.rn + 1
             |), negp AS (
             |  SELECT adj.doc_a, adj.doc_b FROM adj
             |  ANTI JOIN pos ON adj.doc_a = pos.doc_a AND adj.doc_b = pos.doc_b
             |), neg AS (
             |  SELECT n.doc_a, n.doc_b,
             |         ROUND(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             |               / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard,
             |         0 AS label
             |  FROM negp n JOIN sets a ON a.doc_id = n.doc_a
             |              JOIN sets b ON b.doc_id = n.doc_b
             |)
             |SELECT doc_a, doc_b, jaccard, 1 AS label FROM pos
             |UNION ALL
             |SELECT doc_a, doc_b, jaccard, label FROM neg
             |ORDER BY label, doc_a, doc_b""".stripMargin)),

    // Dataset profiling card: per-column null coverage, type-inference
    // votes over the string rendering, exact distincts, lexicographic
    // extrema — one explode + one aggregate. The fixture shapes all
    // four type classes (int-like key, decimal-rendered price, date,
    // null-injected categorical); floats ride a DECIMAL(12,2) cast so
    // both engines render identical strings.
    QueryDef("p85_profile_columns",
      (s, dir) => {
        val orders = Tables.load(s, dir, "orders").select(
          col("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").as("o_totalprice"),
          col("o_orderdate").cast("date").as("o_orderdate"),
          when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null).cast("string"))
            .otherwise(col("o_orderpriority")).as("o_priority_dirty"))
        Profiling.profileColumns(orders,
          Seq("o_orderkey", "o_totalprice", "o_orderdate", "o_priority_dirty"))
          .orderBy("column")
      },
      Some("""WITH src AS (
             |  SELECT CAST(o_orderkey AS VARCHAR) AS c_key,
             |         CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS c_price,
             |         CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS c_date,
             |         CASE WHEN o_orderkey % 7 = 0 THEN NULL
             |              ELSE o_orderpriority END AS c_prio
             |  FROM orders
             |), u AS (
             |  SELECT 'o_orderkey' AS "column", c_key AS v FROM src
             |  UNION ALL SELECT 'o_totalprice', c_price FROM src
             |  UNION ALL SELECT 'o_orderdate', c_date FROM src
             |  UNION ALL SELECT 'o_priority_dirty', c_prio FROM src
             |)
             |SELECT "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
             |       CAST(COUNT(*) FILTER (v IS NULL) AS BIGINT) AS n_null,
             |       CAST(COUNT(*) FILTER (regexp_matches(v, '^-?\d+$')) AS BIGINT) AS n_int_like,
             |       CAST(COUNT(*) FILTER (regexp_matches(v, '^-?\d+\.\d+$')) AS BIGINT) AS n_float_like,
             |       CAST(COUNT(*) FILTER (regexp_matches(v, '^\d{4}-\d{2}-\d{2}')) AS BIGINT) AS n_date_like,
             |       CAST(COUNT(DISTINCT v) AS BIGINT) AS n_distinct,
             |       MIN(v) AS min_v, MAX(v) AS max_v
             |FROM u GROUP BY "column" ORDER BY "column"""".stripMargin)),


    // Empirical LSH recall/precision audit: a PORTABLE seeded-FNV
    // minhash (so the oracle recomputes the SAME banded candidate set
    // — the first end-to-end banding replay) next to the exact
    // inverted-index pair set. Turns the "candidate recall is total on
    // this corpus" argument the dedup oracles rely on into a measured,
    // externally checked number.
    QueryDef("p89_lsh_recall_audit",
      (s, dir) => Dedup.lshRecallAudit(
        Tables.load(s, dir, "documents"), "doc_id", "text",
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16),
      Some(lshAuditSql("", None))),

    // The SAME audit under its production scale knobs — a hash-gated
    // document sample (the idGate predicate, replayed verbatim by the
    // oracle) and a df-capped inverted index. The sample is sized
    // ABSOLUTELY — min(1, 1250/corpusDocs), i.e. a fixed ~1250-doc
    // audit whatever the corpus size — which is what keeps the
    // quadratic exact side FLAT as the corpus grows (the r14 sf1
    // sweep measured the old fraction sizing growing ×10 with the
    // data, PLANS.md). At sf0.1 this lands on the same 25% gate as
    // the original fraction form; at sf0.01 it audits the full
    // corpus (clamp), still exercising the df cap.
    QueryDef("p92_lsh_recall_sampled",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val f = math.min(1.0, 1250.0 / docs.count())
        Dedup.lshRecallAudit(docs, "doc_id", "text",
          threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16,
          sampleFraction = Some(f), maxDocFreq = Some(500))
      },
      Some(lshAuditSql(
        "\n  WHERE (doc_id % 100000 * 2654435761) % 1000000 < " +
          "(SELECT CAST(ROUND(LEAST(1.0, 1250.0 / COUNT(*)) * 1000000) AS BIGINT) " +
          "FROM read_parquet('{SFDIR}/documents.parquet'))",
        Some(500)))),

    // Batched IVF recall audit — the ANN sibling of p89: exact vs
    // probed top-10 per query over a workload, both ranked on rounded
    // cosine with id tie-breaks. Oracle replays the full IVF training
    // trajectory (the p14 machinery) plus the per-query probe
    // selection, both rankings, and the per-query hit counts.
    QueryDef("p90_ivf_recall_audit",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val queries = emb.where(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.ivfRecallAudit(emb, "vec_id", "embedding", queries,
          k = 10, ivfK = 8, nprobe = 3)
          .orderBy("qid")
      },
      Some(ivfAssignSql(8) + ivfAuditTailSql)),

    // The IVF audit under its production sizing (the p92 pattern
    // applied to the ANN side): corpus hash-gated to an ABSOLUTE
    // ~1000-vector sample — flat exact-ranking cost at any corpus
    // size (the r14 sf1 sweep measured the unsampled form ×20 on ×10
    // data), with the index trained, probed, and exactly ranked on the
    // SAME sample so the card still measures the pruning's recall.
    QueryDef("p96_ivf_recall_sampled",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val f = math.min(1.0, 1000.0 / emb.count())
        val sample = Curation.deterministicSample(emb, "vec_id", f)
        val queries = sample.where(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.ivfRecallAudit(sample, "vec_id", "embedding", queries,
          k = 10, ivfK = 8, nprobe = 3)
          .orderBy("qid")
      },
      Some(ivfAssignSql(8, vecSampleGateSql(1000)) + ivfAuditTailSql)),

    // Batched PQ recall audit — the compression/recall trade measured
    // in the gate: exact vs ADC-then-rescore top-10 per query. Oracle
    // replays both subspace Lloyd trajectories (the p38 machinery), the
    // per-query ADC sums, the rounded candidate cut, the rescore, and
    // the per-query hit counts.
    QueryDef("p91_pq_recall_audit",
      (s, dir) => {
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val queries = emb.where(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.pqRecallAudit(emb, "vec_id", "embedding", queries,
          m = 4, kBook = 8, k = 10, rescoreFactor = 5)
          .orderBy("qid")
      },
      Some(pqAuditHeadSql("") + pqAuditTailSql)),

    // The PQ audit under production sizing — same absolute ~1000-vector
    // hash-gated sample as p96; codebooks trained, ADC-ranked, and
    // exactly ranked on the sample.
    QueryDef("p97_pq_recall_sampled",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val f = math.min(1.0, 1000.0 / emb.count())
        val sample = OperatorCache.persist(
          Curation.deterministicSample(emb, "vec_id", f))
        val queries = sample.where(pmod(col("vec_id"), lit(50)) === 0)
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.pqRecallAudit(sample, "vec_id", "embedding", queries,
          m = 4, kBook = 8, k = 10, rescoreFactor = 5)
          .orderBy("qid")
      },
      Some(pqAuditHeadSql(vecSampleGateSql(1000)) + pqAuditTailSql)),

    // Incremental SEMANTIC dedup — the embedding-space member of the
    // recrawl family (p95 is the MinHash text form): index trained on
    // the low-id 70%, the high-id 30% batch assigned to the FROZEN
    // cells and deduped against the prior assignment + itself, prior
    // corpus touched only through the batch's cells. Oracle replays
    // the whole shape: Lloyd on the prior rows only, frozen-centroid
    // assignment of everything, and the smaller-id drop rule across
    // the prior/batch split.
    QueryDef("p98_semantic_dedup_incremental",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val cut = emb.agg(max("vec_id")).head().getLong(0) * 7 / 10
        val prev = emb.where(col("vec_id") <= cut)
        val batch = emb.where(col("vec_id") > cut)
        val index = Similarity.ivfTrain(prev, "vec_id", "embedding", k = 16, iters = 2)
        val priorAssigned = Similarity.ivfIndex(prev, "embedding", index)
        Similarity.semanticDedupIncremental(priorAssigned, batch,
          "vec_id", "embedding", index, threshold = 0.30)
          .select("vec_id", "centroid")
          .orderBy("vec_id")
      },
      Some(ivfAssignIncrementalSql(16) +
        """, dups AS (
          |  SELECT DISTINCT b.vec_id AS d
          |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          |  WHERE b.vec_id > (SELECT cut FROM cutoff)
          |    AND ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.30
          |)
          |SELECT vec_id, CAST(cid AS INT) AS centroid FROM a3
          |WHERE vec_id > (SELECT cut FROM cutoff)
          |  AND vec_id NOT IN (SELECT d FROM dups)
          |ORDER BY vec_id""".stripMargin)),

    // Persisted semantic-dedup state lifecycle: p98's shape through the
    // writeDedupState layout (frozen centroids + full prior assignment
    // + stored threshold travel ON DISK), with prior ids %11=4
    // tombstone-DELETED before the batch probe — a retracted prior
    // vector must stop suppressing arrivals. Probe once tombstoned,
    // once compacted; both phases must equal the oracle, which replays
    // the frozen-centroid training + assignment and excludes exactly
    // the deleted priors from the drop rule's suppressor side.
    QueryDef("p127_semantic_state_lifecycle",
      (s, dir) => {
        import s.implicits._
        val emb = Tables.load(s, dir, "embeddings")
        val cut = emb.agg(max("vec_id")).head().getLong(0) * 7 / 10
        val prev = emb.where(col("vec_id") <= cut)
        val batch = emb.where(col("vec_id") > cut)
        val st = s"target/graft-tmp/semstate_p127_${math.abs(dir.hashCode)}"
        Similarity.writeDedupState(prev, "vec_id", "embedding", st,
          threshold = 0.30, k = 16)
        Similarity.deleteFromDedupState(s, st,
          prev.where(pmod(col("vec_id"), lit(11L)) === 4).select("vec_id"),
          "vec_id")
        def probe() = Similarity.semanticDedupFromState(s, st, batch)
          .select("vec_id", "centroid")
        val tombstoned = probe().collect()
          .map(r => (r.getLong(0), r.getInt(1))).toSeq
          .toDF("vec_id", "centroid").withColumn("phase", lit("tombstoned"))
        OperatorCache.releaseAll(s)
        Similarity.compactDedupState(s, st)
        probe().withColumn("phase", lit("compacted"))
          .unionByName(tombstoned)
          .select("phase", "vec_id", "centroid")
          .orderBy("phase", "vec_id")
      },
      Some(ivfAssignIncrementalSql(16) +
        """, dups AS (
          |  SELECT DISTINCT b.vec_id AS d
          |  FROM a3 a JOIN a3 b ON a.cid = b.cid AND a.vec_id < b.vec_id
          |  WHERE b.vec_id > (SELECT cut FROM cutoff)
          |    AND NOT (a.vec_id <= (SELECT cut FROM cutoff) AND a.vec_id % 11 = 4)
          |    AND ROUND(list_cosine_similarity(a.e, b.e), 6) >= 0.30
          |), surv AS (
          |  SELECT vec_id, CAST(cid AS INT) AS centroid FROM a3
          |  WHERE vec_id > (SELECT cut FROM cutoff)
          |    AND vec_id NOT IN (SELECT d FROM dups)
          |)
          |SELECT 'compacted' AS phase, vec_id, centroid FROM surv
          |UNION ALL
          |SELECT 'tombstoned' AS phase, vec_id, centroid FROM surv
          |ORDER BY phase, vec_id""".stripMargin)),
  ) ++ defsAfterPqAudit

  /** Oracle head of the PQ recall audits: the (optionally gated) `v`
    * CTE plus all four subspace Lloyd trajectories. */
  private def pqAuditHeadSql(docWhere: String): String =
    s"""WITH v AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')$docWhere
             |)""".stripMargin +
      pqAssignSql(0, 1, 16, 8) + pqAssignSql(1, 17, 32, 8) +
      pqAssignSql(2, 33, 48, 8) + pqAssignSql(3, 49, 64, 8)

  /** Oracle tail of the PQ recall audits (p91/p97). */
  private val pqAuditTailSql: String =
    """, qs AS (
          |  SELECT vec_id AS qid, e AS qv, e[1:16] AS q0, e[17:32] AS q1,
          |         e[33:48] AS q2, e[49:64] AS q3
          |  FROM v WHERE vec_id % 50 = 0
          |), d0 AS (
          |  SELECT qs.qid, a.vec_id, list_dot_product(c.c, qs.q0) AS d
          |  FROM a3_0 a JOIN c2_0 c USING (cid), qs
          |), d1 AS (
          |  SELECT qs.qid, a.vec_id, list_dot_product(c.c, qs.q1) AS d
          |  FROM a3_1 a JOIN c2_1 c USING (cid), qs
          |), d2 AS (
          |  SELECT qs.qid, a.vec_id, list_dot_product(c.c, qs.q2) AS d
          |  FROM a3_2 a JOIN c2_2 c USING (cid), qs
          |), d3 AS (
          |  SELECT qs.qid, a.vec_id, list_dot_product(c.c, qs.q3) AS d
          |  FROM a3_3 a JOIN c2_3 c USING (cid), qs
          |), adc AS (
          |  SELECT d0.qid, d0.vec_id, ROUND(d0.d + d1.d + d2.d + d3.d, 6) AS adc
          |  FROM d0 JOIN d1 ON d0.qid = d1.qid AND d0.vec_id = d1.vec_id
          |         JOIN d2 ON d0.qid = d2.qid AND d0.vec_id = d2.vec_id
          |         JOIN d3 ON d0.qid = d3.qid AND d0.vec_id = d3.vec_id
          |), cand AS (
          |  SELECT qid, vec_id FROM (
          |    SELECT qid, vec_id,
          |           ROW_NUMBER() OVER (PARTITION BY qid
          |                              ORDER BY adc DESC, vec_id ASC) AS rn
          |    FROM adc) WHERE rn <= 50
          |), approx AS (
          |  SELECT qid, vid FROM (
          |    SELECT cand.qid, v.vec_id AS vid,
          |           ROW_NUMBER() OVER (PARTITION BY cand.qid
          |                              ORDER BY ROUND(list_cosine_similarity(v.e, qs.qv), 6) DESC, v.vec_id ASC) AS rn
          |    FROM cand JOIN v ON v.vec_id = cand.vec_id
          |              JOIN qs ON qs.qid = cand.qid
          |  ) WHERE rn <= 10
          |), exact AS (
          |  SELECT qid, vid FROM (
          |    SELECT qs.qid, v.vec_id AS vid,
          |           ROW_NUMBER() OVER (PARTITION BY qs.qid
          |                              ORDER BY ROUND(list_cosine_similarity(v.e, qs.qv), 6) DESC, v.vec_id ASC) AS rn
          |    FROM v, qs
          |  ) WHERE rn <= 10
          |)
          |SELECT e.qid, CAST(COUNT(a.vid) AS BIGINT) AS n_hit,
          |       ROUND(CAST(COUNT(a.vid) AS DOUBLE) / COUNT(e.vid), 6) AS recall
          |FROM exact e LEFT JOIN approx a ON a.qid = e.qid AND a.vid = e.vid
          |GROUP BY e.qid ORDER BY e.qid""".stripMargin

  /** The defs list continues here — split only because the PQ-audit
    * oracle helpers above sit between the two halves in source. */
  private def defsAfterPqAudit: Seq[QueryDef] = Seq(
    // Calibration card over the trained classifier's scores — the
    // audit that makes the p56 screen threshold MEAN something:
    // reliability-diagram rows (bin, n, mean predicted prob, empirical
    // positive rate, |gap|) from ONE aggregate over the scored frame.
    // Both means divide exact integer sums once, so the oracle (which
    // replays the full GD trajectory, the scoring pass, and the
    // binning) lands on identical doubles.
    QueryDef("p93_calibration_card",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("y", (col("lang") === "en").cast("int"))
        val model = TextClassifier.train(docs, "doc_id", "text", "y",
          numBuckets = tcBuckets, epochs = tcEpochs)
        TextClassifier.calibrationCard(
          TextClassifier.score(docs, "doc_id", "text", "y", model))
          .orderBy("bin")
      },
      Some(classifierCtes(tcEpochs, tcBuckets) +
        s"""
           |, mf AS (
           |  SELECT f.doc_id, SUM(f.c * w.w) AS mm
           |  FROM f JOIN w$tcEpochs w ON f.bucket = w.b GROUP BY f.doc_id
           |), sc AS (
           |  SELECT l.doc_id, CAST(l.y AS BIGINT) AS y,
           |         CAST(round(1000000000.0 / (1.0 + exp(-(CAST(m.mm AS DOUBLE) / (CAST(l.n AS DOUBLE) * 1000000000.0))))) AS BIGINT) AS s9
           |  FROM mf m JOIN lab l USING (doc_id)
           |), binned AS (
           |  SELECT LEAST(CAST(floor(CAST(s9 AS DOUBLE) * 10 / 1000000000.0) AS INT), 9) AS bin, s9, y FROM sc
           |)
           |SELECT CAST(bin AS INTEGER) AS bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
           |       ROUND(CAST(SUM(s9) AS DOUBLE) / (COUNT(*) * 1000000000.0), 6) AS mean_score,
           |       ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
           |       ROUND(ABS(CAST(SUM(s9) AS DOUBLE) / (COUNT(*) * 1000000000.0)
           |                 - CAST(SUM(y) AS DOUBLE) / COUNT(*)), 6) AS gap
           |FROM binned GROUP BY bin ORDER BY bin""".stripMargin)),

    // Language-ID confusion audit: the langId heuristic measured
    // against the corpus's labeled lang column — per (true, predicted)
    // doc counts with P(pred | true) shares, so the diagonal reads as
    // per-language recall. Oracle replays the full n-gram argmax (the
    // p10 machinery) plus the matrix aggregation and normalization.
    QueryDef("p94_langid_confusion",
      (s, dir) => graft.pipeline.TextAnalysis.langIdConfusion(
        Tables.load(s, dir, "documents"), "text", "lang")
        .orderBy("lang", "lang_pred"),
      Some("""WITH g AS (
             |  SELECT doc_id, lang,
             |         list_reverse_sort([
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(the|and|of|to|a|in|is|that|it|was)\b')) AS DOUBLE), 'lang': 'en'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(el|la|de|que|y|en|un|los|se|por)\b')) AS DOUBLE), 'lang': 'es'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(der|die|und|das|ist|von|mit|den|nicht|ein)\b')) AS DOUBLE), 'lang': 'de'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '\b(le|la|les|et|des|est|une|dans|que|pour)\b')) AS DOUBLE), 'lang': 'fr'},
             |           {'score': CAST(LEN(regexp_extract_all(lower(text), '(的|是|了|在|和|有|我|他|这|不)')) AS DOUBLE), 'lang': 'zh'}
             |         ])[1] AS best
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), pred AS (
             |  SELECT lang, CASE WHEN best.score > 0 THEN best.lang ELSE 'und' END AS lang_pred
             |  FROM g
             |), m AS (
             |  SELECT lang, lang_pred, CAST(COUNT(*) AS BIGINT) AS n_docs
             |  FROM pred GROUP BY lang, lang_pred
             |)
             |SELECT lang, lang_pred, n_docs,
             |       ROUND(CAST(n_docs AS DOUBLE) / SUM(n_docs) OVER (PARTITION BY lang), 6) AS share
             |FROM m ORDER BY lang, lang_pred""".stripMargin)),

    // Incremental (recrawl-shaped) curation: state from the low-id 70%
    // of the corpus, batch = the high-id 30%, deduped against the state
    // (Bloom exact-seen gate → floors → band-index prior links +
    // within-batch clusters → Gopher screen → split) WITHOUT re-curating
    // the prior corpus. The oracle is deliberately NOT a replay of the
    // incremental mechanics: it runs the FULL batch pipeline over
    // prev ∪ batch (floors → exact-Jaccard connected-components dedup →
    // Gopher → split) and restricts to the batch's ids — so a green
    // check PROVES curateIncremental(state, batch) ≡ curate(prev ∪ batch)
    // on the batch, the incremental path's whole contract
    // (TrainingPipeline.curateIncremental's scaladoc derives why the
    // monotone-id split makes this exact, not just up-to-representative).
    QueryDef("p95_curate_incremental",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val cut = docs.agg(max("doc_id")).head().getLong(0) * 7 / 10
        val state = TrainingPipeline.curateState(
          docs.where(col("doc_id") <= cut), "doc_id", "text",
          minQuality = 0.3, minWords = 20)
        TrainingPipeline.curateIncremental(
          state, docs.where(col("doc_id") > cut), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(curatePipelineSql(7))),

    // Data-constrained mixture with UPSAMPLING (Muennighoff et al. 2023):
    // at sf0.01 the en target sits ~2.5× above en's available tokens —
    // every en doc carries 2 whole epochs and the gate-ordered top-up
    // frontier adds a third — while the other languages run the
    // sub-epoch downsampling frontier. The oracle replays the per-domain
    // token sums, the integer epoch/remainder split, and the exclusive
    // running-sum frontier under the same (gate, id) total order.
    QueryDef("p99_epoch_mixture",
      (s, dir) => Curation.epochMixture(
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), col("lang"),
            // cast to long: the oracle's LEN(...) is BIGINT, and the
            // driver's correctness hash is dtype-sensitive on this
            // returned column (r14 judge root-cause)
            when(col("text").isNotNull,
              size(split(trim(col("text")), "\\s+"))).cast("long").as("n_toks")),
        "doc_id", "n_toks", "lang",
        targets = Map("en" -> 30000L), defaultTarget = 2000L)
        .orderBy("doc_id"),
      Some("""WITH t AS (
             |  SELECT doc_id, lang,
             |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_toks,
             |         ((doc_id % 100000 + 6) * 2654435761) % 1000000 AS gate
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), a AS (
             |  SELECT lang, SUM(n_toks) AS avail FROM t GROUP BY lang
             |), c AS (
             |  SELECT t.doc_id, t.lang, t.n_toks, a.avail,
             |         CASE WHEN t.lang = 'en' THEN 30000 ELSE 2000 END AS target,
             |         SUM(t.n_toks) OVER (PARTITION BY t.lang ORDER BY t.gate, t.doc_id
             |                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |           - t.n_toks AS cum
             |  FROM t JOIN a USING (lang)
             |), r AS (
             |  SELECT doc_id, lang, n_toks,
             |         CAST((CASE WHEN avail > 0 THEN target // avail ELSE 0 END)
             |         + (CASE WHEN avail > 0 AND cum < target % avail THEN 1 ELSE 0 END) AS BIGINT) AS repeat_count
             |  FROM c
             |)
             |SELECT doc_id, lang, n_toks, repeat_count FROM r
             |WHERE repeat_count > 0
             |ORDER BY doc_id""".stripMargin)),

    // The two-batch CHAINED recrawl shape: state built on the 70%
    // prior, rolled past a first batch with advanceState, then a second
    // batch curated against the ADVANCED state — the driver-checked
    // form of the state-chaining contract (TrainingPipelineSpec pins the
    // crafted cases; this pins the documents-table equivalence). The
    // oracle is the same full-pipeline replay restricted to the second
    // batch's ids: the full run has no batch boundaries at all, so a
    // green check proves the chained incremental path converges to it.
    QueryDef("p100_curate_chained",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val mx = docs.agg(max("doc_id")).head().getLong(0)
        val (c1, c2) = (mx * 7 / 10, mx * 9 / 10)
        val state0 = TrainingPipeline.curateState(
          docs.where(col("doc_id") <= c1), "doc_id", "text",
          minQuality = 0.3, minWords = 20)
        val state1 = TrainingPipeline.advanceState(state0,
          docs.where(col("doc_id") > c1 && col("doc_id") <= c2),
          "doc_id", "text")
        TrainingPipeline.curateIncremental(
          state1, docs.where(col("doc_id") > c2), "doc_id", "text")
          .orderBy("doc_id")
      },
      Some(curatePipelineSql(9))),

    // The composed pipeline's ops card: docs surviving / dropped per
    // stage, each doc counted against the FIRST stage that kills it
    // (attribution falls out of the sequential composition). The oracle
    // counts the SAME stage frontiers the equivalence oracles select
    // from; disabled stages (seen gate, entropy, decon here) must
    // report exactly 0 dropped.
    QueryDef("p101_curate_report",
      (s, dir) => TrainingPipeline.curateReport(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", minQuality = 0.3, minWords = 20),
      Some(s"""WITH RECURSIVE ${curateStagesSql}
             |, s AS (
             |  SELECT 0 AS stage_idx, 'ingested' AS stage, (SELECT count(*) FROM f) AS docs_surviving
             |  UNION ALL SELECT 1, 'seen_gate', (SELECT count(*) FROM f)
             |  UNION ALL SELECT 2, 'entropy', (SELECT count(*) FROM f)
             |  UNION ALL SELECT 3, 'floors', (SELECT count(*) FROM corpus)
             |  UNION ALL SELECT 4, 'dedup', (SELECT count(*) FROM cleaned)
             |  UNION ALL SELECT 5, 'rules', (SELECT count(*) FROM screened)
             |  UNION ALL SELECT 6, 'decontamination', (SELECT count(*) FROM screened)
             |)
             |SELECT stage_idx, stage, docs_surviving,
             |       COALESCE(LAG(docs_surviving) OVER (ORDER BY stage_idx)
             |                - docs_surviving, 0) AS docs_dropped
             |FROM s ORDER BY stage_idx""".stripMargin)),

    // Partition-pruned text-search serving: the index is written once
    // (postings partitioned by term bucket + one stats row) and the
    // query reads ONLY the named terms' buckets; scores are exactly
    // p23's BM25 tree, so the oracle is p23's chain with the
    // deterministic (score desc, doc asc) top-k frontier on top.
    QueryDef("p102_text_search_topk",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p102_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        TextSearch.searchTopK(s, idx,
          Seq("join", "vector", "filter"), k = 10)
          .orderBy(col("score").desc, col("doc").asc)
      },
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), q AS (
             |  SELECT doc, term FROM terms WHERE term IN ('join', 'vector', 'filter')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc = dl.doc, stats
             |)
             |SELECT doc, ROUND(SUM(c), 6) AS score, COUNT(*) AS n_matched
             |FROM contrib GROUP BY doc
             |ORDER BY score DESC, doc ASC LIMIT 10""".stripMargin)),

    // Text-search index lifecycle (delete + compact): tombstone-delete
    // doc_id % 9 = 2 from the p102 layout — the (doc, dl) rows land
    // under _tombstones, serving subtracts them from the BM25 corpus
    // constants (n_docs, avgdl) closed-form and anti-joins the postings
    // slice, so ranked results AND scores shift exactly as a rebuild's
    // would, with no rewrite. Then compact (postings/doclens rewritten
    // minus the docs, stats refreshed, set cleared) and search again.
    // The oracle is the full BM25 replay over the corpus WITHOUT the
    // deleted docs, emitted under both phase labels — a green hash
    // proves tombstoned serving ≡ compacted serving ≡ rebuild.
    QueryDef("p125_text_search_delete",
      (s, dir) => {
        import s.implicits._
        val idx = s"target/graft-tmp/textsearch_p125_${math.abs(dir.hashCode)}"
        val docs = Tables.load(s, dir, "documents")
        TextSearch.writeIndex(docs, "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        TextSearch.deleteFromIndex(s, idx,
          docs.where(pmod(col("doc_id"), lit(9L)) === 2).select("doc_id"),
          "doc_id")
        def search() = TextSearch.searchTopK(s, idx,
          Seq("join", "vector", "filter"), k = 10)
        val tombstoned = search().collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2))).toSeq
          .toDF("doc", "score", "n_matched")
          .withColumn("phase", lit("tombstoned"))
        TextSearch.compactIndex(s, idx)
        search().withColumn("phase", lit("compacted"))
          .unionByName(tombstoned)
          .select("phase", "doc", "score", "n_matched")
          .orderBy(col("phase"), col("score").desc, col("doc"))
      },
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id % 9 <> 2
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), q AS (
             |  SELECT doc, term FROM terms WHERE term IN ('join', 'vector', 'filter')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc = dl.doc, stats
             |), final125 AS (
             |  SELECT doc, ROUND(SUM(c), 6) AS score, COUNT(*) AS n_matched
             |  FROM contrib GROUP BY doc
             |  ORDER BY score DESC, doc ASC LIMIT 10
             |)
             |SELECT 'compacted' AS phase, doc, score, n_matched FROM final125
             |UNION ALL
             |SELECT 'tombstoned' AS phase, doc, score, n_matched FROM final125
             |ORDER BY phase, score DESC, doc""".stripMargin)),

    // Batched serving over the same index: a whole query workload in
    // one pass (the decontamination-audit shape), per-query top-k via
    // a qid-partitioned row_number on the pre-rounded score. The
    // oracle replays the distinct (qid, term) workload as VALUES rows
    // against the p23 BM25 chain.
    QueryDef("p103_text_search_batch",
      (s, dir) => {
        // own dir: Verify materializes query batches concurrently, and
        // two writeIndex overwrites of one layout race on _temporary
        val idx = s"target/graft-tmp/textsearch_p103_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val workload = s.createDataFrame(Seq(
          (1L, "join vector filter"),
          (2L, "stream window"),
          (3L, "quality score text"))).toDF("qid", "query")
        TextSearch.searchTopKBatch(workload, "qid", "query", idx, k = 5)
          .orderBy("qid", "rank")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), qt AS (
             |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
             |                        (2, 'stream'), (2, 'window'),
             |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
             |), q AS (
             |  SELECT doc, term FROM terms
             |  WHERE term IN (SELECT DISTINCT term FROM qt)
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT qt.qid, tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM qt JOIN tf ON qt.term = tf.term
             |       JOIN dfreq ON tf.term = dfreq.term
             |       JOIN dl ON tf.doc = dl.doc, stats
             |), s AS (
             |  SELECT qid, doc, ROUND(SUM(c), 6) AS score, COUNT(*) AS n_matched
             |  FROM contrib GROUP BY qid, doc
             |), r AS (
             |  SELECT CAST(qid AS BIGINT) AS qid,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS INT) AS rank,
             |         doc, score, n_matched
             |  FROM s
             |)
             |SELECT qid, rank, doc, score, n_matched FROM r
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // Leakage-safe split: the gate runs on the near-dup CLUSTER
    // representative, so near-duplicates never straddle train/eval.
    // Same LSH params as p13 (candidate recall is total on this corpus,
    // so the exact all-pairs oracle components match the banded run);
    // oracle = ccDedupTail's labels + the p43 gate arithmetic applied
    // to COALESCE(label, doc_id).
    QueryDef("p104_leakage_safe_split",
      (s, dir) => Curation.leakageSafeSplit(
        Tables.load(s, dir, "documents").select("doc_id", "lang", "text"),
        "doc_id", "text", Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
        threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
        .select("doc_id", "lang", "split")
        .orderBy("doc_id"),
      Some(s"""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, lang, text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), ${ccDedupTail("0.12")}, rep AS (
             |  SELECT c.doc_id, c.lang, COALESCE(l.label, c.doc_id) AS rep
             |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc
             |), g AS (
             |  SELECT doc_id, lang,
             |         ((rep % 100000) * 2654435761) % 1000000 AS gate
             |  FROM rep
             |)
             |SELECT doc_id, lang,
             |       CASE WHEN gate < 800000 THEN 'train'
             |            WHEN gate < 900000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM g ORDER BY doc_id""".stripMargin)),

    // URL canonicalization: deterministic messy URLs synthesized from
    // doc_id (mixed case, www-variants, default port, tracking params,
    // doubled separators, fragments), normalized by the codegen regexp
    // chain. The oracle states the EXPECTED canonical form analytically
    // per case arm — it pins the semantics, not the regex dialect.
    QueryDef("p105_url_normalize",
      (s, dir) => {
        val url = expr(syntheticUrlExpr)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            Urls.normalizeUrl(col("url")).as("url_norm"),
            Urls.hostOf(col("url")).as("host"),
            Urls.registrableHost(col("url")).as("site"))
          .orderBy("doc_id")
      },
      Some(s"""WITH u AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
             |           || 'host-' || (doc_id % 37) || '.example.org' AS host,
             |         'host-' || (doc_id % 37) || '.example.org' AS site,
             |         '/Pages/' || doc_id ||
             |         CASE doc_id % 4
             |           WHEN 0 THEN '?ref_id=' || doc_id
             |           WHEN 1 THEN '?id=' || doc_id
             |           WHEN 2 THEN ''
             |           ELSE '?a=1&b=2' END AS rest
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id, 'http://' || host || rest AS url_norm, host, site
             |FROM u ORDER BY doc_id""".stripMargin)),

    // Per-host contribution cap: at most 5 docs per registrable host in
    // deterministic (gate, id) order — unbounded-strata variant of the
    // de-skewed selection. The oracle replays the gate + rank directly.
    QueryDef("p106_host_cap",
      (s, dir) => {
        val url = expr(syntheticUrlExpr)
        val withSite = Tables.load(s, dir, "documents")
          .select(col("doc_id"), url.as("url"))
          .withColumn("site", Urls.registrableHost(col("url")))
          .select("doc_id", "site")
        Curation.capPerStratum(withSite, "doc_id", "site", cap = 5)
          .orderBy("doc_id")
      },
      Some("""WITH u AS (
             |  SELECT doc_id,
             |         'host-' || (doc_id % 37) || '.example.org' AS site,
             |         ((doc_id % 100000) * 2654435761) % 1000000 AS gate
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), r AS (
             |  SELECT doc_id, site,
             |         ROW_NUMBER() OVER (PARTITION BY site ORDER BY gate, doc_id) AS rk
             |  FROM u
             |)
             |SELECT doc_id, site FROM r WHERE rk <= 5 ORDER BY doc_id""".stripMargin)),

    // Split contamination audit: the id-gated split straddles near-dup
    // pairs (each pair's endpoints gate independently); the cluster-
    // gated split must straddle ZERO. One pairs mining, reused for the
    // clusters and both audits; the oracle replays pairs + labels
    // (ccDedupTail) and both gate assignments.
    QueryDef("p107_split_leakage_audit",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
        val pairs = Dedup.minhashNearDups(docs, "doc_id", "text",
          threshold = 0.12, shingleK = 3, numHashes = 32, bands = 16)
        val clusters = Dedup.nearDupClusters(pairs)
        val naive = Curation.splitCorpus(docs.select("doc_id"), "doc_id", weights)
        val safe = Curation.leakageSafeSplit(docs, "doc_id", "text", weights,
          clusters = clusters)
        val nAudit = Curation.splitLeakageAudit(pairs, naive, "doc_id")
          .select(col("n_pairs"), col("n_straddling").as("naive_straddle"))
        val sAudit = Curation.splitLeakageAudit(pairs, safe, "doc_id")
          .select(col("n_straddling").as("safe_straddle"))
        nAudit.crossJoin(broadcast(sAudit))
      },
      Some(s"""WITH RECURSIVE corpus AS (
             |  SELECT doc_id, text FROM read_parquet('{SFDIR}/documents.parquet')
             |), ${ccDedupTail("0.12")}, rep AS (
             |  SELECT c.doc_id, COALESCE(l.label, c.doc_id) AS rep
             |  FROM corpus c LEFT JOIN labels l ON c.doc_id = l.doc
             |), sp AS (
             |  SELECT doc_id,
             |    CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 800000 THEN 'train'
             |         WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 900000 THEN 'val'
             |         ELSE 'test' END AS sp_naive,
             |    CASE WHEN ((rep % 100000) * 2654435761) % 1000000 < 800000 THEN 'train'
             |         WHEN ((rep % 100000) * 2654435761) % 1000000 < 900000 THEN 'val'
             |         ELSE 'test' END AS sp_safe
             |  FROM rep
             |)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |       CAST(COALESCE(SUM(CASE WHEN a.sp_naive <> b.sp_naive THEN 1 ELSE 0 END), 0) AS BIGINT) AS naive_straddle,
             |       CAST(COALESCE(SUM(CASE WHEN a.sp_safe <> b.sp_safe THEN 1 ELSE 0 END), 0) AS BIGINT) AS safe_straddle
             |FROM pairs p JOIN sp a ON p.doc_a = a.doc_id JOIN sp b ON p.doc_b = b.doc_id""".stripMargin)),

    // Inter-annotator agreement card: Cohen's kappa between two
    // deterministic synthetic annotators (one perturbs labels on a
    // doc_id lattice, one abstains on another). Kappa is the EXACT
    // integer ratio (agree·n − Σ marg·marg)/(n² − Σ) — no intermediate
    // double division — so both engines agree to the last rounded digit.
    QueryDef("p108_label_agreement",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("lbl_a", col("lang"))
          .withColumn("lbl_b",
            when(pmod(col("doc_id"), lit(13)) === 0, lit(null))
              .when(pmod(col("doc_id"), lit(7)) === 0, lit("xx"))
              .otherwise(col("lang")))
        Agreement.cohenKappa(docs, "lbl_a", "lbl_b")
      },
      Some("""WITH t AS (
             |  SELECT lang AS la,
             |         CASE WHEN doc_id % 13 = 0 THEN NULL
             |              WHEN doc_id % 7 = 0 THEN 'xx'
             |              ELSE lang END AS lb
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), f AS (
             |  SELECT la, lb FROM t WHERE la IS NOT NULL AND lb IS NOT NULL
             |), c AS (
             |  SELECT la, lb, COUNT(*) AS c FROM f GROUP BY la, lb
             |), nn AS (
             |  SELECT SUM(c) AS n,
             |         SUM(CASE WHEN la = lb THEN c ELSE 0 END) AS agree
             |  FROM c
             |), rm AS (SELECT la, SUM(c) AS ra FROM c GROUP BY la
             |), cm AS (SELECT lb, SUM(c) AS rb FROM c GROUP BY lb
             |), s AS (
             |  SELECT COALESCE(SUM(ra * rb), 0) AS s
             |  FROM rm JOIN cm ON rm.la = cm.lb
             |)
             |SELECT CAST(n AS BIGINT) AS n,
             |       ROUND(CAST(agree AS DOUBLE) / n, 6) AS po,
             |       ROUND(CAST(s AS DOUBLE) / (n * n), 6) AS pe,
             |       CASE WHEN n * n <> s
             |            THEN ROUND(CAST(agree * n - s AS DOUBLE) / (n * n - s), 6)
             |       END AS kappa
             |FROM nn, s""".stripMargin)),

    // Majority vote across three synthetic annotators, with the
    // plurality share and ties resolved to null (a resolver must not
    // invent a winner). The lattice makes all outcomes occur: clean
    // majorities, 1-1-1 ties (doc_id ≡ 0 mod 77), abstentions.
    QueryDef("p109_majority_vote",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .withColumn("lbl_a", col("lang"))
          .withColumn("lbl_b",
            when(pmod(col("doc_id"), lit(13)) === 0, lit(null))
              .when(pmod(col("doc_id"), lit(7)) === 0, lit("xx"))
              .otherwise(col("lang")))
          .withColumn("lbl_c",
            when(pmod(col("doc_id"), lit(3)) === 0, lit(null))
              .when(pmod(col("doc_id"), lit(11)) === 0, lit("yy"))
              .otherwise(col("lang")))
        Agreement.majorityVote(docs, "doc_id", Seq("lbl_a", "lbl_b", "lbl_c"))
          .select("doc_id", "label_major", "n_votes", "agreement")
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, lang AS a,
             |         CASE WHEN doc_id % 13 = 0 THEN NULL
             |              WHEN doc_id % 7 = 0 THEN 'xx'
             |              ELSE lang END AS b,
             |         CASE WHEN doc_id % 3 = 0 THEN NULL
             |              WHEN doc_id % 11 = 0 THEN 'yy'
             |              ELSE lang END AS c
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), v AS (
             |  SELECT doc_id, lbl
             |  FROM (SELECT doc_id, unnest([a, b, c]) AS lbl FROM t)
             |  WHERE lbl IS NOT NULL
             |), cnt AS (
             |  SELECT doc_id, lbl, COUNT(*) AS c FROM v GROUP BY doc_id, lbl
             |), agg AS (
             |  SELECT doc_id, MAX(c) AS m, SUM(c) AS nv FROM cnt GROUP BY doc_id
             |), top AS (
             |  SELECT cnt.doc_id, agg.m, agg.nv,
             |         COUNT(*) AS ties, MIN(lbl) AS tp
             |  FROM cnt JOIN agg ON cnt.doc_id = agg.doc_id AND cnt.c = agg.m
             |  GROUP BY cnt.doc_id, agg.m, agg.nv
             |)
             |SELECT d.doc_id,
             |       CASE WHEN t2.ties = 1 THEN t2.tp END AS label_major,
             |       CAST(COALESCE(t2.nv, 0) AS BIGINT) AS n_votes,
             |       ROUND(CAST(t2.m AS DOUBLE) / t2.nv, 6) AS agreement
             |FROM t d LEFT JOIN top t2 ON d.doc_id = t2.doc_id
             |ORDER BY d.doc_id""".stripMargin)),

    // Unicode normalization (native codegen Expression with an
    // allocation-free ASCII fast path): synthesized composition cases —
    // combining marks, ligatures, fullwidth forms, circled digits —
    // normalized to NFC (oracle: DuckDB's nfc_normalize over the same
    // construction) and NFKC (oracle: expected forms stated literally —
    // DuckDB has no NFKC, and the analytic statement pins semantics).
    QueryDef("p110_unicode_normalize",
      (s, dir) => {
        graft.functions.GraftFunctions.ensureRegistered(s)
        // ́ resolves at Scala compile time: the SQL literal holds
        // the raw combining acute (Spark's char() truncates mod 256, so
        // a runtime construction would be wrong)
        val raw = expr(
          """CASE CAST(doc_id % 5 AS INT)
            |  WHEN 0 THEN 'café'
            |  WHEN 1 THEN 'ﬁle ﬀort'
            |  WHEN 2 THEN 'Ａ１ｂ'
            |  WHEN 3 THEN '①②'
            |  ELSE 'plain ascii text' END""".stripMargin)
        Tables.load(s, dir, "documents")
          .select(col("doc_id"), raw.as("raw"))
          .select(col("doc_id"),
            graft.functions.GraftFunctions.unicodeNormalize(col("raw"), "NFC")
              .as("nfc"),
            graft.functions.GraftFunctions.unicodeNormalize(col("raw"), "NFKC")
              .as("nfkc"))
          .orderBy("doc_id")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CASE doc_id % 5
             |           WHEN 0 THEN 'cafe' || chr(769)
             |           WHEN 1 THEN 'ﬁle ﬀort'
             |           WHEN 2 THEN 'Ａ１ｂ'
             |           WHEN 3 THEN '①②'
             |           ELSE 'plain ascii text' END AS raw
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id, nfc_normalize(raw) AS nfc,
             |       CASE doc_id % 5
             |         WHEN 0 THEN 'café'
             |         WHEN 1 THEN 'file ffort'
             |         WHEN 2 THEN 'A1b'
             |         WHEN 3 THEN '12'
             |         ELSE 'plain ascii text' END AS nfkc
             |FROM t ORDER BY doc_id""".stripMargin)),

    // BPE round trip: encode with the </w> end-of-word marker, decode,
    // and the result must be the normalized token stream EXACTLY —
    // model-independent (whatever merges train learned, decode must
    // invert them), which is why the oracle never mentions the model.
    QueryDef("p111_bpe_roundtrip",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val model = Bpe.train(docs, "text",
          numMerges = bpeMerges, maxWords = bpeMaxWords)
        Bpe.encode(docs, "doc_id", "text", model, wordEnd = "</w>")
          .select(col("doc"),
            Bpe.decodePieces(col("pieces"), "</w>").as("decoded"))
          .orderBy("doc")
      },
      Some(s"""WITH t AS (
             |  SELECT doc_id,
             |         ${segToksSql("text")} AS tk
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |)
             |SELECT doc_id AS doc, array_to_string(tk, ' ') AS decoded
             |FROM t WHERE len(tk) > 0 ORDER BY doc""".stripMargin)),

    // Host concentration card: gini + top-share of docs-per-host over
    // the synthesized URL corpus. The gini never ranks hosts — the
    // count-of-counts frame (√n-bounded) carries prefix sums instead;
    // the oracle replays the same integer arithmetic.
    QueryDef("p112_host_concentration",
      (s, dir) => Profiling.concentration(
        Tables.load(s, dir, "documents")
          .select(Urls.registrableHost(expr(syntheticUrlExpr)).as("site")),
        "site"),
      Some("""WITH u AS (
             |  SELECT 'host-' || (doc_id % 37) || '.example.org' AS site
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), c AS (
             |  SELECT site, COUNT(*) AS c FROM u GROUP BY site
             |), cc AS (
             |  SELECT c, COUNT(*) AS f FROM c GROUP BY c
             |), p AS (
             |  SELECT c, f,
             |         COALESCE(SUM(f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS fb,
             |         COALESCE(SUM(c * f) OVER (ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS sb
             |  FROM cc
             |), d AS (
             |  SELECT COALESCE(SUM(f * (c * fb - sb)), 0) AS dsum FROM p
             |), t AS (
             |  SELECT SUM(f) AS nk, SUM(c * f) AS n, MAX(c) AS top FROM cc
             |)
             |SELECT CAST(nk AS BIGINT) AS n_keys, CAST(n AS BIGINT) AS n_rows,
             |       ROUND(CAST(top AS DOUBLE) / n, 6) AS top_share,
             |       ROUND(CAST(dsum AS DOUBLE) / (nk * n), 6) AS gini
             |FROM t, d""".stripMargin)),

    // Archive-scale targeted decontamination, end to end: the corpus is
    // stored ONCE (offset-indexed WARC archive + persisted shingle
    // index); a new benchmark probes the index (partition-pruned, never
    // re-reading corpus text) and only the flagged docs are fetched
    // from the archive by byte range. Same contamination semantics as
    // p21 (≥3 shared 8-shingles) — the oracle replays the overlap
    // exactly, proving probe + fetch ≡ the corpus-scan screen.
    QueryDef("p113_archive_decontaminate",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
        val block = docs.where(pmod(col("doc_id"), lit(20)) === 0)
        val base = s"target/graft-tmp/archdecon_p113_${math.abs(dir.hashCode)}"
        graft.sources.Warc.writeShardsIndexed(
          corpus, "doc_id", "text", s"$base/archive", shards = 4)
        Dedup.writeShingleIndex(
          corpus, "doc_id", "text", s"$base/shingles", shingleK = 8)
        // two consumers (fetch's wanted ids + the output join) — one probe
        val contaminated = OperatorCache.materialize(Dedup.probeContamination(
          s, s"$base/shingles", block, "doc_id", "text", minOverlap = 3))
        graft.sources.Warc.fetch(s, s"$base/archive",
            contaminated.select(col("doc").cast("string").as("id")))
          .select(
            regexp_extract(col("target_uri"), "/doc/(\\d+)$", 1)
              .cast("long").as("doc_id"),
            decode(col("payload"), "UTF-8").as("text"))
          .join(contaminated.withColumnRenamed("doc", "doc_id"), "doc_id")
          .select("doc_id", "n_overlap", "text")
          .orderBy("doc_id")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id, text
             |  FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 <> 0
             |), block AS (
             |  SELECT text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 = 0
             |), btoks AS (
             |  SELECT list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM block
             |), bsh AS (
             |  SELECT DISTINCT shingle FROM (
             |    SELECT unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                 i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |    FROM btoks WHERE len(toks) >= 8
             |  )
             |), ctoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus
             |), csh AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |  FROM ctoks WHERE len(toks) >= 8
             |), ov AS (
             |  SELECT doc_id, COUNT(DISTINCT csh.shingle) AS n_overlap
             |  FROM csh JOIN bsh USING (shingle)
             |  GROUP BY doc_id HAVING COUNT(DISTINCT csh.shingle) >= 3
             |)
             |SELECT o.doc_id, o.n_overlap, c.text
             |FROM ov o JOIN corpus c USING (doc_id) ORDER BY doc_id""".stripMargin)),

    // Shingle-index recrawl lifecycle (update + delete + compact): the
    // decontamination layout advanced past a re-crawl batch the way
    // p125 advances the BM25 index. v1 indexes docs %10=3 as draft
    // placeholders; the UPDATE re-crawls them to their real text (new
    // contamination appears) and rewrites docs %10=1 to clean pages
    // (old contamination retires — gen-aware tombstones, not doc-wide);
    // docs %10=5 are DELETED. Probe once tombstoned, once compacted —
    // both phases must equal the corpus-scan screen over the FINAL
    // corpus, which the oracle replays (p113's overlap chain + the
    // lifecycle's CASE text and filters).
    QueryDef("p126_shingle_index_update",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
        val block = docs.where(pmod(col("doc_id"), lit(20)) === 0)
        val idx = s"target/graft-tmp/shidx_p126_${math.abs(dir.hashCode)}"
        val m10 = pmod(col("doc_id"), lit(10))
        Dedup.writeShingleIndex(
          corpus.select(col("doc_id"),
            when(m10 === 3, concat(lit("draft placeholder "), col("doc_id")))
              .otherwise(col("text")).as("text")),
          "doc_id", "text", idx, shingleK = 8)
        Dedup.updateShingleIndex(
          corpus.where(m10 === 3 || m10 === 1)
            .select(col("doc_id"),
              when(m10 === 1,
                concat(lit("rewritten clean page "), col("doc_id")))
                .otherwise(col("text")).as("text")),
          "doc_id", "text", idx)
        Dedup.deleteFromShingleIndex(s, idx,
          corpus.where(m10 === 5).select("doc_id"), "doc_id")
        def probe() = Dedup.probeContamination(
          s, idx, block, "doc_id", "text", minOverlap = 3)
        val tombstoned = probe().collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSeq
          .toDF("doc", "n_overlap").withColumn("phase", lit("tombstoned"))
        Dedup.compactShingleIndex(s, idx)
        probe().withColumn("phase", lit("compacted"))
          .unionByName(tombstoned)
          .select("phase", "doc", "n_overlap")
          .orderBy("phase", "doc")
      },
      Some("""WITH corpus AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 10 = 1
             |              THEN 'rewritten clean page ' || CAST(doc_id AS VARCHAR)
             |              ELSE text END AS text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id % 20 <> 0 AND doc_id % 10 <> 5
             |), block AS (
             |  SELECT text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 = 0
             |), btoks AS (
             |  SELECT list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM block
             |), bsh AS (
             |  SELECT DISTINCT shingle FROM (
             |    SELECT unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                 i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |    FROM btoks WHERE len(toks) >= 8
             |  )
             |), ctoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus
             |), csh AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |  FROM ctoks WHERE len(toks) >= 8
             |), ov AS (
             |  SELECT doc_id AS doc, COUNT(DISTINCT csh.shingle) AS n_overlap
             |  FROM csh JOIN bsh USING (shingle)
             |  GROUP BY doc_id HAVING COUNT(DISTINCT csh.shingle) >= 3
             |)
             |SELECT 'compacted' AS phase, doc, n_overlap FROM ov
             |UNION ALL
             |SELECT 'tombstoned' AS phase, doc, n_overlap FROM ov
             |ORDER BY phase, doc""".stripMargin)),

    // The composed recrawl capstone: ONE Recrawl.advance call applies a
    // crawl cycle's deltas (changed docs %10∈{1,3}, deletions %10=5) to
    // BOTH text-serving layouts — the BM25 index and the shingle
    // decontamination index — then both are SERVED, once with
    // tombstones pending and once compacted. The oracle rebuilds both
    // families from the final corpus in SQL (p125's BM25 chain + p126's
    // overlap chain over the same CASE'd corpus), so a green hash
    // proves one advance call ≡ per-layout rebuilds, across both
    // layouts and both lifecycle phases.
    QueryDef("p128_recrawl_serving",
      (s, dir) => {
        import s.implicits._
        val docs = Tables.load(s, dir, "documents")
        val corpus = docs.where(pmod(col("doc_id"), lit(20)) =!= 0)
        val block = docs.where(pmod(col("doc_id"), lit(20)) === 0)
        val base = s"target/graft-tmp/recrawl_p128_${math.abs(dir.hashCode)}"
        val m10 = pmod(col("doc_id"), lit(10))
        val v1 = corpus.select(col("doc_id"),
          when(m10 === 3, concat(lit("draft placeholder "), col("doc_id")))
            .otherwise(col("text")).as("text"))
        val layouts = Recrawl.ServingLayouts(
          textIndex = Some(s"$base/bm25"),
          shingleIndex = Some(s"$base/shingles"))
        TextSearch.writeIndex(v1, "doc_id", "text", s"$base/bm25")
        Dedup.writeShingleIndex(v1, "doc_id", "text", s"$base/shingles",
          shingleK = 8)
        OperatorCache.releaseAll(s)
        // the delta also carries brand-NEW pages (ids above the corpus
        // range) — the upsert half of the update contract, oracle-covered
        val changed = corpus.where(m10 === 3 || m10 === 1)
          .select(col("doc_id"),
            when(m10 === 1,
              concat(lit("rewritten clean page "), col("doc_id")))
              .otherwise(col("text")).as("text"))
          .unionByName(corpus.where(m10 === 7)
            .select((col("doc_id") + 10000000L).as("doc_id"),
              concat(lit("fresh crawled page about join vector filter "),
                col("doc_id")).as("text")))
        Recrawl.advance(s, changed,
          corpus.where(m10 === 5).select("doc_id"), "doc_id", "text", layouts)
        OperatorCache.releaseAll(s)
        def probes() = {
          val bm = TextSearch.searchTopK(s, s"$base/bm25",
              Seq("join", "vector", "filter"), k = 10)
            .select(lit("bm25").as("family"), col("doc"),
              col("score").as("metric"))
          val de = Dedup.probeContamination(s, s"$base/shingles",
              block, "doc_id", "text", minOverlap = 3)
            .select(lit("decon").as("family"), col("doc"),
              col("n_overlap").cast("double").as("metric"))
          bm.unionByName(de)
        }
        val tombstoned = probes().collect()
          .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
          .toDF("family", "doc", "metric")
          .withColumn("phase", lit("tombstoned"))
        Recrawl.compact(s, layouts)
        probes().withColumn("phase", lit("compacted"))
          .unionByName(tombstoned)
          .select("phase", "family", "doc", "metric")
          .orderBy("phase", "family", "doc")
      },
      Some("""WITH corpus128 AS (
             |  SELECT doc_id,
             |         CASE WHEN doc_id % 10 = 1
             |              THEN 'rewritten clean page ' || CAST(doc_id AS VARCHAR)
             |              ELSE text END AS text
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id % 20 <> 0 AND doc_id % 10 <> 5
             |  UNION ALL
             |  SELECT doc_id + 10000000,
             |         'fresh crawled page about join vector filter ' || CAST(doc_id AS VARCHAR)
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |  WHERE doc_id % 20 <> 0 AND doc_id % 10 = 7
             |), terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM corpus128
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), q AS (
             |  SELECT doc, term FROM terms WHERE term IN ('join', 'vector', 'filter')
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM tf JOIN dfreq USING (term) JOIN dl ON tf.doc = dl.doc, stats
             |), bmfinal AS (
             |  SELECT doc, ROUND(SUM(c), 6) AS metric
             |  FROM contrib GROUP BY doc
             |  ORDER BY metric DESC, doc ASC LIMIT 10
             |), block AS (
             |  SELECT text FROM read_parquet('{SFDIR}/documents.parquet') WHERE doc_id % 20 = 0
             |), btoks AS (
             |  SELECT list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM block
             |), bsh AS (
             |  SELECT DISTINCT shingle FROM (
             |    SELECT unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                 i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |    FROM btoks WHERE len(toks) >= 8
             |  )
             |), ctoks AS (
             |  SELECT doc_id,
             |         list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                     x -> x <> '') AS toks
             |  FROM corpus128
             |), csh AS (
             |  SELECT doc_id, unnest(list_transform(range(1, len(toks) - 8 + 2),
             |                                       i -> list_aggregate(toks[i:i+7], 'string_agg', ' '))) AS shingle
             |  FROM ctoks WHERE len(toks) >= 8
             |), ov AS (
             |  SELECT doc_id AS doc, COUNT(DISTINCT csh.shingle) AS n_overlap
             |  FROM csh JOIN bsh USING (shingle)
             |  GROUP BY doc_id HAVING COUNT(DISTINCT csh.shingle) >= 3
             |), probes AS (
             |  SELECT 'bm25' AS family, doc, metric FROM bmfinal
             |  UNION ALL
             |  SELECT 'decon' AS family, doc, CAST(n_overlap AS DOUBLE) AS metric FROM ov
             |)
             |SELECT 'compacted' AS phase, family, doc, metric FROM probes
             |UNION ALL
             |SELECT 'tombstoned' AS phase, family, doc, metric FROM probes
             |ORDER BY phase, family, doc""".stripMargin)),

    // Hybrid retrieval: BM25 candidates (k=20 through the index)
    // reranked by embedding cosine, blended 50/50 with both sides
    // 6-rounded. Query vectors are real embedding rows (vec_id = 7·qid);
    // the oracle replays the whole p103 BM25 chain, the candidate cut,
    // and the blend.
    QueryDef("p114_hybrid_search",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p114_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val emb = Tables.load(s, dir, "embeddings")
        val workload = s.createDataFrame(Seq(
            (1L, "join vector filter", 7L),
            (2L, "stream window", 14L),
            (3L, "quality score text", 21L))).toDF("qid", "query", "vid")
          .join(emb.select(col("vec_id").as("vid"),
            col("embedding").as("qvec")), "vid")
        TextSearch.searchHybridBatch(workload, "qid", "query", "qvec", idx,
          emb, "vec_id", "embedding", k = 5, candidates = 20)
          .orderBy("qid", "rank")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), qt AS (
             |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
             |                        (2, 'stream'), (2, 'window'),
             |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
             |), q AS (
             |  SELECT doc, term FROM terms
             |  WHERE term IN (SELECT DISTINCT term FROM qt)
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT qt.qid, tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM qt JOIN tf ON qt.term = tf.term
             |       JOIN dfreq ON tf.term = dfreq.term
             |       JOIN dl ON tf.doc = dl.doc, stats
             |), sc AS (
             |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY qid, doc
             |), cr AS (
             |  SELECT qid, doc, score,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rn
             |  FROM sc
             |), cand AS (
             |  SELECT qid, doc, score FROM cr WHERE rn <= 20
             |), qv AS (
             |  SELECT vq.qid, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
             |  FROM (VALUES (1, 7), (2, 14), (3, 21)) vq(qid, vid)
             |  JOIN read_parquet('{SFDIR}/embeddings.parquet') e ON e.vec_id = vq.vid
             |), hy AS (
             |  SELECT c.qid, c.doc, c.score,
             |         ROUND(0.5 * c.score +
             |               0.5 * ROUND(list_cosine_similarity(
             |                       list_transform(d.embedding, x -> CAST(x AS DOUBLE)), qv.qv), 6), 6) AS hybrid
             |  FROM cand c
             |  JOIN read_parquet('{SFDIR}/embeddings.parquet') d ON d.vec_id = c.doc
             |  JOIN qv ON c.qid = qv.qid
             |), hr AS (
             |  SELECT CAST(qid AS BIGINT) AS qid,
             |         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY hybrid DESC, doc ASC) AS INT) AS rank,
             |         doc, hybrid, score
             |  FROM hy
             |)
             |SELECT qid, rank, doc, hybrid, score FROM hr
             |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // Relatedness-grouped packing (the in-context-pretraining shape):
    // every training sequence draws only from ONE semantic cell, so a
    // context window holds related neighbors instead of random
    // concatenation. Cells come from the deterministic IVF trainer
    // (map-only typedlit assignment); the oracle replays the full
    // Lloyd trajectory (ivfAssignSql) plus the same gate/cumsum
    // packing rule as p29.
    QueryDef("p129_pack_related",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val index = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val cells = Similarity.ivfIndex(
          emb.select("vec_id", "embedding"), "embedding", index)
          .select(col("vec_id"), col("centroid"))
        Curation.packRelated(
          Tables.load(s, dir, "documents")
            .select(col("doc_id"),
              when(col("text").isNotNull,
                size(split(trim(col("text")), "\\s+"))).as("n_toks")),
          "doc_id", "n_toks",
          cells, "vec_id", "centroid",
          budgetTokens = 256L, subshards = 2)
          .select(col("doc_id"), col("cell"), col("subshard"),
            col("pack"), col("n_tokens"))
          .orderBy("doc_id")
      },
      Some(ivfAssignSql(8) +
        """, toks AS (
        |  SELECT doc_id,
        |         (((doc_id % 100000) + 1) * 2654435761) % 1000000 AS gate,
        |         CAST((((doc_id % 100000) + 1) * 2654435761) % 1000000 % 2 AS INT) AS subshard,
        |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
        |  FROM read_parquet('{SFDIR}/documents.parquet')
        |), pj AS (
        |  SELECT t.doc_id, a3.cid AS cell, t.subshard, t.gate, t.n_tokens
        |  FROM toks t JOIN a3 ON a3.vec_id = t.doc_id
        |), pc AS (
        |  SELECT doc_id, cell, subshard, n_tokens,
        |         SUM(n_tokens) OVER (PARTITION BY cell, subshard
        |                             ORDER BY gate, doc_id) AS cum
        |  FROM pj
        |)
        |SELECT doc_id, cell, subshard,
        |       CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 256.0) AS BIGINT) AS pack,
        |       n_tokens
        |FROM pc ORDER BY doc_id""".stripMargin)),

    // Reciprocal-rank fusion over the BM25 index + exact cosine ranks
    // (Cormack et al. 2009): rank-only fusion, no score calibration.
    // The oracle replays BM25 (p114's CTEs), the brute-force cosine
    // rank, and the 1/(60+rank) sum.
    QueryDef("p130_rrf_search",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p130_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val emb = Tables.load(s, dir, "embeddings")
        val workload = s.createDataFrame(Seq(
            (1L, "join vector filter", 7L),
            (2L, "stream window", 14L),
            (3L, "quality score text", 21L))).toDF("qid", "query", "vid")
          .join(emb.select(col("vec_id").as("vid"),
            col("embedding").as("qvec")), "vid")
        TextSearch.searchRrfBatch(workload, "qid", "query", "qvec", idx,
          emb, "vec_id", "embedding", k = 5, candidates = 20)
          .orderBy("qid", "rank")
      },
      Some("""WITH terms AS (
             |  SELECT doc_id AS doc,
             |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
             |                            x -> x <> '')) AS term
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), dl AS (
             |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
             |), stats AS (
             |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
             |), qt AS (
             |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
             |                        (2, 'stream'), (2, 'window'),
             |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
             |), q AS (
             |  SELECT doc, term FROM terms
             |  WHERE term IN (SELECT DISTINCT term FROM qt)
             |), tf AS (
             |  SELECT doc, term, COUNT(*) AS tf FROM q GROUP BY doc, term
             |), dfreq AS (
             |  SELECT term, COUNT(DISTINCT doc) AS df FROM q GROUP BY term
             |), contrib AS (
             |  SELECT qt.qid, tf.doc,
             |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
             |           * CAST(tf AS DOUBLE)
             |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
             |  FROM qt JOIN tf ON qt.term = tf.term
             |       JOIN dfreq ON tf.term = dfreq.term
             |       JOIN dl ON tf.doc = dl.doc, stats
             |), sc AS (
             |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM contrib GROUP BY qid, doc
             |), bm AS (
             |  SELECT qid, doc,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank_bm25
             |  FROM sc QUALIFY rank_bm25 <= 20
             |), qv AS (
             |  SELECT vq.qid, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qv
             |  FROM (VALUES (1, 7), (2, 14), (3, 21)) vq(qid, vid)
             |  JOIN read_parquet('{SFDIR}/embeddings.parquet') e ON e.vec_id = vq.vid
             |), vr AS (
             |  SELECT qid, doc,
             |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, doc ASC) AS rank_cos
             |  FROM (
             |    SELECT qv.qid, d.vec_id AS doc,
             |           ROUND(list_cosine_similarity(
             |             list_transform(d.embedding, x -> CAST(x AS DOUBLE)), qv.qv), 6) AS cos
             |    FROM read_parquet('{SFDIR}/embeddings.parquet') d, qv
             |  ) QUALIFY rank_cos <= 20
             |), fused AS (
             |  SELECT COALESCE(bm.qid, vr.qid) AS qid,
             |         COALESCE(bm.doc, vr.doc) AS doc,
             |         ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + bm.rank_bm25), 0)
             |             + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.rank_cos), 0), 6) AS rrf,
             |         CAST(bm.rank_bm25 AS INT) AS rank_bm25,
             |         CAST(vr.rank_cos AS INT) AS rank_cos
             |  FROM bm FULL OUTER JOIN vr ON bm.qid = vr.qid AND bm.doc = vr.doc
             |)
             |SELECT CAST(qid AS BIGINT) AS qid,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc ASC) AS INT) AS rank,
             |       doc, rrf, rank_bm25, rank_cos
             |FROM fused
             |QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // robots.txt screen (RFC 9309): parse per-host Allow/Disallow
    // rules for agent '*' — comments, stacked User-agent lines,
    // other-agent groups, empty values, mid-path '*' wildcards,
    // trailing-'$' anchors — then screen URLs on the EXACT host under
    // longest-match precedence (most octets wins, Allow wins ties,
    // unmatched allowed). The oracle replays the same parse over the
    // byte-identical fixture text (shared robotsTxtExpr), compiles the
    // same rule regexes, and replays the precedence with arg_max over
    // the 2·octets+allow score (≡ the (octets, allow) struct order).
    QueryDef("p131_robots_screen",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
        val robots = docs
          .select(pmod(col("doc_id"), lit(37L)).as("hn")).distinct()
          .select(concat(lit("host-"), col("hn").cast("string"),
            lit(".example.org")).as("host"),
            expr(robotsTxtExpr).as("robots"))
        val rules = Urls.robotsDisallows(robots, "host", "robots")
        val urls = docs.select(col("doc_id"),
          expr(syntheticUrlExpr).as("url"))
        Urls.robotsScreen(urls, "url", rules, idCol = Some("doc_id"))
          .select(col("doc_id"),
            Urls.hostOf(col("url")).as("host"),
            Urls.pathOf(col("url")).as("path"))
          .orderBy("doc_id")
      },
      Some(s"""WITH hosts AS (
             |  SELECT DISTINCT doc_id % 37 AS hn
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), rob AS (
             |  SELECT 'host-' || hn || '.example.org' AS host,
             |         $robotsTxtExpr AS txt
             |  FROM hosts
             |), rl0 AS (
             |  SELECT host, unnest(ls) AS raw, unnest(range(1, len(ls) + 1)) AS pos
             |  FROM (SELECT host, string_split(txt, chr(10)) AS ls FROM rob)
             |), rlines AS (
             |  SELECT host, pos,
             |         trim(regexp_replace(raw, '#.*$$', '')) AS line
             |  FROM rl0
             |), cls AS (
             |  SELECT host, pos, line,
             |         lower(line) LIKE 'user-agent:%' AS is_ua,
             |         CASE WHEN lower(line) LIKE 'user-agent:%'
             |              THEN trim(substr(line, 12)) END AS ua,
             |         CASE WHEN lower(line) LIKE 'disallow:%'
             |              THEN trim(substr(line, 10)) END AS dis,
             |         CASE WHEN lower(line) LIKE 'allow:%'
             |              THEN trim(substr(line, 7)) END AS alw
             |  FROM rlines
             |), prv AS (
             |  SELECT *, COALESCE(lag(is_ua) OVER (PARTITION BY host ORDER BY pos),
             |                     false) AS prev_ua
             |  FROM cls
             |), grp AS (
             |  SELECT *, SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
             |         OVER (PARTITION BY host ORDER BY pos) AS g
             |  FROM prv
             |), star AS (
             |  SELECT DISTINCT host, g FROM grp WHERE ua = '*'
             |), rr0 AS (
             |  SELECT DISTINCT grp.host, COALESCE(dis, alw) AS v,
             |         (alw IS NOT NULL) AS allow
             |  FROM grp JOIN star USING (host, g)
             |  WHERE COALESCE(dis, alw) IS NOT NULL AND COALESCE(dis, alw) <> ''
             |), rrules AS (
             |  SELECT host, allow, LENGTH(v) AS speclen,
             |         CASE WHEN strpos(v, '*') > 0 THEN substr(v, 1, strpos(v, '*') - 1)
             |              WHEN v LIKE '%$$' THEN substr(v, 1, LENGTH(v) - 1)
             |              ELSE v END AS prefix,
             |         CASE WHEN strpos(v, '*') > 0 OR v LIKE '%$$'
             |              THEN '^' || regexp_replace(regexp_replace(regexp_replace(v,
             |                     '([.+?^$$*{}()|\\[\\]\\\\])', '\\\\\\1', 'g'),
             |                     '\\\\\\*', '.*', 'g'),
             |                     '\\\\\\$$$$', '$$')
             |              END AS pattern
             |  FROM rr0
             |), u AS (
             |  SELECT doc_id,
             |         lower(CASE WHEN doc_id % 3 = 0 THEN 'www.' ELSE '' END
             |           || 'host-' || (doc_id % 37) || '.example.org') AS host,
             |         '/Pages/' || doc_id AS path
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), m AS (
             |  SELECT u.doc_id, r.allow, r.speclen
             |  FROM u JOIN rrules r ON r.host = u.host
             |   AND starts_with(u.path, r.prefix)
             |   AND (r.pattern IS NULL OR regexp_matches(u.path, r.pattern))
             |), blocked AS (
             |  SELECT doc_id FROM m GROUP BY doc_id
             |  HAVING NOT arg_max(allow,
             |    speclen * 2 + CASE WHEN allow THEN 1 ELSE 0 END)
             |)
             |SELECT doc_id, host, path FROM u
             |WHERE NOT EXISTS (SELECT 1 FROM blocked b WHERE b.doc_id = u.doc_id)
             |ORDER BY doc_id""".stripMargin)),

    // The polite-crawl capstone: page archive + the crawl's captured
    // robots.txt archive (the public crawls publish robotstxt/ as a
    // separate subset) → robots screen BEFORE extraction → HTML→text →
    // full curate chain → WET out, checked frame READ BACK from the
    // published shards. The robots parse itself is oracle-pinned by
    // p131; here the fixture's one rule (Disallow: /doc/1 for agent *)
    // reduces to the closed-form id screen the oracle applies.
    QueryDef("p132_robots_archive_curate",
      (s, dir) => {
        val scratch = s"target/graft-tmp/robarch_p132_${math.abs(dir.hashCode)}"
        val page = concat(
          lit("<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc "),
          col("doc_id").cast("string"),
          lit("</h1><!-- chrome --><p>"), col("text"),
          lit("</p><footer>fin</footer></body></html>"))
        graft.sources.Warc.writeShards(
          Tables.load(s, dir, "documents").select(col("doc_id"), page.as("html")),
          "doc_id", "html", s"$scratch/in", shards = 4)
        val robotsBody = Seq(
          "# crawl politeness",
          "User-agent: badbot",
          "Disallow: /",
          "",
          "User-agent: *",
          "Disallow: /doc/1",
        ).mkString("\n")
        graft.sources.Warc.writeShards(
          s.createDataFrame(Seq(("robots.txt", robotsBody))).toDF("k", "body"),
          "k", "body", s"$scratch/robots", shards = 1,
          uriPrefix = "http://example.org/")
        TrainingPipeline.curateArchive(s, s"$scratch/in", s"$scratch/out",
          extractHtml = true, robotsArchive = Some(s"$scratch/robots"))
          .orderBy("doc_id")
      },
      Some({
        val htmlSql =
          "'<html><head><title>t</title><style>p{color:red}</style>" +
            "</head><body><nav><a href=\"/\">Home</a> | <a href=\"/a\">" +
            "About</a></nav><h1>Doc ' || CAST(doc_id AS VARCHAR) || " +
            "'</h1><!-- chrome --><p>' || text || " +
            "'</p><footer>fin</footer></body></html>'"
        // the robots rule (Disallow: /doc/1, agent *) screens exactly
        // the URIs whose path starts with /doc/1 — ids rendering with a
        // leading '1'; the parse that derives this is pinned by p131
        val src = s"(SELECT doc_id, ${Html.toTextSql(s"($htmlSql)")} AS text " +
          "FROM read_parquet('{SFDIR}/documents.parquet') " +
          "WHERE CAST(doc_id AS VARCHAR) NOT LIKE '1%')"
        s"""WITH RECURSIVE ${curateStagesSqlFrom(src)}
           |SELECT doc_id, text,
           |       CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 980000 THEN 'train'
           |            WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 990000 THEN 'val'
           |            ELSE 'test' END AS split
           |FROM screened
           |ORDER BY doc_id""".stripMargin
      })),

    // Pack materialization — the trainer handoff: one row per pack
    // carrying the concatenated token sequence (docs in the packer's
    // fill order) and the doc-boundary offsets cross-document
    // attention masking needs. The oracle rebuilds the p29 packing,
    // then replays the ordered concat + prefix-sum boundaries.
    QueryDef("p133_pack_materialize",
      (s, dir) => {
        val docs = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            when(col("text").isNotNull,
              split(trim(col("text")), "\\s+")).as("toks"))
          .withColumn("n_toks", size(col("toks")).cast("long"))
        val packed = Curation.packSequences(docs, "doc_id", "n_toks",
          budgetTokens = 256L, shards = 8)
        Curation.materializePacks(packed, Seq("shard"), "doc_id", "toks",
          longestFirst = true)
          .select(col("shard"), col("pack"), col("n_docs"), col("n_tokens"),
            array_join(transform(col("docs"), d => d.cast("string")), " ")
              .as("docs"),
            array_join(transform(col("doc_boundaries"), b => b.cast("string")), " ")
              .as("bounds"),
            array_join(col("token_ids"), " ").as("tokens"))
          .orderBy("shard", "pack")
      },
      Some("""WITH t AS (
             |  SELECT doc_id,
             |         CAST((((doc_id % 100000) + 1) * 2654435761) % 1000000 % 8 AS INT) AS shard,
             |         string_split_regex(TRIM(text), '\s+') AS toks,
             |         CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS BIGINT) AS n_tokens
             |  FROM read_parquet('{SFDIR}/documents.parquet')
             |), c AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard
             |                                ORDER BY n_tokens DESC, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM t
             |), p AS (
             |  SELECT *, CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 256.0) AS BIGINT) AS pack
             |  FROM c
             |), p2 AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY shard, pack
             |                                ORDER BY n_tokens DESC, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM p
             |)
             |SELECT shard, pack,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY n_tokens DESC, doc_id), ' ') AS docs,
             |       array_to_string(list_prepend('0', list(CAST(cum2 AS VARCHAR) ORDER BY n_tokens DESC, doc_id)), ' ') AS bounds,
             |       array_to_string(flatten(list(toks ORDER BY n_tokens DESC, doc_id)), ' ') AS tokens
             |FROM p2 GROUP BY shard, pack
             |ORDER BY shard, pack""".stripMargin)),

    // The training-set freeze capstone: curate → semantic cells over
    // the SURVIVORS' embeddings → relatedness-grouped packing →
    // materialized packs published as a parquet layout and READ BACK.
    // The oracle chains the proven fragments end to end: the curate
    // stages, the Lloyd trajectory restricted to screened survivors,
    // the gate/cumsum packing, the ordered concat + boundary replay.
    QueryDef("p134_training_freeze",
      (s, dir) => {
        val out = s"target/graft-tmp/freeze_p134_${math.abs(dir.hashCode)}"
        TrainingPipeline.freezePacks(s,
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text",
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          out)
          .select(col("cell"), col("subshard"), col("pack"),
            col("n_docs"), col("n_tokens"),
            array_join(transform(col("docs"), d => d.cast("string")), " ")
              .as("docs"),
            array_join(transform(col("doc_boundaries"), b => b.cast("string")), " ")
              .as("bounds"),
            array_join(col("token_ids"), " ").as("tokens"))
          .orderBy("cell", "subshard", "pack")
      },
      Some(s"""WITH RECURSIVE ${curateStagesSqlFrom(
                 "read_parquet('{SFDIR}/documents.parquet')")},
             |${ivfAssignSql(8,
                 " WHERE vec_id IN (SELECT doc_id FROM screened)")
                 .stripPrefix("WITH ")},
             |ftoks AS (
             |  SELECT doc_id,
             |         (((doc_id % 100000) + 1) * 2654435761) % 1000000 AS gate,
             |         CAST((((doc_id % 100000) + 1) * 2654435761) % 1000000 % 2 AS INT) AS subshard,
             |         list_filter(string_split_regex(TRIM(${segSql("text")}), '\\s+'), x -> x <> '') AS toks,
             |         CAST(LEN(list_filter(string_split_regex(TRIM(${segSql("text")}), '\\s+'), x -> x <> '')) AS BIGINT) AS n_tokens
             |  FROM screened
             |), fpj AS (
             |  SELECT t.doc_id, a3.cid AS cell, t.subshard, t.gate, t.toks, t.n_tokens
             |  FROM ftoks t JOIN a3 ON a3.vec_id = t.doc_id
             |), fpc AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY cell, subshard
             |                                ORDER BY gate, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM fpj
             |), fpp AS (
             |  SELECT *, CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 256.0) AS BIGINT) AS pack
             |  FROM fpc
             |), fp2 AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY cell, subshard, pack
             |                                ORDER BY gate, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM fpp
             |)
             |SELECT cell, subshard, pack,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY gate, doc_id), ' ') AS docs,
             |       array_to_string(list_prepend('0', list(CAST(cum2 AS VARCHAR) ORDER BY gate, doc_id)), ' ') AS bounds,
             |       array_to_string(flatten(list(toks ORDER BY gate, doc_id)), ' ') AS tokens
             |FROM fp2 GROUP BY cell, subshard, pack
             |ORDER BY cell, subshard, pack""".stripMargin)),

    // RRF in its SERVING form: the embedding side's rank list comes
    // from cell-pruned IVF probes (the vecRanks injection point), not
    // the brute-force scan — p130's exact baseline becomes the
    // production path. The oracle replays the Lloyd trajectory, the
    // per-query probe selection, the in-cell cosine ranks, the BM25
    // ranks, and the 1/(60+rank) fusion.
    QueryDef("p135_rrf_ann",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p135_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val emb = Tables.load(s, dir, "embeddings")
        val index = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val qs = Seq((1L, "join vector filter", 7L),
          (2L, "stream window", 14L), (3L, "quality score text", 21L))
        val vecRanks = qs.map { case (qid, _, vid) =>
          val q = emb.where(col("vec_id") === vid)
            .select("embedding").head().getSeq[Float](0)
          Similarity.ivfTopK(emb, "vec_id", "embedding", index, q,
            k = 20, nprobe = 3)
            .select(lit(qid).as("qid"), col("vec_id").as("doc"),
              col("cosine"))
        }.reduce(_.unionByName(_))
          .withColumn("rank_cos", row_number().over(
            org.apache.spark.sql.expressions.Window.partitionBy("qid")
              .orderBy(col("cosine").desc, col("doc").asc)))
          .select("qid", "doc", "rank_cos")
        val workload = s.createDataFrame(qs).toDF("qid", "query", "vid")
        TextSearch.searchRrfBatch(workload, "qid", "query", "query", idx,
          emb, "vec_id", "embedding", k = 5, candidates = 20,
          vecRanks = Some(vecRanks))
          .orderBy("qid", "rank")
      },
      Some(ivfAssignSql(8) +
        """, qv2 AS (
           |  SELECT vq.qid, list_transform(e.embedding, x -> CAST(x AS DOUBLE)) AS qe
           |  FROM (VALUES (1, 7), (2, 14), (3, 21)) vq(qid, vid)
           |  JOIN read_parquet('{SFDIR}/embeddings.parquet') e ON e.vec_id = vq.vid
           |), probes AS (
           |  SELECT qid, cid FROM (
           |    SELECT qv2.qid, c2.cid,
           |           ROW_NUMBER() OVER (PARTITION BY qv2.qid
           |                              ORDER BY list_dot_product(c2.c, qv2.qe) DESC, c2.cid ASC) AS rn
           |    FROM c2, qv2
           |  ) WHERE rn <= 3
           |), vr AS (
           |  SELECT qid, doc, rank_cos FROM (
           |    SELECT p.qid, a3.vec_id AS doc,
           |           ROW_NUMBER() OVER (PARTITION BY p.qid
           |                              ORDER BY ROUND(list_cosine_similarity(a3.e, qv2.qe), 6) DESC, a3.vec_id ASC) AS rank_cos
           |    FROM a3 JOIN probes p ON a3.cid = p.cid JOIN qv2 ON qv2.qid = p.qid
           |  ) WHERE rank_cos <= 20
           |), terms AS (
           |  SELECT doc_id AS doc,
           |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
           |                            x -> x <> '')) AS term
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), dl AS (
           |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
           |), bstats AS (
           |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
           |), qt AS (
           |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
           |                        (2, 'stream'), (2, 'window'),
           |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
           |), bq AS (
           |  SELECT doc, term FROM terms
           |  WHERE term IN (SELECT DISTINCT term FROM qt)
           |), btf AS (
           |  SELECT doc, term, COUNT(*) AS tf FROM bq GROUP BY doc, term
           |), bdf AS (
           |  SELECT term, COUNT(DISTINCT doc) AS df FROM bq GROUP BY term
           |), bcontrib AS (
           |  SELECT qt.qid, btf.doc,
           |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |           * CAST(tf AS DOUBLE)
           |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
           |  FROM qt JOIN btf ON qt.term = btf.term
           |       JOIN bdf ON btf.term = bdf.term
           |       JOIN dl ON btf.doc = dl.doc, bstats
           |), bsc AS (
           |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM bcontrib GROUP BY qid, doc
           |), bm AS (
           |  SELECT qid, doc,
           |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank_bm25
           |  FROM bsc QUALIFY rank_bm25 <= 20
           |), fused AS (
           |  SELECT COALESCE(bm.qid, vr.qid) AS qid,
           |         COALESCE(bm.doc, vr.doc) AS doc,
           |         ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + bm.rank_bm25), 0)
           |             + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.rank_cos), 0), 6) AS rrf,
           |         CAST(bm.rank_bm25 AS INT) AS rank_bm25,
           |         CAST(vr.rank_cos AS INT) AS rank_cos
           |  FROM bm FULL OUTER JOIN vr ON bm.qid = vr.qid AND bm.doc = vr.doc
           |)
           |SELECT CAST(qid AS BIGINT) AS qid,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc ASC) AS INT) AS rank,
           |       doc, rrf, rank_bm25, rank_cos
           |FROM fused
           |QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // The workload-batched ANN layout probe — the embedding sibling of
    // the batched BM25 serve (p114): the whole query workload answered
    // by ONE partition-pruned pass over the union of the probed cells
    // (the p135 serving entry built its vecRanks by looping queries on
    // the driver — this is the shape a 10⁴-query decontamination audit
    // actually runs). The oracle replays the coarse + both subspace
    // Lloyd trajectories, each query's probe selection, the per-query
    // ADC candidate cut, and the exact rescore, batch-wise.
    QueryDef("p136_ann_probe_batch",
      (s, dir) => {
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 2, k = 4)
        val path = s"target/graft-tmp/ann_batch_p136_${math.abs(dir.hashCode)}"
        Similarity.writeIvfPq(emb, "embedding", path, coarse, books)
        val workload = emb.where(col("vec_id").isin(7L, 14L, 21L))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.probeIvfPqBatch(workload, "qid", "qv", path,
          "vec_id", "embedding", coarse, books, k = 10)
          .orderBy("qid", "rank")
      },
      Some(ivfAssignSql(8) +
        pqAssignSql(0, 1, 32, 4) + pqAssignSql(1, 33, 64, 4) +
        """, q136 AS (
           |  SELECT vec_id AS qid, e AS qe, e[1:32] AS q0, e[33:64] AS q1
           |  FROM v WHERE vec_id IN (7, 14, 21)
           |), probes136 AS (
           |  SELECT qid, cid FROM (
           |    SELECT q.qid, c2.cid,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY list_dot_product(c2.c, q.qe) DESC, c2.cid ASC) AS rn
           |    FROM c2, q136 q
           |  ) WHERE rn <= 3
           |), d0 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q0) AS d
           |  FROM a3_0 a JOIN c2_0 c USING (cid), q136 q
           |), d1 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q1) AS d
           |  FROM a3_1 a JOIN c2_1 c USING (cid), q136 q
           |), incell136 AS (
           |  SELECT p.qid, a3.vec_id FROM a3 JOIN probes136 p ON a3.cid = p.cid
           |), adc136 AS (
           |  SELECT i.qid, i.vec_id, ROUND(d0.d + d1.d, 6) AS adc
           |  FROM incell136 i
           |  JOIN d0 ON d0.qid = i.qid AND d0.vec_id = i.vec_id
           |  JOIN d1 ON d1.qid = i.qid AND d1.vec_id = i.vec_id
           |), cand136 AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS rn
           |    FROM adc136
           |  ) WHERE rn <= 50
           |)
           |SELECT q.qid,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q.qid
           |              ORDER BY ROUND(list_cosine_similarity(v.e, q.qe), 6) DESC, v.vec_id ASC) AS INT) AS rank,
           |       v.vec_id, ROUND(list_cosine_similarity(v.e, q.qe), 6) AS cosine
           |FROM cand136 cd JOIN v ON v.vec_id = cd.vec_id JOIN q136 q ON q.qid = cd.qid
           |QUALIFY rank <= 10 ORDER BY q.qid, rank""".stripMargin)),

    // The freeze with the trained tokenizer wired in: packs carry the
    // BPE piece stream (</w>-marked, exactly invertible — p111's
    // property), budgets counted in PIECES, and every piece mapped to
    // a model vocab id against the published outDir/vocab table. The
    // oracle chains three already-proven trajectories — the curate
    // stages, the full 40-merge BPE replay (p48), the survivors-only
    // Lloyd cells (p134) — then replays the per-word piece fold, the
    // gate/cumsum packing over PIECE counts, and the byte-ordered
    // vocab-id assignment end to end.
    QueryDef("p137_training_freeze_bpe",
      (s, dir) => {
        val out = s"target/graft-tmp/freeze_p137_${math.abs(dir.hashCode)}"
        val model = Bpe.train(Tables.load(s, dir, "documents"), "text",
          numMerges = bpeMerges, maxWords = bpeMaxWords)
        TrainingPipeline.freezePacks(s,
          Tables.load(s, dir, "documents").select("doc_id", "text"),
          "doc_id", "text",
          Tables.load(s, dir, "embeddings"), "vec_id", "embedding",
          out, tokenizer = Some(model))
          .select(col("cell"), col("subshard"), col("pack"),
            col("n_docs"), col("n_tokens"),
            array_join(transform(col("docs"), d => d.cast("string")), " ")
              .as("docs"),
            array_join(transform(col("doc_boundaries"), b => b.cast("string")), " ")
              .as("bounds"),
            array_join(col("token_ids"), " ").as("tokens"),
            array_join(transform(col("vocab_ids"), v => v.cast("string")), " ")
              .as("vids"))
          .orderBy("cell", "subshard", "pack")
      },
      Some(s"""WITH RECURSIVE ${curateStagesSqlFrom(
                 "read_parquet('{SFDIR}/documents.parquet')")},
             |${ivfAssignSql(8,
                 " WHERE vec_id IN (SELECT doc_id FROM screened)")
                 .stripPrefix("WITH ")},
             |${bpeCtes(bpeMerges, bpeMaxWords).stripPrefix("WITH ")},
             |enc AS MATERIALIZED (
             |  SELECT tok.doc_id, tok.pos, st.s || '</w>' AS ps,
             |         CAST(LEN(string_split(st.s, ' ')) AS BIGINT) AS np
             |  FROM tok JOIN st$bpeMerges st ON tok.tok = st.word
             |  WHERE tok.doc_id IN (SELECT doc_id FROM screened)
             |), bdoc AS MATERIALIZED (
             |  SELECT doc_id,
             |         (((doc_id % 100000) + 1) * 2654435761) % 1000000 AS gate,
             |         CAST((((doc_id % 100000) + 1) * 2654435761) % 1000000 % 2 AS INT) AS subshard,
             |         string_split(string_agg(ps, ' ' ORDER BY pos), ' ') AS toks,
             |         SUM(np) AS n_tokens
             |  FROM enc GROUP BY doc_id
             |), vocab AS (
             |  SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY piece) AS BIGINT) AS vid
             |  FROM (SELECT DISTINCT unnest(toks) AS piece FROM bdoc)
             |), vm AS (
             |  SELECT map_from_entries(list({'key': piece, 'value': vid})) AS m FROM vocab
             |), bpj AS (
             |  SELECT t.doc_id, a3.cid AS cell, t.subshard, t.gate, t.toks, t.n_tokens,
             |         list_transform(t.toks, p -> CAST(map_extract(vm.m, p)[1] AS VARCHAR)) AS ids
             |  FROM bdoc t JOIN a3 ON a3.vec_id = t.doc_id, vm
             |), bpc AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY cell, subshard
             |                                ORDER BY gate, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
             |  FROM bpj
             |), bpp AS (
             |  SELECT *, CAST(FLOOR(CAST(cum - n_tokens AS DOUBLE) / 256.0) AS BIGINT) AS pack
             |  FROM bpc
             |), bp2 AS (
             |  SELECT *, SUM(n_tokens) OVER (PARTITION BY cell, subshard, pack
             |                                ORDER BY gate, doc_id
             |                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum2
             |  FROM bpp
             |)
             |SELECT cell, subshard, pack,
             |       CAST(COUNT(*) AS BIGINT) AS n_docs,
             |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
             |       array_to_string(list(CAST(doc_id AS VARCHAR) ORDER BY gate, doc_id), ' ') AS docs,
             |       array_to_string(list_prepend('0', list(CAST(cum2 AS VARCHAR) ORDER BY gate, doc_id)), ' ') AS bounds,
             |       array_to_string(flatten(list(toks ORDER BY gate, doc_id)), ' ') AS tokens,
             |       array_to_string(flatten(list(ids ORDER BY gate, doc_id)), ' ') AS vids
             |FROM bp2 GROUP BY cell, subshard, pack
             |ORDER BY cell, subshard, pack""".stripMargin)),

    // RRF in its fully-SERVED form — the production default end to
    // end: the embedding side's rank list comes from ONE
    // probeIvfPqBatch pass over the written IVF-PQ layout (per-query
    // probe selection + ADC candidate cut + exact rescore, all
    // batch-wise — p136's plan), fused with the batched BM25 ranks by
    // 1/(60+rank). p135 proved the fusion with driver-looped exact
    // in-cell ranks; this replaces that loop with the batched layout
    // probe, so the whole hybrid answer is three jobs' worth of
    // corpus work regardless of workload size.
    QueryDef("p138_rrf_ann_served",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p138_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPq(emb, "vec_id", "embedding", m = 2, k = 4)
        val ann = s"target/graft-tmp/ann_p138_${math.abs(dir.hashCode)}"
        Similarity.writeIvfPq(emb, "embedding", ann, coarse, books)
        val qs = Seq((1L, "join vector filter", 7L),
          (2L, "stream window", 14L), (3L, "quality score text", 21L))
        val workload = s.createDataFrame(qs).toDF("qid", "query", "vid")
          .join(emb.select(col("vec_id").as("vid"), col("embedding").as("qv")),
            "vid")
        TextSearch.searchRrfServed(workload, "qid", "query", "qv", idx,
          ann, "vec_id", "embedding", coarse, books, k = 5, candidates = 20)
          .orderBy("qid", "rank")
      },
      Some(ivfAssignSql(8) +
        pqAssignSql(0, 1, 32, 4) + pqAssignSql(1, 33, 64, 4) +
        """, q138 AS (
           |  SELECT vq.qid, e2.e AS qe, e2.e[1:32] AS q0, e2.e[33:64] AS q1
           |  FROM (VALUES (1, 7), (2, 14), (3, 21)) vq(qid, vid)
           |  JOIN v e2 ON e2.vec_id = vq.vid
           |), probes138 AS (
           |  SELECT qid, cid FROM (
           |    SELECT q.qid, c2.cid,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY list_dot_product(c2.c, q.qe) DESC, c2.cid ASC) AS rn
           |    FROM c2, q138 q
           |  ) WHERE rn <= 3
           |), d0 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q0) AS d
           |  FROM a3_0 a JOIN c2_0 c USING (cid), q138 q
           |), d1 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q1) AS d
           |  FROM a3_1 a JOIN c2_1 c USING (cid), q138 q
           |), incell138 AS (
           |  SELECT p.qid, a3.vec_id FROM a3 JOIN probes138 p ON a3.cid = p.cid
           |), adc138 AS (
           |  SELECT i.qid, i.vec_id, ROUND(d0.d + d1.d, 6) AS adc
           |  FROM incell138 i
           |  JOIN d0 ON d0.qid = i.qid AND d0.vec_id = i.vec_id
           |  JOIN d1 ON d1.qid = i.qid AND d1.vec_id = i.vec_id
           |), cand138 AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS rn
           |    FROM adc138
           |  ) WHERE rn <= 100
           |), vr AS (
           |  SELECT qid, doc, rank_cos FROM (
           |    SELECT q.qid, v.vec_id AS doc,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY ROUND(list_cosine_similarity(v.e, q.qe), 6) DESC, v.vec_id ASC) AS rank_cos
           |    FROM cand138 cd JOIN v ON v.vec_id = cd.vec_id
           |         JOIN q138 q ON q.qid = cd.qid
           |  ) WHERE rank_cos <= 20
           |), terms AS (
           |  SELECT doc_id AS doc,
           |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
           |                            x -> x <> '')) AS term
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), dl AS (
           |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
           |), bstats AS (
           |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
           |), qt AS (
           |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
           |                        (2, 'stream'), (2, 'window'),
           |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
           |), bq AS (
           |  SELECT doc, term FROM terms
           |  WHERE term IN (SELECT DISTINCT term FROM qt)
           |), btf AS (
           |  SELECT doc, term, COUNT(*) AS tf FROM bq GROUP BY doc, term
           |), bdf AS (
           |  SELECT term, COUNT(DISTINCT doc) AS df FROM bq GROUP BY term
           |), bcontrib AS (
           |  SELECT qt.qid, btf.doc,
           |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |           * CAST(tf AS DOUBLE)
           |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
           |  FROM qt JOIN btf ON qt.term = btf.term
           |       JOIN bdf ON btf.term = bdf.term
           |       JOIN dl ON btf.doc = dl.doc, bstats
           |), bsc AS (
           |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM bcontrib GROUP BY qid, doc
           |), bm AS (
           |  SELECT qid, doc,
           |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank_bm25
           |  FROM bsc QUALIFY rank_bm25 <= 20
           |), fused AS (
           |  SELECT COALESCE(bm.qid, vr.qid) AS qid,
           |         COALESCE(bm.doc, vr.doc) AS doc,
           |         ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + bm.rank_bm25), 0)
           |             + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.rank_cos), 0), 6) AS rrf,
           |         CAST(bm.rank_bm25 AS INT) AS rank_bm25,
           |         CAST(vr.rank_cos AS INT) AS rank_cos
           |  FROM bm FULL OUTER JOIN vr ON bm.qid = vr.qid AND bm.doc = vr.doc
           |)
           |SELECT CAST(qid AS BIGINT) AS qid,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc ASC) AS INT) AS rank,
           |       doc, rrf, rank_bm25, rank_cos
           |FROM fused
           |QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // The residual sibling of p136: the batched probe over a
    // writeIvfPqResidual layout, with the IP-ADC decomposition's
    // per-(query, cell) constant computed map-only on the probe pairs.
    // The oracle composes the coarse replay, the residual frame, BOTH
    // residual-subspace Lloyd trajectories, per-query probes, the
    // constant + table ADC, and the exact rescore, batch-wise.
    QueryDef("p139_ann_residual_batch",
      (s, dir) => {
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPqResidual(
          emb, "vec_id", "embedding", coarse, m = 2, k = 4)
        val path = s"target/graft-tmp/ann_res_batch_p139_${math.abs(dir.hashCode)}"
        Similarity.writeIvfPqResidual(emb, "embedding", path, coarse, books)
        val workload = emb.where(col("vec_id").isin(7L, 14L, 21L))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.probeIvfPqResidualBatch(workload, "qid", "qv", path,
          "vec_id", "embedding", coarse, books, k = 10)
          .orderBy("qid", "rank")
      },
      Some(ivfAssignSql(8) +
        """, res AS (
           |  SELECT a3.vec_id,
           |         list_transform(range(1, len(a3.e) + 1), i -> a3.e[i] - c2.c[i]) AS r
           |  FROM a3 JOIN c2 USING (cid)
           |)""".stripMargin +
        pqAssignSql(0, 1, 32, 4, src = "res", srcCol = "r") +
        pqAssignSql(1, 33, 64, 4, src = "res", srcCol = "r") +
        """, q139 AS (
           |  SELECT vec_id AS qid, e AS qe, e[1:32] AS q0, e[33:64] AS q1
           |  FROM v WHERE vec_id IN (7, 14, 21)
           |), probes139 AS (
           |  SELECT qid, cid FROM (
           |    SELECT q.qid, c2.cid,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY list_dot_product(c2.c, q.qe) DESC, c2.cid ASC) AS rn
           |    FROM c2, q139 q
           |  ) WHERE rn <= 3
           |), incell139 AS (
           |  SELECT p.qid, a3.vec_id, a3.cid FROM a3 JOIN probes139 p ON a3.cid = p.cid
           |), cc139 AS (
           |  SELECT ic.qid, ic.vec_id, list_dot_product(c2.c, q.qe) AS cd
           |  FROM incell139 ic JOIN c2 ON c2.cid = ic.cid
           |       JOIN q139 q ON q.qid = ic.qid
           |), d0 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q0) AS d
           |  FROM a3_0 a JOIN c2_0 c USING (cid), q139 q
           |), d1 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q1) AS d
           |  FROM a3_1 a JOIN c2_1 c USING (cid), q139 q
           |), adc139 AS (
           |  SELECT i.qid, i.vec_id, ROUND(cc.cd + d0.d + d1.d, 6) AS adc
           |  FROM incell139 i
           |  JOIN cc139 cc ON cc.qid = i.qid AND cc.vec_id = i.vec_id
           |  JOIN d0 ON d0.qid = i.qid AND d0.vec_id = i.vec_id
           |  JOIN d1 ON d1.qid = i.qid AND d1.vec_id = i.vec_id
           |), cand139 AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS rn
           |    FROM adc139
           |  ) WHERE rn <= 50
           |)
           |SELECT q.qid,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY q.qid
           |              ORDER BY ROUND(list_cosine_similarity(v.e, q.qe), 6) DESC, v.vec_id ASC) AS INT) AS rank,
           |       v.vec_id, ROUND(list_cosine_similarity(v.e, q.qe), 6) AS cosine
           |FROM cand139 cd JOIN v ON v.vec_id = cd.vec_id JOIN q139 q ON q.qid = cd.qid
           |QUALIFY rank <= 10 ORDER BY q.qid, rank""".stripMargin)),

    // The LSH member of the batched-serve family: a whole workload
    // probed against a writeIndexed layout in one pruned pass —
    // per-query signatures and Hamming-1 probe sets computed map-only
    // (hyperplanes are literals), broadcast bucket join, qid rank
    // windows. Oracle replays the sign-plane buckets with the SAME
    // inlined hyperplanes and the bit_count(xor) <= 1 multi-probe rule.
    QueryDef("p140_ann_lsh_batch",
      (s, dir) => {
        val emb = Tables.load(s, dir, "embeddings")
        val path = s"target/graft-tmp/lsh_batch_p140_${math.abs(dir.hashCode)}"
        Similarity.writeIndexed(emb, "embedding", path, planes = 6)
        val workload = emb.where(col("vec_id").isin(7L, 14L, 21L))
          .select(col("vec_id").as("qid"), col("embedding").as("qv"))
        Similarity.probeIndexedBatch(workload, "qid", "qv", path,
          "vec_id", "embedding", k = 10, planes = 6)
          .orderBy("qid", "rank")
      },
      Some(s"""WITH b AS (
             |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
             |         ${bucketSql("CAST(embedding AS DOUBLE[])", 6)} AS bucket
             |  FROM read_parquet('{SFDIR}/embeddings.parquet')
             |), q140 AS (
             |  SELECT vec_id AS qid, bucket AS qb, e AS qe FROM b
             |  WHERE vec_id IN (7, 14, 21)
             |)
             |SELECT q.qid,
             |       CAST(ROW_NUMBER() OVER (PARTITION BY q.qid
             |              ORDER BY ROUND(list_cosine_similarity(b.e, q.qe), 6) DESC, b.vec_id ASC) AS INT) AS rank,
             |       b.vec_id, ROUND(list_cosine_similarity(b.e, q.qe), 6) AS cosine
             |FROM b JOIN q140 q ON bit_count(xor(b.bucket, q.qb)) <= 1
             |QUALIFY rank <= 10 ORDER BY q.qid, rank""".stripMargin)),

    // Retrieval-quality evaluation — the metric layer over any ranked
    // run: precision/recall@k, MRR, graded nDCG@k against judgments,
    // here a BM25 batch run scored against rule-priced qrels (the
    // query's head term, graded by capped tf). DCG terms are 6-rounded
    // and decimal-accumulated and log2 is spelled ln(x)/ln(2) on both
    // sides, so the replay is exact (the dsum discipline).
    QueryDef("p141_retrieval_eval",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p141_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val workload = s.createDataFrame(Seq(
          (1L, "join vector filter"), (2L, "stream window"),
          (3L, "quality score text"))).toDF("qid", "query")
        val run = TextSearch.searchTopKBatch(workload, "qid", "query", idx,
          k = 20)
        val jt = s.createDataFrame(Seq(
          (1L, "vector"), (2L, "stream"), (3L, "quality")))
          .toDF("qid", "jterm")
        val qrels = Tables.load(s, dir, "documents")
          .select(col("doc_id"),
            explode(Dedup.tokensOf(col("text"))).as("term"))
          .join(broadcast(jt), col("term") === col("jterm"))
          .groupBy("qid", "doc_id")
          .agg(least(count(lit(1)), lit(3L)).cast("double").as("rel"))
        TextSearch.evalRetrieval(run, "qid", "doc", "rank",
          qrels, "qid", "doc_id", "rel", k = 10)
          .orderBy("qid")
      },
      Some("""WITH terms AS (
           |  SELECT doc_id AS doc,
           |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
           |                            x -> x <> '')) AS term
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), dl AS (
           |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
           |), bstats AS (
           |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
           |), qt AS (
           |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
           |                        (2, 'stream'), (2, 'window'),
           |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
           |), bq AS (
           |  SELECT doc, term FROM terms
           |  WHERE term IN (SELECT DISTINCT term FROM qt)
           |), btf AS (
           |  SELECT doc, term, COUNT(*) AS tf FROM bq GROUP BY doc, term
           |), bdf AS (
           |  SELECT term, COUNT(DISTINCT doc) AS df FROM bq GROUP BY term
           |), bcontrib AS (
           |  SELECT qt.qid, btf.doc,
           |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |           * CAST(tf AS DOUBLE)
           |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
           |  FROM qt JOIN btf ON qt.term = btf.term
           |       JOIN bdf ON btf.term = bdf.term
           |       JOIN dl ON btf.doc = dl.doc, bstats
           |), bsc AS (
           |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM bcontrib GROUP BY qid, doc
           |), rk AS (
           |  SELECT qid, doc, rank FROM (
           |    SELECT qid, doc,
           |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank
           |    FROM bsc
           |  ) WHERE rank <= 10
           |), jt AS (
           |  SELECT * FROM (VALUES (1, 'vector'), (2, 'stream'), (3, 'quality')) v(qid, jterm)
           |), qr AS (
           |  SELECT jt.qid, t.doc, CAST(LEAST(COUNT(*), 3) AS DOUBLE) AS rel
           |  FROM terms t JOIN jt ON t.term = jt.jterm GROUP BY jt.qid, t.doc
           |), prq AS (
           |  SELECT qid, CAST(COUNT(*) AS BIGINT) AS n_rel FROM qr GROUP BY qid
           |), idcg AS (
           |  SELECT qid,
           |         CAST(SUM(CAST(ROUND((POW(2.0, rel) - 1) / (LN(CAST(irank AS DOUBLE) + 1.0) / LN(2.0)), 6) AS DECIMAL(28,6))) AS DOUBLE) AS idcg
           |  FROM (SELECT qid, rel, doc,
           |               ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rel DESC, doc ASC) AS irank
           |        FROM qr)
           |  WHERE irank <= 10 GROUP BY qid
           |), sc AS (
           |  SELECT r.qid, r.rank, COALESCE(qr.rel, 0.0) AS rel
           |  FROM rk r LEFT JOIN qr ON qr.qid = r.qid AND qr.doc = r.doc
           |), ag AS (
           |  SELECT qid,
           |         CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           |         CAST(SUM(CAST(ROUND((POW(2.0, rel) - 1) / (LN(CAST(rank AS DOUBLE) + 1.0) / LN(2.0)), 6) AS DECIMAL(28,6))) AS DOUBLE) AS dcg,
           |         MAX(CASE WHEN rel > 0 THEN 1.0 / rank ELSE 0.0 END) AS rr
           |  FROM sc GROUP BY qid
           |), jmeta AS (
           |  SELECT prq.qid, prq.n_rel, idcg.idcg FROM prq JOIN idcg USING (qid)
           |)
           |SELECT CAST(COALESCE(ag.qid, jm.qid) AS BIGINT) AS qid,
           |       CAST(COALESCE(jm.n_rel, 0) AS BIGINT) AS n_rel,
           |       CAST(COALESCE(ag.n_hit, 0) AS BIGINT) AS n_hit,
           |       ROUND(COALESCE(ag.n_hit, 0) / 10.0, 6) AS precision,
           |       CASE WHEN COALESCE(jm.n_rel, 0) > 0
           |            THEN ROUND(COALESCE(ag.n_hit, 0) / CAST(jm.n_rel AS DOUBLE), 6) END AS recall,
           |       ROUND(COALESCE(ag.rr, 0.0), 6) AS mrr,
           |       CASE WHEN jm.idcg IS NOT NULL AND jm.idcg > 0
           |            THEN ROUND(COALESCE(ag.dcg, 0.0) / jm.idcg, 6) END AS ndcg
           |FROM ag FULL OUTER JOIN jmeta jm ON ag.qid = jm.qid
           |ORDER BY qid""".stripMargin)),

    // Cost-based cascade ordering (the rank-ordering law): measure each
    // screen's drop rate on the deterministic idGate sample, order by
    // drop-per-unit-cost. The oracle replays the sample gate, all four
    // pass counts (the curate g-stage predicate expressions, parity
    // already proven by p49's stages), and the ratio sort.
    QueryDef("p142_screen_order",
      (s, dir) => {
        val feats = TextAnalysis.qualityFeatures(col("text")).toMap
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val screens = Seq(
          ("minwords", feats("n_words") >= 20, 1.0),
          ("punct", feats("punct_ratio") <= 0.2, 2.0),
          ("digit", feats("digit_ratio") <= 0.3, 2.0),
          ("uniq", feats("uniq_word_ratio") >= 0.5, 3.0))
        val ordered = TrainingPipeline.orderScreens(
          docs, "doc_id", screens, sampleTarget = 2000L)
        // the MEASURED-cost sibling over the same sample: its clock
        // column is driver evidence (not oracle material), but its
        // selectivities must agree exactly with the caller-cost pass —
        // the oracle pins that cross-check via measured_kept = kept
        val measured = TrainingPipeline.orderScreensMeasured(
          docs, "doc_id", screens.map { case (n, p, _) => (n, p) },
          sampleTarget = 2000L)
          .select(col("screen"), col("kept").as("measured_kept"))
        ordered.join(measured, Seq("screen"))
          .select("rank", "screen", "sample_n", "kept", "measured_kept",
            "drop_rate", "cost", "drop_per_cost")
          .orderBy("rank")
      },
      Some("""WITH f AS (
           |  SELECT doc_id, text, LENGTH(text) AS n_chars,
           |         string_split_regex(TRIM(text), '\s+') AS words
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), smp AS (
           |  SELECT * FROM f
           |  WHERE (doc_id % 100000 * 2654435761) % 1000000 <
           |        (SELECT CAST(ROUND(LEAST(1.0, 2000.0 / COUNT(*)) * 1000000) AS BIGINT)
           |         FROM read_parquet('{SFDIR}/documents.parquet'))
           |), m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN LEN(words) >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS k_minwords,
           |         CAST(SUM(CASE WHEN CAST(LEN(regexp_extract_all(text, '[\.,;:!\?''"()\[\]{}-]')) AS DOUBLE)
           |                            / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS k_punct,
           |         CAST(SUM(CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           |                            / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS k_digit,
           |         CAST(SUM(CASE WHEN CAST(LEN(list_distinct(words)) AS DOUBLE)
           |                            / CAST(GREATEST(LEN(words), 1) AS DOUBLE) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS k_uniq
           |  FROM smp
           |), sdef AS (
           |  SELECT * FROM (VALUES
           |    ('minwords', 1.0), ('punct', 2.0), ('digit', 2.0), ('uniq', 3.0)) v(screen, cost)
           |), j AS (
           |  SELECT sdef.screen, m.n AS sample_n,
           |         CASE sdef.screen WHEN 'minwords' THEN k_minwords
           |              WHEN 'punct' THEN k_punct
           |              WHEN 'digit' THEN k_digit ELSE k_uniq END AS kept,
           |         sdef.cost
           |  FROM sdef, m
           |)
           |SELECT CAST(ROW_NUMBER() OVER (
           |         ORDER BY ROUND((1.0 - kept / CAST(sample_n AS DOUBLE)) / cost, 6) DESC,
           |                  screen ASC) AS INT) AS rank,
           |       screen, sample_n, kept, kept AS measured_kept,
           |       ROUND(1.0 - kept / CAST(sample_n AS DOUBLE), 6) AS drop_rate,
           |       cost,
           |       ROUND((1.0 - kept / CAST(sample_n AS DOUBLE)) / cost, 6) AS drop_per_cost
           |FROM j ORDER BY rank""".stripMargin)),

    // Script-aware segmentation on a non-space-delimited fixture (r18
    // VERDICT item 3): CJK/Thai/Lao codepoints tokenize one-per-
    // codepoint, Latin text exactly as the canonical tokenizer, mixed
    // text both ways in one string — replayed byte-for-byte in DuckDB
    // with the RE2 script classes, so the oracle pins the segmentation
    // itself (token stream, counts, distinct counts), not just counts.
    QueryDef("p143_cjk_segmentation",
      (s, dir) => {
        val docs = s.createDataFrame(cjkFixture).toDF("doc_id", "text")
        docs.select(col("doc_id"),
          Dedup.segTokensOf(col("text")).as("toks"))
          .select(col("doc_id"),
            size(col("toks")).cast("long").as("n_tokens"),
            size(array_distinct(col("toks"))).cast("long").as("n_uniq"),
            array_join(col("toks"), " ").as("tokens"))
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (
           |  SELECT * FROM (VALUES $cjkFixtureSqlValues) v(doc_id, text)
           |),
           |t AS (SELECT doc_id, ${segToksSql("text")} AS toks FROM docs)
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |       CAST(len(toks) AS BIGINT) AS n_tokens,
           |       CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
           |       array_to_string(toks, ' ') AS tokens
           |FROM t ORDER BY doc_id""".stripMargin)),

    // p138's residual sibling through the META-DISPATCHED serving entry
    // (r18 VERDICT item 5): searchRrfServedAuto takes the layout PATH,
    // reads its _meta (`residual` marker), and routes the embedding
    // side to probeIvfPqResidualBatch — same fusion, different layout
    // family, zero caller knowledge of which. The oracle replays the
    // coarse trajectory, the residual frame, both residual-subspace
    // codebooks, constant+table ADC, exact rescore, BM25, and the
    // 1/(60+rank) fusion.
    QueryDef("p144_rrf_residual_served",
      (s, dir) => {
        val idx = s"target/graft-tmp/textsearch_p144_${math.abs(dir.hashCode)}"
        TextSearch.writeIndex(Tables.load(s, dir, "documents"),
          "doc_id", "text", idx)
        OperatorCache.releaseAll(s)
        val emb = OperatorCache.persist(Tables.load(s, dir, "embeddings"))
        val coarse = Similarity.ivfTrain(emb, "vec_id", "embedding", k = 8)
        val books = Similarity.trainPqResidual(
          emb, "vec_id", "embedding", coarse, m = 2, k = 4)
        val ann = s"target/graft-tmp/ann_p144_${math.abs(dir.hashCode)}"
        Similarity.writeIvfPqResidual(emb, "embedding", ann, coarse, books)
        val qs = Seq((1L, "join vector filter", 7L),
          (2L, "stream window", 14L), (3L, "quality score text", 21L))
        val workload = s.createDataFrame(qs).toDF("qid", "query", "vid")
          .join(emb.select(col("vec_id").as("vid"), col("embedding").as("qv")),
            "vid")
        TextSearch.searchRrfServedAuto(workload, "qid", "query", "qv", idx,
          ann, "vec_id", "embedding", Some(coarse), books,
          k = 5, candidates = 20)
          .orderBy("qid", "rank")
      },
      Some(ivfAssignSql(8) +
        """, res AS (
           |  SELECT a3.vec_id,
           |         list_transform(range(1, len(a3.e) + 1), i -> a3.e[i] - c2.c[i]) AS r
           |  FROM a3 JOIN c2 USING (cid)
           |)""".stripMargin +
        pqAssignSql(0, 1, 32, 4, src = "res", srcCol = "r") +
        pqAssignSql(1, 33, 64, 4, src = "res", srcCol = "r") +
        """, q144 AS (
           |  SELECT vq.qid, e2.e AS qe, e2.e[1:32] AS q0, e2.e[33:64] AS q1
           |  FROM (VALUES (1, 7), (2, 14), (3, 21)) vq(qid, vid)
           |  JOIN v e2 ON e2.vec_id = vq.vid
           |), probes144 AS (
           |  SELECT qid, cid FROM (
           |    SELECT q.qid, c2.cid,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY list_dot_product(c2.c, q.qe) DESC, c2.cid ASC) AS rn
           |    FROM c2, q144 q
           |  ) WHERE rn <= 3
           |), incell144 AS (
           |  SELECT p.qid, a3.vec_id, a3.cid FROM a3 JOIN probes144 p ON a3.cid = p.cid
           |), cc144 AS (
           |  SELECT ic.qid, ic.vec_id, list_dot_product(c2.c, q.qe) AS cd
           |  FROM incell144 ic JOIN c2 ON c2.cid = ic.cid
           |       JOIN q144 q ON q.qid = ic.qid
           |), d0 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q0) AS d
           |  FROM a3_0 a JOIN c2_0 c USING (cid), q144 q
           |), d1 AS (
           |  SELECT q.qid, a.vec_id, list_dot_product(c.c, q.q1) AS d
           |  FROM a3_1 a JOIN c2_1 c USING (cid), q144 q
           |), adc144 AS (
           |  SELECT i.qid, i.vec_id, ROUND(cc.cd + d0.d + d1.d, 6) AS adc
           |  FROM incell144 i
           |  JOIN cc144 cc ON cc.qid = i.qid AND cc.vec_id = i.vec_id
           |  JOIN d0 ON d0.qid = i.qid AND d0.vec_id = i.vec_id
           |  JOIN d1 ON d1.qid = i.qid AND d1.vec_id = i.vec_id
           |), cand144 AS (
           |  SELECT qid, vec_id FROM (
           |    SELECT qid, vec_id,
           |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc DESC, vec_id ASC) AS rn
           |    FROM adc144
           |  ) WHERE rn <= 100
           |), vr AS (
           |  SELECT qid, doc, rank_cos FROM (
           |    SELECT q.qid, v.vec_id AS doc,
           |           ROW_NUMBER() OVER (PARTITION BY q.qid
           |                              ORDER BY ROUND(list_cosine_similarity(v.e, q.qe), 6) DESC, v.vec_id ASC) AS rank_cos
           |    FROM cand144 cd JOIN v ON v.vec_id = cd.vec_id
           |         JOIN q144 q ON q.qid = cd.qid
           |  ) WHERE rank_cos <= 20
           |), terms AS (
           |  SELECT doc_id AS doc,
           |         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
           |                            x -> x <> '')) AS term
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), dl AS (
           |  SELECT doc, COUNT(*) AS dl FROM terms GROUP BY doc
           |), bstats AS (
           |  SELECT COUNT(*) AS n_docs, AVG(CAST(dl AS DOUBLE)) AS avgdl FROM dl
           |), qt AS (
           |  SELECT * FROM (VALUES (1, 'join'), (1, 'vector'), (1, 'filter'),
           |                        (2, 'stream'), (2, 'window'),
           |                        (3, 'quality'), (3, 'score'), (3, 'text')) v(qid, term)
           |), bq AS (
           |  SELECT doc, term FROM terms
           |  WHERE term IN (SELECT DISTINCT term FROM qt)
           |), btf AS (
           |  SELECT doc, term, COUNT(*) AS tf FROM bq GROUP BY doc, term
           |), bdf AS (
           |  SELECT term, COUNT(DISTINCT doc) AS df FROM bq GROUP BY term
           |), bcontrib AS (
           |  SELECT qt.qid, btf.doc,
           |         LN(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           |           * CAST(tf AS DOUBLE)
           |           / (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 * CAST(dl.dl AS DOUBLE) / avgdl)) AS c
           |  FROM qt JOIN btf ON qt.term = btf.term
           |       JOIN bdf ON btf.term = bdf.term
           |       JOIN dl ON btf.doc = dl.doc, bstats
           |), bsc AS (
           |  SELECT qid, doc, ROUND(SUM(c), 6) AS score FROM bcontrib GROUP BY qid, doc
           |), bm AS (
           |  SELECT qid, doc,
           |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, doc ASC) AS rank_bm25
           |  FROM bsc QUALIFY rank_bm25 <= 20
           |), fused AS (
           |  SELECT COALESCE(bm.qid, vr.qid) AS qid,
           |         COALESCE(bm.doc, vr.doc) AS doc,
           |         ROUND(COALESCE(CAST(1 AS DOUBLE) / (60 + bm.rank_bm25), 0)
           |             + COALESCE(CAST(1 AS DOUBLE) / (60 + vr.rank_cos), 0), 6) AS rrf,
           |         CAST(bm.rank_bm25 AS INT) AS rank_bm25,
           |         CAST(vr.rank_cos AS INT) AS rank_cos
           |  FROM bm FULL OUTER JOIN vr ON bm.qid = vr.qid AND bm.doc = vr.doc
           |)
           |SELECT CAST(qid AS BIGINT) AS qid,
           |       CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY rrf DESC, doc ASC) AS INT) AS rank,
           |       doc, rrf, rank_bm25, rank_cos
           |FROM fused
           |QUALIFY rank <= 5 ORDER BY qid, rank""".stripMargin)),

    // Script routing (the gate in front of the Latin-tuned quality /
    // Gopher screens): per-class codepoint counts and the deterministic
    // argmax label, replayed in DuckDB with the RE2 script classes over
    // the same mixed-script fixture — so the router's every count and
    // tie-break is oracle-pinned.
    QueryDef("p145_script_route",
      (s, dir) => {
        val docs = s.createDataFrame(cjkFixture).toDF("doc_id", "text")
        val counts = TextAnalysis.scriptCounts(col("text"))
        docs.select(
          col("doc_id") +:
            counts.map { case (n, c) => c.as(s"n_$n") } :+
            TextAnalysis.dominantScript(col("text")).as("script"): _*)
          .orderBy("doc_id")
      },
      Some(s"""WITH docs AS (
           |  SELECT * FROM (VALUES $cjkFixtureSqlValues) v(doc_id, text)
           |), c AS (
           |  SELECT doc_id,
           |         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
           |         CAST(len(regexp_extract_all(text, '\\p{Han}')) AS BIGINT) AS n_han,
           |         CAST(len(regexp_extract_all(text, '\\p{Hiragana}')) AS BIGINT) AS n_hiragana,
           |         CAST(len(regexp_extract_all(text, '\\p{Katakana}')) AS BIGINT) AS n_katakana,
           |         CAST(len(regexp_extract_all(text, '\\p{Thai}')) AS BIGINT) AS n_thai,
           |         CAST(len(regexp_extract_all(text, '\\p{Lao}')) AS BIGINT) AS n_lao,
           |         CAST(len(regexp_extract_all(text, '\\p{Khmer}')) AS BIGINT) AS n_khmer,
           |         CAST(len(regexp_extract_all(text, '\\p{Myanmar}')) AS BIGINT) AS n_myanmar,
           |         CAST(len(regexp_extract_all(text, '\\p{Tibetan}')) AS BIGINT) AS n_tibetan
           |  FROM docs
           |), m AS (
           |  SELECT *, GREATEST(n_latin, n_han, n_hiragana, n_katakana, n_thai, n_lao,
           |                     n_khmer, n_myanmar, n_tibetan) AS best
           |  FROM c
           |)
           |SELECT CAST(doc_id AS BIGINT) AS doc_id,
           |       n_latin, n_han, n_hiragana, n_katakana, n_thai, n_lao,
           |       n_khmer, n_myanmar, n_tibetan,
           |       CASE WHEN n_latin > 0 AND n_latin = best THEN 'latin'
           |            WHEN n_han > 0 AND n_han = best THEN 'han'
           |            WHEN n_hiragana > 0 AND n_hiragana = best THEN 'hiragana'
           |            WHEN n_katakana > 0 AND n_katakana = best THEN 'katakana'
           |            WHEN n_thai > 0 AND n_thai = best THEN 'thai'
           |            WHEN n_lao > 0 AND n_lao = best THEN 'lao'
           |            WHEN n_khmer > 0 AND n_khmer = best THEN 'khmer'
           |            WHEN n_myanmar > 0 AND n_myanmar = best THEN 'myanmar'
           |            WHEN n_tibetan > 0 AND n_tibetan = best THEN 'tibetan'
           |            ELSE 'other' END AS script
           |FROM m ORDER BY doc_id""".stripMargin)),

    // Script-ROUTED quality screen (r19 VERDICT item 1): every doc is
    // routed by dominant script first — Latin docs get the exact
    // Gopher conjunction, segmented-script docs (CJK/Thai/Lao/Khmer/
    // Myanmar/Tibetan) get script-calibrated rules over the SEGMENTED
    // token stream (token bounds, per-token symbol ratio, kept-content
    // fraction, distinct-token repetition floor). The oracle replays
    // routing, segmentation, every feature, and the routed pass —
    // pinning that a CJK doc is screened on REAL statistics (a
    // repetitive one FAILS uniq_frac) instead of an empty token stream.
    QueryDef("p146_multilingual_screen",
      (s, dir) => {
        val docs = s.createDataFrame(screenFixture).toDF("doc_id", "text")
        TextAnalysis.multilingualQualityRules(docs, "doc_id", "text",
          minTokens = 3, maxTokens = 60, minMeanWordLen = 2.0,
          maxMeanWordLen = 8.0, maxSymbolRatio = 0.1, minAlphaFrac = 0.7,
          minStopwordHits = 1, minContentFrac = 0.7, minUniqFrac = 0.3)
          .orderBy("doc")
      },
      Some(s"""WITH docs AS (
           |  SELECT * FROM (VALUES $screenFixtureSqlValues) v(doc_id, text)
           |), c AS (
           |  SELECT doc_id, text,
           |         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS BIGINT) AS n_latin,
           |         CAST(len(regexp_extract_all(text, '\\p{Han}')) AS BIGINT) AS n_han,
           |         CAST(len(regexp_extract_all(text, '\\p{Hiragana}')) AS BIGINT) AS n_hiragana,
           |         CAST(len(regexp_extract_all(text, '\\p{Katakana}')) AS BIGINT) AS n_katakana,
           |         CAST(len(regexp_extract_all(text, '\\p{Thai}')) AS BIGINT) AS n_thai,
           |         CAST(len(regexp_extract_all(text, '\\p{Lao}')) AS BIGINT) AS n_lao,
           |         CAST(len(regexp_extract_all(text, '\\p{Khmer}')) AS BIGINT) AS n_khmer,
           |         CAST(len(regexp_extract_all(text, '\\p{Myanmar}')) AS BIGINT) AS n_myanmar,
           |         CAST(len(regexp_extract_all(text, '\\p{Tibetan}')) AS BIGINT) AS n_tibetan
           |  FROM docs
           |), m AS (
           |  SELECT *, GREATEST(n_latin, n_han, n_hiragana, n_katakana, n_thai,
           |                     n_lao, n_khmer, n_myanmar, n_tibetan) AS best
           |  FROM c
           |), r AS (
           |  SELECT doc_id, text,
           |         CASE WHEN n_latin > 0 AND n_latin = best THEN 'latin'
           |              WHEN n_han > 0 AND n_han = best THEN 'han'
           |              WHEN n_hiragana > 0 AND n_hiragana = best THEN 'hiragana'
           |              WHEN n_katakana > 0 AND n_katakana = best THEN 'katakana'
           |              WHEN n_thai > 0 AND n_thai = best THEN 'thai'
           |              WHEN n_lao > 0 AND n_lao = best THEN 'lao'
           |              WHEN n_khmer > 0 AND n_khmer = best THEN 'khmer'
           |              WHEN n_myanmar > 0 AND n_myanmar = best THEN 'myanmar'
           |              WHEN n_tibetan > 0 AND n_tibetan = best THEN 'tibetan'
           |              ELSE 'other' END AS script
           |  FROM m
           |), f AS (
           |  SELECT doc_id, script,
           |         CASE WHEN script IN ('han','hiragana','katakana','thai','lao',
           |                              'khmer','myanmar','tibetan')
           |              THEN 'segmented' ELSE 'latin' END AS route,
           |         ${segToksSql("text")} AS toks,
           |         CASE WHEN TRIM(text) = '' THEN 0
           |              ELSE CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) END AS n_words,
           |         len(regexp_replace(TRIM(text), '\\s+', '', 'g')) AS n_wchars,
           |         (len(text) - len(replace(text, '#', '')))
           |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
           |         CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS alpha_words,
           |         CAST(len(regexp_extract_all(lower(text), '\\b(the|be|to|of|and|that|have|with)\\b')) AS BIGINT) AS stopword_hits,
           |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9$segRe2]')) AS BIGINT) AS n_content,
           |         CAST(len(regexp_extract_all(text, '\\S')) AS BIGINT) AS n_nonspace
           |  FROM r
           |), g AS (
           |  SELECT doc_id, script, route,
           |         CAST(len(toks) AS BIGINT) AS n_tokens,
           |         ROUND(CAST(symbols AS DOUBLE) / GREATEST(len(toks), 1), 6) AS symbol_ratio,
           |         ROUND(CAST(n_content AS DOUBLE) / GREATEST(n_nonspace, 1), 6) AS content_frac,
           |         ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1), 6) AS uniq_frac,
           |         n_words,
           |         ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) AS mean_word_len,
           |         ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) AS g_symbol_ratio,
           |         ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) AS alpha_frac,
           |         stopword_hits
           |  FROM f
           |)
           |SELECT CAST(doc_id AS BIGINT) AS doc,
           |       script, route, n_tokens, symbol_ratio, content_frac, uniq_frac,
           |       CASE WHEN route = 'latin'
           |            THEN (n_words BETWEEN 3 AND 60
           |                  AND mean_word_len BETWEEN 2.0 AND 8.0
           |                  AND g_symbol_ratio <= 0.1 AND alpha_frac >= 0.7
           |                  AND stopword_hits >= 1)
           |            ELSE (n_tokens BETWEEN 3 AND 60
           |                  AND symbol_ratio <= 0.1 AND content_frac >= 0.7
           |                  AND uniq_frac >= 0.3) END AS pass
           |FROM g ORDER BY doc""".stripMargin)),

    // Ordered screen-cascade EXECUTION (r19 VERDICT item 5: the
    // ordering advisory is now wired into a runner): rank the p142
    // screens deterministically (idGate-sampled selectivity / caller
    // cost), execute the cascade in rank order, and attribute every
    // dropped doc to the FIRST screen that kills it. The oracle
    // replays the ranking AND the realized attribution — first-kill =
    // the min-rank failing screen, an order-independent formulation
    // DuckDB computes without dynamic CASE reordering.
    QueryDef("p147_screen_cascade",
      (s, dir) => {
        val feats = TextAnalysis.qualityFeatures(col("text")).toMap
        val docs = Tables.load(s, dir, "documents").select("doc_id", "text")
        val screens = Seq(
          ("minwords", feats("n_words") >= 20, 1.0),
          ("punct", feats("punct_ratio") <= 0.2, 2.0),
          ("digit", feats("digit_ratio") <= 0.3, 2.0),
          ("uniq", feats("uniq_word_ratio") >= 0.5, 3.0))
        val (_, card) = TrainingPipeline.curateOrdered(
          docs, "doc_id", screens, sampleTarget = 2000L)
        card.orderBy("rank")
      },
      Some("""WITH f AS (
           |  SELECT doc_id, text, LENGTH(text) AS n_chars,
           |         string_split_regex(TRIM(text), '\s+') AS words
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), smp AS (
           |  SELECT * FROM f
           |  WHERE (doc_id % 100000 * 2654435761) % 1000000 <
           |        (SELECT CAST(ROUND(LEAST(1.0, 2000.0 / COUNT(*)) * 1000000) AS BIGINT)
           |         FROM read_parquet('{SFDIR}/documents.parquet'))
           |), m AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
           |         CAST(SUM(CASE WHEN LEN(words) >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS k_minwords,
           |         CAST(SUM(CASE WHEN CAST(LEN(regexp_extract_all(text, '[\.,;:!\?''"()\[\]{}-]')) AS DOUBLE)
           |                            / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1 ELSE 0 END) AS BIGINT) AS k_punct,
           |         CAST(SUM(CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           |                            / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1 ELSE 0 END) AS BIGINT) AS k_digit,
           |         CAST(SUM(CASE WHEN CAST(LEN(list_distinct(words)) AS DOUBLE)
           |                            / CAST(GREATEST(LEN(words), 1) AS DOUBLE) >= 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS k_uniq
           |  FROM smp
           |), sdef AS (
           |  SELECT * FROM (VALUES
           |    ('minwords', 1.0), ('punct', 2.0), ('digit', 2.0), ('uniq', 3.0)) v(screen, cost)
           |), j AS (
           |  SELECT sdef.screen, m.n AS sample_n,
           |         CASE sdef.screen WHEN 'minwords' THEN k_minwords
           |              WHEN 'punct' THEN k_punct
           |              WHEN 'digit' THEN k_digit ELSE k_uniq END AS kept,
           |         sdef.cost
           |  FROM sdef, m
           |), ranked AS (
           |  SELECT CAST(ROW_NUMBER() OVER (
           |           ORDER BY ROUND((1.0 - kept / CAST(sample_n AS DOUBLE)) / cost, 6) DESC,
           |                    screen ASC) AS INT) AS rank,
           |         screen
           |  FROM j
           |), ev AS (
           |  SELECT f.doc_id, r.rank,
           |         CASE r.screen
           |           WHEN 'minwords' THEN LEN(words) >= 20
           |           WHEN 'punct' THEN CAST(LEN(regexp_extract_all(text, '[\.,;:!\?''"()\[\]{}-]')) AS DOUBLE)
           |                             / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2
           |           WHEN 'digit' THEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
           |                             / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3
           |           ELSE CAST(LEN(list_distinct(words)) AS DOUBLE)
           |                / CAST(GREATEST(LEN(words), 1) AS DOUBLE) >= 0.5 END AS keeps
           |  FROM f, ranked r
           |), kills AS (
           |  SELECT doc_id, MIN(rank) AS krank FROM ev WHERE NOT keeps GROUP BY doc_id
           |), dr AS (
           |  SELECT krank, CAST(COUNT(*) AS BIGINT) AS dropped FROM kills GROUP BY krank
           |), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM f),
           |card AS (
           |  SELECT r.rank, r.screen, COALESCE(dr.dropped, 0) AS dropped, tot.total
           |  FROM ranked r LEFT JOIN dr ON dr.krank = r.rank, tot
           |)
           |SELECT rank, screen,
           |       CAST(total - COALESCE(SUM(dropped) OVER (ORDER BY rank
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS docs_in,
           |       CAST(dropped AS BIGINT) AS docs_dropped,
           |       CAST(total - SUM(dropped) OVER (ORDER BY rank
           |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS docs_surviving
           |FROM card ORDER BY rank""".stripMargin)),

    // The routed screen at CORPUS scale (p146 is the mixed-script
    // fixture; this runs the same operator over the documents table
    // with production-shaped thresholds, so the corpus-path plan and
    // the Latin-route equivalence are oracle-pinned at data scale too).
    QueryDef("p148_multilingual_corpus",
      (s, dir) => TextAnalysis.multilingualQualityRules(
        Tables.load(s, dir, "documents").select("doc_id", "text"),
        "doc_id", "text", minTokens = 40, minStopwordHits = 2)
        .orderBy("doc"),
      Some(s"""WITH r AS (
           |  SELECT doc_id, text,
           |         CASE WHEN len(regexp_extract_all(text, '[A-Za-z]')) > 0 THEN 'latin'
           |              ELSE 'other' END AS script
           |  FROM read_parquet('{SFDIR}/documents.parquet')
           |), f AS (
           |  SELECT doc_id, script, 'latin' AS route,
           |         ${segToksSql("text")} AS toks,
           |         CASE WHEN TRIM(text) = '' THEN 0
           |              ELSE CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) END AS n_words,
           |         len(regexp_replace(TRIM(text), '\\s+', '', 'g')) AS n_wchars,
           |         (len(text) - len(replace(text, '#', '')))
           |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
           |         CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS alpha_words,
           |         CAST(len(regexp_extract_all(lower(text), '\\b(the|be|to|of|and|that|have|with)\\b')) AS BIGINT) AS stopword_hits,
           |         CAST(len(regexp_extract_all(text, '[A-Za-z0-9$segRe2]')) AS BIGINT) AS n_content,
           |         CAST(len(regexp_extract_all(text, '\\S')) AS BIGINT) AS n_nonspace
           |  FROM r
           |)
           |SELECT CAST(doc_id AS BIGINT) AS doc,
           |       script, route,
           |       CAST(len(toks) AS BIGINT) AS n_tokens,
           |       ROUND(CAST(symbols AS DOUBLE) / GREATEST(len(toks), 1), 6) AS symbol_ratio,
           |       ROUND(CAST(n_content AS DOUBLE) / GREATEST(n_nonspace, 1), 6) AS content_frac,
           |       ROUND(CAST(len(list_distinct(toks)) AS DOUBLE) / GREATEST(len(toks), 1), 6) AS uniq_frac,
           |       (n_words BETWEEN 40 AND 100000
           |        AND ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) BETWEEN 3.0 AND 10.0
           |        AND ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) <= 0.1
           |        AND ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) >= 0.8
           |        AND stopword_hits >= 2) AS pass
           |FROM f ORDER BY doc""".stripMargin)),
  )

  /** Multilingual fixture for the segmentation oracle (p143): spaceless
    * CJK/Thai, Latin, and mixed-script lines. Inline VALUES on both
    * engines — the sf tables are ASCII, and the whole point is the
    * non-ASCII path. */
  private val cjkFixture: Seq[(Long, String)] = Seq(
    (1L, "Spark引擎は高速です and very fast"),
    (2L, "ภาษาไทยไม่มีช่องว่าง between words"),
    (3L, "plain latin text only, with punctuation!"),
    (4L, "深度学习模型训练数据 mixed 管道 pipeline 123"),
    (5L, "カタカナとひらがな混在のテキスト"),
    // r19 ADVICE: a doc whose ONLY target-script codepoints are
    // supplementary-plane Han (CJK Ext-B, U+20000+) — pins the
    // widened SegGuard (a BMP-only guard skips segmentation here and
    // the strip deletes the text outright)
    (6L, new String(Character.toChars(0x20000)) +
      new String(Character.toChars(0x20001)) +
      new String(Character.toChars(0x2000B)) + " ext-b only"),
    // r19 VERDICT item 3: Khmer / Myanmar / Tibetan — spaceless
    // scripts that the five-script class deleted outright
    (7L, "ភាសាខ្មែរ khmer text"),
    (8L, "မြန်မာဘာသာ myanmar text"),
    (9L, "བོད་སྐད་ tibetan text"))

  private def cjkFixtureSqlValues: String = cjkFixture.map {
    case (id, t) => s"($id, '${t.replace("'", "''")}')"
  }.mkString(", ")

  /** Mixed-script fixture for the ROUTED quality screen (p146): Latin
    * docs that pass/fail the Gopher rules, segmented-script docs that
    * pass, a repetitive CJK doc (fails the uniq_frac repetition rule
    * on REAL segmented statistics — the whole point of the router), a
    * CJK symbol-soup doc, Khmer/Tibetan rows, a supplementary-Han-only
    * row, and a mixed row whose argmax routing is pinned. */
  private val screenFixture: Seq[(Long, String)] = Seq(
    (1L, "the cat sat on the mat and it is that good"),
    (2L, "zzz qqq www xyz abc"),
    (3L, "深度学习模型训练数据是大规模的语料库"),
    (4L, "的的的的的的的的的的的的"),
    (5L, "ภาษาไทยไม่มีช่องว่างเลยสักนิด"),
    (6L, "学习### 学习### 学习### ..."),
    (7L, "ភាសាខ្មែរគឺល្អសម្រាប់ការសរសេរ"),
    (8L, new String(Character.toChars(0x20000)) +
      new String(Character.toChars(0x20001)) +
      new String(Character.toChars(0x2000B)) +
      new String(Character.toChars(0x20021))),
    (9L, "mixed 混合 text with the 語 and of 123"),
    (10L, "བོད་སྐད་ནི་སྙན་པོ་ཡོད"))

  private def screenFixtureSqlValues: String = screenFixture.map {
    case (id, t) => s"($id, '${t.replace("'", "''")}')"
  }.mkString(", ")

  /** Messy-but-deterministic URL synthesized from doc_id — the shared
    * input of p105/p106 (SQL so both engines could build it, though only
    * Spark needs to: the oracles replay the EXPECTED outputs instead). */
  /** Deterministic robots.txt body for fixture host number `hn` —
    * ONE expression string valid in BOTH Spark SQL and DuckDB (concat /
    * chr / CASE WHEN are shared dialect), so the p131 oracle parses the
    * byte-identical text the Spark side parses. Exercises: comments,
    * an ignored other-agent group, stacked User-agent lines (star in
    * the second), an empty Disallow (allow-all, no rule), and per-host
    * rule variation.
    */
  private val robotsTxtExpr: String =
    """concat(
      |  '# synthetic robots fixture', chr(10),
      |  'User-agent: badbot', chr(10),
      |  'Disallow: /', chr(10),
      |  chr(10),
      |  'User-agent: goodbot', chr(10),
      |  'User-agent: *', chr(10),
      |  'Disallow: /private  # members only', chr(10),
      |  CASE WHEN hn % 2 = 0 THEN concat('Disallow: /Pages/1', chr(10)) ELSE '' END,
      |  CASE WHEN hn % 2 = 0 THEN concat('Allow: /Pages/12', chr(10)) ELSE '' END,
      |  CASE WHEN hn % 3 = 0 THEN concat('Disallow:', chr(10)) ELSE '' END,
      |  CASE WHEN hn % 5 = 0 THEN concat('Disallow: /Pages/2*3', chr(10)) ELSE '' END,
      |  CASE WHEN hn % 7 = 0 THEN concat('Disallow: /Pages/', CAST(hn AS STRING), '$', chr(10)) ELSE '' END,
      |  chr(10),
      |  'User-agent: extra', chr(10),
      |  'Disallow: /never', chr(10))""".stripMargin

  private val syntheticUrlExpr: String =
    """concat('HTTP://',
      |  CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END,
      |  'Host-', CAST(doc_id % 37 AS STRING), '.Example.org',
      |  CASE WHEN doc_id % 5 = 0 THEN ':80' ELSE '' END,
      |  '/Pages/', CAST(doc_id AS STRING),
      |  CASE CAST(doc_id % 4 AS INT)
      |    WHEN 0 THEN concat('?utm_source=feed&ref_id=', CAST(doc_id AS STRING))
      |    WHEN 1 THEN concat('?id=', CAST(doc_id AS STRING), '&utm_medium=email')
      |    WHEN 2 THEN ''
      |    ELSE '?a=1&&b=2' END,
      |  CASE WHEN doc_id % 7 = 0 THEN '#section-2' ELSE '' END)""".stripMargin

  /** The full curate(minQuality=0.3, minWords=20, spanK=0) pipeline
    * replay — floors, connected-component dedup, Gopher screen, split —
    * restricted to doc_id > max·cutNum/10: the shared oracle of the
    * incremental-curation family (p95, p100). The full run knows
    * nothing about batch boundaries, so the SAME SQL at different cuts
    * is exactly the equivalence statement those operators make.
    */
  private def curatePipelineSql(cutNum: Int): String =
    s"""WITH RECURSIVE cutoff AS (
             |  SELECT MAX(doc_id) * $cutNum // 10 AS cut FROM read_parquet('{SFDIR}/documents.parquet')
             |), """.stripMargin + curateStagesSql + s"""
             |SELECT doc_id, text,
             |       CASE WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 980000 THEN 'train'
             |            WHEN ((doc_id % 100000) * 2654435761) % 1000000 < 990000 THEN 'val'
             |            ELSE 'test' END AS split
             |FROM screened WHERE doc_id > (SELECT cut FROM cutoff)
             |ORDER BY doc_id""".stripMargin

  /** The stage CTEs of the curate(minQuality=0.3, minWords=20, spanK=0)
    * replay — floors (g/corpus), connected-component dedup (cleaned),
    * Gopher screen (screened) — shared by the incremental-equivalence
    * oracles (via [[curatePipelineSql]]) and the stage-attribution
    * report (p101), which counts the same frontiers instead of
    * selecting from them.
    */
  private def curateStagesSql: String =
    curateStagesSqlFrom("read_parquet('{SFDIR}/documents.parquet')")

  /** [[curateStagesSql]] over an arbitrary (doc_id, text) source
    * relation — lets a composition oracle (p119: HTML extraction feeding
    * the curate pipeline) replay the stages over DERIVED text. */
  private def curateStagesSqlFrom(source: String): String =
    s"""f AS (
             |  SELECT doc_id, text,
             |         LENGTH(text) AS n_chars,
             |         string_split_regex(TRIM(text), '\\s+') AS words
             |  FROM $source
             |), g AS (
             |  SELECT doc_id, text,
             |         LEAST(CAST(LEN(words) AS DOUBLE) / 20.0, 1.0) AS len_score,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[\\.,;:!\\?''"()\\[\\]{}-]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.2 THEN 1.0 ELSE 0.5 END AS punct_ok,
             |         CASE WHEN CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE)
             |                   / CAST(GREATEST(n_chars, 1) AS DOUBLE) <= 0.3 THEN 1.0 ELSE 0.5 END AS digit_ok,
             |         CAST(LEN(list_distinct(words)) AS DOUBLE) / CAST(GREATEST(LEN(words), 1) AS DOUBLE) AS uniq_ratio
             |  FROM f
             |), corpus AS (
             |  SELECT doc_id, text FROM g
             |  WHERE ROUND(((len_score * punct_ok) * digit_ok) * 0.5 + uniq_ratio * 0.5, 4) >= 0.3
             |), ${ccDedupTail("0.8")}
             |, cleaned AS (
             |  SELECT c.doc_id, c.text FROM corpus c ANTI JOIN drops ON c.doc_id = drops.doc
             |), gf AS (
             |  SELECT doc_id, text,
             |         CAST(len(string_split_regex(TRIM(text), '\\s+')) AS BIGINT) AS n_words,
             |         len(regexp_replace(TRIM(text), '\\s+', '', 'g')) AS n_wchars,
             |         (len(text) - len(replace(text, '#', '')))
             |           + (len(text) - len(replace(text, '...', ''))) / 3 AS symbols,
             |         CAST(len(regexp_extract_all(text, '\\S*[A-Za-z]\\S*')) AS BIGINT) AS alpha_words
             |  FROM cleaned
             |), screened AS (
             |  SELECT doc_id, text FROM gf
             |  WHERE n_words BETWEEN 20 AND 100000
             |    AND ROUND(CAST(n_wchars AS DOUBLE) / GREATEST(n_words, 1), 6) BETWEEN 3.0 AND 10.0
             |    AND ROUND(CAST(symbols AS DOUBLE) / GREATEST(n_words, 1), 6) <= 0.1
             |    AND ROUND(CAST(alpha_words AS DOUBLE) / GREATEST(n_words, 1), 6) >= 0.8
             |)""".stripMargin
}
