WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         CAST((vec_id % 100000) * 2654435761 % 8 AS INT) AS c0a
  FROM read_parquet('{SFDIR}/embeddings.parquet')
), u0 AS (
  SELECT c0a AS cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM v
), c0 AS (
  SELECT cid, list(m ORDER BY ord) AS c FROM (
    SELECT cid, ord, AVG(val) AS m FROM u0 GROUP BY cid, ord
  ) GROUP BY cid
), a1 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c0.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.e, c0.c) DESC, c0.cid DESC) AS rn
    FROM v, c0
  ) WHERE rn = 1
), u1 AS (
  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a1
), c1 AS (
  SELECT cid, list(m ORDER BY ord) AS c FROM (
    SELECT cid, ord, AVG(val) AS m FROM u1 GROUP BY cid, ord
  ) GROUP BY cid
), a2 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c1.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.e, c1.c) DESC, c1.cid DESC) AS rn
    FROM v, c1
  ) WHERE rn = 1
), u2 AS (
  SELECT cid, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS ord FROM a2
), c2 AS (
  SELECT cid, list(m ORDER BY ord) AS c FROM (
    SELECT cid, ord, AVG(val) AS m FROM u2 GROUP BY cid, ord
  ) GROUP BY cid
), a3 AS (
  SELECT vec_id, e, cid FROM (
    SELECT v.vec_id, v.e, c2.cid,
           ROW_NUMBER() OVER (PARTITION BY v.vec_id
                              ORDER BY list_dot_product(v.e, c2.c) DESC, c2.cid DESC) AS rn
    FROM v, c2
  ) WHERE rn = 1
), q AS (
  SELECT e AS qe FROM v WHERE vec_id = 0
), probes AS (
  SELECT cid FROM c2, q ORDER BY list_dot_product(c2.c, q.qe) DESC, cid ASC LIMIT 3
)
SELECT a3.vec_id, ROUND(list_cosine_similarity(a3.e, q.qe), 6) AS cosine
FROM a3, q WHERE a3.cid IN (SELECT cid FROM probes)
ORDER BY cosine DESC, vec_id ASC LIMIT 10
