WITH t AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(trim(regexp_replace(text, '[^a-zA-Z0-9\s]', '', 'g'))), '\s+'),
                            x -> x <> '')) AS tok
  FROM read_parquet('{SFDIR}/documents.parquet')
), h AS (
  SELECT doc_id,
         list_reduce(
           list_prepend(CAST('14695981039346656037' AS HUGEINT),
                        list_transform(regexp_extract_all(tok, '.'), c -> CAST(ord(c) AS HUGEINT))),
           (acc, x) -> ((acc - (acc % 256) + CAST(xor(CAST(acc % 256 AS BIGINT), CAST(x AS BIGINT)) AS HUGEINT))
                        * CAST('1099511628211' AS HUGEINT)) % CAST('18446744073709551616' AS HUGEINT)
         ) AS uh
  FROM t
), sh AS (
  SELECT doc_id,
         CAST(CASE WHEN uh >= CAST('9223372036854775808' AS HUGEINT)
                   THEN uh - CAST('18446744073709551616' AS HUGEINT) ELSE uh END AS BIGINT) AS s
  FROM h
), votes AS (
  SELECT doc_id, b.b AS b,
         SUM(CASE WHEN ((s >> b.b) & 1) = 1 THEN 1 ELSE -1 END) AS cnt
  FROM sh CROSS JOIN (SELECT unnest(range(0, 64)) AS b) b
  GROUP BY doc_id, b.b
), fp AS (
  SELECT doc_id,
         SUM(CASE WHEN cnt > 0 THEN CAST(1 AS HUGEINT) << CAST(b AS INT) ELSE CAST(0 AS HUGEINT) END) AS ufp
  FROM votes GROUP BY doc_id
), fps AS (
  SELECT doc_id, ufp,
         CAST(CASE WHEN ufp >= CAST('9223372036854775808' AS HUGEINT)
                   THEN ufp - CAST('18446744073709551616' AS HUGEINT) ELSE ufp END AS BIGINT) AS sfp
  FROM fp
), banded AS (
  SELECT doc_id, sfp, j.j AS band,
         CAST((ufp >> CAST(16 * j.j AS INT)) % 65536 AS INT) AS band_val
  FROM fps CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j
), pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         bit_count(xor(a.sfp, b.sfp)) AS hamming
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, hamming FROM pairs
WHERE hamming <= 14
ORDER BY doc_a, doc_b
