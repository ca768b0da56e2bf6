#!/usr/bin/env python3
"""Zipf-vocabulary documents corpus (VERDICT r9 item 2).

The synthetic sf* corpora draw every word uniformly from a 31-word
vocabulary, so every shingle is common, prefix/df-cap blocking cannot
prune, and the TRUE qualifying-pair set of the exact-similarity joins is
~quadratic — their sf1 cost tracked output volume, not plan quality
(NOTES_r09). This generator produces a REALISTIC corpus: 10,000-word
vocabulary with Zipf(s=1.05) frequencies (the empirical shape of natural
language), doc length 10..100 words uniform, deterministic hash-derived
draws (bit-for-bit reproducible). On such a corpus most shingles are
rare, blocking selects far fewer candidates, and the 10x scale ratio of
q322/q33/q302 measures the BLOCKING discipline instead of pair volume.

  python3 tools/gen_zipf.py /tmp/zipf_5k 5000     # sf0.1-scale docs
  python3 tools/gen_zipf.py /tmp/zipf_50k 50000   # sf1-scale docs

Writes documents.parquet only (the three certified faces read nothing
else).
"""
import duckdb, os, sys

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/zipf_5k"
NDOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
VOCAB = 10000
S = 1.05

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

U = lambda k, s: f"((hash({k} + {s}*4294967311) % 1000000007) / 1000000007.0)"
I = lambda k, s, n: f"CAST(hash({k} + {s}*4294967311) % {n} AS BIGINT)"

# inverse-CDF table: rank -> [cumlo, cumhi) probability window
con.execute(f"""
CREATE TABLE vocab AS
WITH v AS (
  SELECT i + 1 AS rank, 1.0 / pow(i + 1, {S}) AS w FROM range({VOCAB}) t(i)
), tot AS (SELECT sum(w) AS tw FROM v)
SELECT rank,
       'w' || lpad(CAST(rank AS VARCHAR), 5, '0') AS word,
       sum(w / tw) OVER (ORDER BY rank ROWS BETWEEN UNBOUNDED PRECEDING
                         AND CURRENT ROW) - w / tw AS cumlo
FROM v, tot ORDER BY rank""")

con.execute(f"""
COPY (
  WITH positions AS (
    SELECT d.i AS doc_id, p.i AS pos,
           {U('d.i * 131 + p.i', 977)} AS u
    FROM range({NDOCS}) d(i)
    CROSS JOIN range(100) p(i)
    WHERE p.i < 10 + {I('d.i', 41, 91)}
  ),
  words AS (
    SELECT doc_id, pos, v.word
    FROM positions p ASOF JOIN vocab v ON v.cumlo <= p.u
  ),
  docs AS (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text
    FROM words GROUP BY doc_id
  )
  SELECT doc_id,
         CASE WHEN {U('doc_id', 31)} < 0.41 THEN 'en'
              WHEN {U('doc_id', 31)} < 0.56 THEN 'zh'
              WHEN {U('doc_id', 31)} < 0.709 THEN 'es'
              WHEN {U('doc_id', 31)} < 0.857 THEN 'fr'
              ELSE 'de' END AS lang,
         'src' || CAST({I('doc_id', 32, 20)} AS INT) AS source,
         CAST(length(text) AS BIGINT) AS n_chars,
         text
  FROM docs ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

n, = con.execute(f"SELECT count(*) FROM '{OUT}/documents.parquet'").fetchone()
dw, = con.execute(
    f"SELECT count(DISTINCT w) FROM (SELECT unnest(string_split(text, ' ')) w "
    f"FROM '{OUT}/documents.parquet')").fetchone()
print(f"{OUT}: {n} docs, {dw} distinct words in use")
