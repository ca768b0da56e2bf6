#!/usr/bin/env python3
"""Native sf1 corpus generator (VERDICT r8 item 10).

Generates a TRUE sf1 corpus (10x sf0.1 row counts) at /tmp/sf1 with fresh,
hash-derived rows — NOT key-shifted replicas. The 10x replica corpora
(/tmp/sf_scaled) are adversarial for dedup (every doc gains 9 exact copies)
and IO-unrealistic (parquet dictionary pages compress replicas away); this
generator reproduces the sf0.1 generator's *distributions* (measured from
the data itself — see the profile in NOTES_r09) with genuinely unique
content, so bench numbers reflect realistic uniqueness at 10x volume.

Determinism: every random draw is DuckDB hash(key || salt) — rerunning the
script reproduces the corpus bit-for-bit on the same DuckDB version.

Measured sf0.1 distributions this mimics:
  orders     o_orderdate U[1995-01-01, 2001-08-01], totalprice U[1000, 500000),
             status/priority uniform; custkey uniform over customers
  lineitem   lines-per-order empirical CDF (incl. 1.8% zero-line orders),
             quantity U{1..50}, discount U{0.00..0.10}, tax U{0.00..0.08},
             extendedprice = quantity * part.retailprice,
             shipdate = orderdate + U{1..95} days
  part       name = adj x noun (8x8), brand U{Brand#0..24}, 6 types,
             size U{1..50}, retailprice = 900 + (key % 20000)*0.1
  customer   nation U{0..24}, acctbal U[-1000, 10000), 5 mktsegments
  events     ts U over 30 days of 2024-01, user_id U{0..14999},
             5 types uniform, value ~ Exp(mean 50) rounded 2,
             props = {"k": U{0..99}}
  documents  10..100 words uniform from the 31-word corpus vocabulary,
             lang {en .41, zh .15, es .149, fr .148, de .14}, 20 sources
  embeddings 64-dim unit-normalized Gaussian, label U{0..9}
  region/nation  fixed dims, copied verbatim
"""
import duckdb, os, sys, math

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
SRC = "/root/testdata/sf0.1"
os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.execute("SET threads TO 16")

# u(key, salt) in [0,1): deterministic uniform
U = lambda k, s: f"((hash({k} + {s}*4294967311) % 1000000007) / 1000000007.0)"
# integer draw in [0, n) — CAST to BIGINT (hash() is UBIGINT, which Spark
# cannot read from parquet as a plain long)
I = lambda k, s, n: f"CAST(hash({k} + {s}*4294967311) % {n} AS BIGINT)"

for t in ("region", "nation"):
    con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")

con.execute(f"""
COPY (
  SELECT i AS c_custkey,
         printf('Customer#%09d', i) AS c_name,
         CAST({I('i',1,25)} AS INT) AS c_nationkey,
         round({U('i',2)} * 11000 - 1000, 2) AS c_acctbal,
         ['MACHINERY','AUTOMOBILE','HOUSEHOLD','BUILDING','FURNITURE'][CAST({I('i',3,5)} AS INT) + 1] AS c_mktsegment
  FROM range(150000) t(i) ORDER BY i
) TO '{OUT}/customer.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT i AS s_suppkey,
         printf('Supplier#%09d', i) AS s_name,
         CAST({I('i',4,25)} AS INT) AS s_nationkey,
         round({U('i',5)} * 11000 - 1000, 2) AS s_acctbal
  FROM range(10000) t(i) ORDER BY i
) TO '{OUT}/supplier.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT i AS p_partkey,
         ['blue','cold','hot','large','new','old','red','small'][CAST({I('i',6,8)} AS INT) + 1]
           || ' ' ||
         ['anvil','bolt','gear','gizmo','plate','ring','rod','widget'][CAST({I('i',7,8)} AS INT) + 1] AS p_name,
         'Brand#' || CAST({I('i',8,25)} AS INT) AS p_brand,
         ['ECONOMY','LARGE','STANDARD','MEDIUM','SMALL','PROMO'][CAST({I('i',9,6)} AS INT) + 1] AS p_type,
         CAST({I('i',10,50)} AS INT) + 1 AS p_size,
         round(900 + (i % 20000) * 0.1, 1) AS p_retailprice
  FROM range(200000) t(i) ORDER BY i
) TO '{OUT}/part.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT i AS o_orderkey,
         {I('i',11,150000)} AS o_custkey,
         ['O','P','F'][CAST({I('i',12,3)} AS INT) + 1] AS o_orderstatus,
         round(1000 + {U('i',13)} * 499000, 2) AS o_totalprice,
         TIMESTAMP '1995-01-01' + INTERVAL (CAST({I('i',14,2404)} AS INT)) DAY AS o_orderdate,
         ['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'][CAST({I('i',15,5)} AS INT) + 1] AS o_orderpriority
  FROM range(1500000) t(i) ORDER BY i
) TO '{OUT}/orders.parquet' (FORMAT PARQUET)""")

# lines-per-order: empirical CDF measured at sf0.1 (counts over 150k orders,
# first bucket = orders with zero lineitems)
cdf_counts = [2764, 11016, 21814, 29500, 29097, 23631, 15625, 8941, 4407,
              1959, 818, 292, 93, 29, 10, 1, 2, 1]
cum, cases = 0, []
for n, c in enumerate(cdf_counts):
    cum += c
    cases.append(f"WHEN u < {cum / 150000.0} THEN {n}")
nlines_case = "CASE " + " ".join(cases) + " ELSE 4 END"

con.execute(f"""
COPY (
  WITH o AS (
    SELECT i AS okey,
           TIMESTAMP '1995-01-01' + INTERVAL (CAST({I('i',14,2404)} AS INT)) DAY AS odate,
           {nlines_case.replace('u', U('i',16))} AS nlines
    FROM range(1500000) t(i)
  )
  SELECT okey AS l_orderkey,
         {I('(okey*20 + w.i)',17,200000)} AS l_partkey,
         {I('(okey*20 + w.i)',18,10000)} AS l_suppkey,
         CAST(w.i + 1 AS INT) AS l_linenumber,
         CAST(CAST({I('(okey*20 + w.i)',19,50)} AS INT) + 1 AS DOUBLE) AS l_quantity,
         round(900 + {U('(okey*20 + w.i)',36)} * 104100, 2) AS l_extendedprice,
         CAST({I('(okey*20 + w.i)',20,11)} AS INT) / 100.0 AS l_discount,
         CAST({I('(okey*20 + w.i)',21,9)} AS INT) / 100.0 AS l_tax,
         ['A','N','R','R','N','A'][CAST({I('(okey*20 + w.i)',22,6)} AS INT) + 1] AS l_returnflag,
         ['F','O','O','F','F','O'][CAST({I('(okey*20 + w.i)',22,6)} AS INT) + 1] AS l_linestatus,
         odate + INTERVAL (CAST({I('(okey*20 + w.i)',23,95)} AS INT) + 1) DAY AS l_shipdate
  FROM o, range(17) w(i)
  WHERE w.i < o.nlines
  ORDER BY okey, w.i
) TO '{OUT}/lineitem.parquet' (FORMAT PARQUET)""")

con.execute(f"""
COPY (
  SELECT i AS event_id,
         TIMESTAMP '2024-01-01' + INTERVAL (CAST(hash(i + 24*4294967311) % 2592000000000 AS BIGINT)) MICROSECOND AS ts,
         {I('i',25,15000)} AS user_id,
         ['signup','purchase','view','click','error'][CAST({I('i',26,5)} AS INT) + 1] AS event_type,
         round(-50 * ln(1 - {U('i',27)}), 2) AS value,
         '{{"k": ' || CAST({I('i',28,100)} AS INT) || '}}' AS props
  FROM range(1000000) t(i) ORDER BY i
) TO '{OUT}/events.parquet' (FORMAT PARQUET)""")

vocab = ['a','agg','batch','big','column','customer','data','dup','fast','filter',
         'group','hash','join','key','line','merge','order','part','query','row',
         'scan','slow','small','sort','spark','stream','table','the','value',
         'vector','window']
vlist = "[" + ",".join(f"'{w}'" for w in vocab) + "]"
con.execute(f"""
COPY (
  WITH words AS (
    SELECT d.i AS doc_id, w.i AS pos,
           {vlist}[CAST(hash(d.i*131 + w.i + 29*4294967311) % 31 AS INT) + 1] AS word
    FROM range(50000) d(i), range(100) w(i)
    WHERE w.i < 10 + CAST({I('d.i',30,91)} AS INT)
  ),
  docs AS (
    SELECT doc_id, string_agg(word, ' ' ORDER BY pos) AS text FROM words GROUP BY doc_id
  )
  SELECT doc_id,
         text,
         CASE WHEN {U('doc_id',31)} < 0.41 THEN 'en'
              WHEN {U('doc_id',31)} < 0.56 THEN 'zh'
              WHEN {U('doc_id',31)} < 0.709 THEN 'es'
              WHEN {U('doc_id',31)} < 0.857 THEN 'fr'
              ELSE 'de' END AS lang,
         'src' || CAST({I('doc_id',32,20)} AS INT) AS source,
         length(text) AS n_chars
  FROM docs ORDER BY doc_id
) TO '{OUT}/documents.parquet' (FORMAT PARQUET)""")

# 64-dim unit-normalized Gaussian embeddings: Box-Muller from two hash uniforms
con.execute(f"""
COPY (
  WITH dims AS (
    SELECT v.i AS vec_id, d.i AS dim,
           sqrt(-2 * ln((hash(v.i*977 + d.i + 33*4294967311) % 1000000007 + 1) / 1000000008.0))
             * cos(2 * pi() * ((hash(v.i*977 + d.i + 34*4294967311) % 1000000007) / 1000000007.0)) AS z
    FROM range(20000) v(i), range(64) d(i)
  ),
  norms AS (
    SELECT vec_id, sqrt(sum(z*z)) AS nrm FROM dims GROUP BY vec_id
  )
  SELECT d.vec_id,
         CAST(list(CAST(d.z / n.nrm AS FLOAT) ORDER BY d.dim) AS FLOAT[]) AS embedding,
         CAST({I('d.vec_id',35,10)} AS INT) AS label
  FROM dims d JOIN norms n USING (vec_id)
  GROUP BY d.vec_id, n.nrm ORDER BY d.vec_id
) TO '{OUT}/embeddings.parquet' (FORMAT PARQUET)""")

for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
    print(t, n)
print("done ->", OUT)
