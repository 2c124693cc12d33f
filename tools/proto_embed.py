#!/usr/bin/env python3
"""Prototype: md5-portable embedder DuckDB oracle vs simulated-JVM result.

Simulates the JVM Md5PortableEmbedder (double accumulate, float32 quantize)
in Python/numpy and diffs the candidate DuckDB oracle SQL for
txt_embed_knn_e2e + txt_embed_pipeline against it.
"""
import hashlib
import math
import re
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
DIM = 64


def jvm_embed(text, dim=DIM):
    """Exact mirror of the planned Scala Md5PortableEmbedder.encode."""
    acc = np.zeros(dim, dtype=np.float64)
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        acc[0] = 1.0
    for t in toks:
        hx = hashlib.md5(t.encode("utf-8")).hexdigest()
        h = int(hx[:12], 16)
        sign = 1.0 if int(hx[12], 16) < 8 else -1.0
        acc[h % dim] += sign
    norm = math.sqrt(float(np.sum(acc * acc)))
    if norm == 0.0:
        out = np.zeros(dim, dtype=np.float32)
        out[0] = 1.0
    else:
        out = (acc / norm).astype(np.float32)  # float32 cast = JVM .toFloat
    return out


def cosine(a32, q32):
    """Sequential double cosine, as graft CosineDistance / list_dot_product."""
    a = a32.astype(np.float64)
    q = q32.astype(np.float64)
    dot = 0.0
    na = 0.0
    nq = 0.0
    for i in range(len(a)):  # sequential like the JVM loop
        dot += a[i] * q[i]
        na += a[i] * a[i]
        nq += q[i] * q[i]
    return 1.0 - dot / (math.sqrt(na) * math.sqrt(nq))


def float_lit(f):
    import decimal
    return str(decimal.Decimal(float(np.float64(np.float32(f)))))


QUERY_TEXT = "graft portable embed knn query"
qv = jvm_embed(QUERY_TEXT)
q_lit = "[" + ", ".join(float_lit(x) for x in qv) + "]::DOUBLE[]"

con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")

docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
print(f"{len(docs)} docs")

# --- simulated-JVM side -----------------------------------------------
py_rows = []
for doc_id, text in docs:
    v = jvm_embed(text if text is not None else "")
    d = round(cosine(v, qv), 6)
    py_rows.append((doc_id, d))
py_top = sorted(py_rows, key=lambda r: (r[1], r[0]))[:10]

# pipeline output: dim + norm rounded 4
py_pipe = []
for doc_id, text in docs:
    v = jvm_embed(text if text is not None else "")
    n = 0.0
    vd = v.astype(np.float64)
    for i in range(len(vd)):
        n += vd[i] * vd[i]
    py_pipe.append((doc_id, DIM, round(math.sqrt(n), 4)))

# --- DuckDB oracle -----------------------------------------------------
NORM = r"lower(trim(regexp_replace(text, '\s+', ' ', 'g')))"
TOKS = r"list_filter(string_split_regex(norm, '[^a-z0-9]+'), x -> x <> '')"

EMBED_CTE = f"""
WITH t0 AS (
  SELECT doc_id, {NORM} AS norm FROM documents
), tt AS (
  SELECT doc_id, {TOKS} AS toks FROM t0
), tok AS (
  SELECT doc_id, unnest(toks) AS t FROM tt
), b AS (
  SELECT doc_id,
         (('0x' || substring(md5(t), 1, 12))::BIGINT % {DIM}) AS bucket,
         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
  FROM tok
), acc AS (
  SELECT doc_id, bucket, sum(sign)::DOUBLE AS w FROM b GROUP BY 1, 2
), dense AS (
  SELECT tt.doc_id, r.i AS bucket, COALESCE(a.w, 0.0) AS w
  FROM tt
  CROSS JOIN (SELECT unnest(range({DIM})) AS i) r
  LEFT JOIN acc a ON a.doc_id = tt.doc_id AND a.bucket = r.i
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM dense GROUP BY doc_id
), comp AS (
  SELECT d.doc_id, d.bucket,
         CASE WHEN n.nn = 0 THEN (CASE WHEN d.bucket = 0 THEN 1.0 ELSE 0.0 END)
              ELSE CAST(CAST(d.w / n.nn AS FLOAT) AS DOUBLE) END AS c
  FROM dense d JOIN nrm n ON d.doc_id = n.doc_id
), vecs AS (
  SELECT doc_id, list(c ORDER BY bucket) AS v FROM comp GROUP BY doc_id
)"""

sql_knn = EMBED_CTE + f"""
, d AS (
  SELECT doc_id,
         (1.0 - (list_dot_product(v, {q_lit}) /
           (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product({q_lit}, {q_lit}))))) AS dist
  FROM vecs
)
SELECT doc_id, round(dist, 6) AS distance FROM d ORDER BY dist, doc_id LIMIT 10
"""

duck_top = con.sql(sql_knn).fetchall()
print("py  :", py_top)
print("duck:", duck_top)
ok = all(a[0] == b[0] and a[1] == b[1] for a, b in zip(py_top, duck_top))
print("KNN MATCH:", ok)

sql_pipe = EMBED_CTE + f"""
SELECT doc_id, {DIM}::INT AS dim, round(sqrt(list_dot_product(v, v)), 4) AS norm
FROM vecs ORDER BY doc_id
"""
duck_pipe = con.sql(sql_pipe).fetchall()
mism = [(a, b) for a, b in zip(py_pipe, duck_pipe) if a[0] != b[0] or a[1] != b[1] or a[2] != b[2]]
print("PIPE MATCH:", not mism, f"({len(mism)} mismatches)")
for a, b in mism[:5]:
    print("  py=", a, " duck=", b)
