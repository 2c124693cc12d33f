#!/usr/bin/env python3
"""Prototype: md5-based StubDecoder oracle (mm_decode_features) and
md5 sign-plane LSH oracle (ann_lsh_probe) vs simulated-JVM results."""
import hashlib
import math
import sys

import duckdb
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
FDIM = 16
NBITS = 8
RADIUS = 1


def md5_embed(text, dim):
    acc = np.zeros(dim, dtype=np.float64)
    import re
    toks = [t for t in re.split(r"[^a-z0-9]+", text.lower()) if t]
    if not toks:
        acc[0] = 1.0
    for t in toks:
        hx = hashlib.md5(t.encode("utf-8")).hexdigest()
        acc[int(hx[:12], 16) % dim] += 1.0 if int(hx[12], 16) < 8 else -1.0
    norm = math.sqrt(float(np.sum(acc * acc)))
    if norm == 0.0:
        out = np.zeros(dim, dtype=np.float32)
        out[0] = 1.0
    else:
        out = (acc / norm).astype(np.float32)
    return out


def stub_decode(text):
    """Planned md5-based StubDecoder: meta + features from md5 of bytes."""
    hx = hashlib.md5(text.encode("utf-8")).hexdigest()
    h = int(hx[:12], 16)
    w = 64 + h % 1024
    ht = 64 + (h >> 10) % 1024
    ch = 1 + (h >> 20) % 4
    dur = (h >> 22) % 600000
    feat_input = " ".join(hx[i * 2:i * 2 + 2] for i in range(16))
    feats = md5_embed(feat_input, FDIM)
    return w, ht, ch, dur, feats


con = duckdb.connect()
con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")

docs = con.sql("SELECT doc_id, text FROM documents ORDER BY doc_id").fetchall()
py_rows = []
for doc_id, text in docs:
    w, ht, ch, dur, feats = stub_decode(text)
    py_rows.append((doc_id, w, ht, ch, dur, round(float(np.float64(feats[0])), 6)))

sql_mm = f"""
WITH m AS (
  SELECT doc_id, md5(text) AS hx,
         ('0x' || substring(md5(text), 1, 12))::BIGINT AS h
  FROM documents
), tok AS (
  SELECT doc_id, unnest(list_transform(range(16), i -> substring(hx, i*2 + 1, 2))) AS t
  FROM m
), b AS (
  SELECT doc_id,
         (('0x' || substring(md5(t), 1, 12))::BIGINT % {FDIM}) AS bucket,
         CASE WHEN ('0x' || substring(md5(t), 13, 1))::BIGINT < 8 THEN 1 ELSE -1 END AS sign
  FROM tok
), acc AS (
  SELECT doc_id, bucket, sum(sign)::DOUBLE AS w FROM b GROUP BY 1, 2
), nrm AS (
  SELECT doc_id, sqrt(sum(w * w)) AS nn FROM acc GROUP BY doc_id
), f0 AS (
  SELECT n.doc_id,
         CASE WHEN n.nn = 0 THEN 1.0
              ELSE CAST(CAST(COALESCE(a.w, 0.0) / n.nn AS FLOAT) AS DOUBLE) END AS f0
  FROM nrm n LEFT JOIN acc a ON a.doc_id = n.doc_id AND a.bucket = 0
)
SELECT m.doc_id,
       (64 + m.h % 1024)::INT AS width,
       (64 + (m.h >> 10) % 1024)::INT AS height,
       (1 + (m.h >> 20) % 4)::INT AS n_channels,
       ((m.h >> 22) % 600000)::BIGINT AS duration_ms,
       round(f0.f0, 6) AS f0
FROM m JOIN f0 ON m.doc_id = f0.doc_id
ORDER BY m.doc_id
"""
duck_rows = con.sql(sql_mm).fetchall()
mism = [(a, b) for a, b in zip(py_rows, duck_rows) if tuple(a) != tuple(b)]
print("MM MATCH:", not mism, f"({len(mism)}/{len(py_rows)} mismatches)")
for a, b in mism[:5]:
    print("  py=", a, "\n  dk=", b)

# ---------------- LSH ---------------------------------------------------
embs = con.sql("SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
dim = len(embs[0][1])
print(f"{len(embs)} vectors, dim={dim}")

planes = []
for b in range(NBITS):
    row = []
    for j in range(dim):
        hx = hashlib.md5(f"lsh:{b}:{j}".encode()).hexdigest()
        row.append(1.0 if int(hx[:12], 16) % 2 == 0 else -1.0)
    planes.append(np.array(row, dtype=np.float64))


def bucket_of(v32):
    v = np.asarray(v32, dtype=np.float32).astype(np.float64)
    bkt = 0
    for b in range(NBITS):
        dot = 0.0
        for j in range(dim):
            dot += v[j] * planes[b][j]
        if dot >= 0:
            bkt |= 1 << b
    return bkt


# query vector: HashingEmbedder parity not needed here — reuse a stored
# vector-ish literal; use the real flagship vector from Queries would need
# murmur. Use md5_embed(64) of a fixed text as the query (portable).
qv = md5_embed("graft lsh probe query", 64)
qbucket = bucket_of(qv)
print("qbucket:", qbucket)

import decimal
q_lit = "[" + ", ".join(str(decimal.Decimal(float(np.float64(x)))) for x in qv) + "]::DOUBLE[]"


def cosine(a32, q):
    a = np.asarray(a32, dtype=np.float32).astype(np.float64)
    dot = na = nq = 0.0
    for i in range(len(a)):
        dot += a[i] * q[i]
        na += a[i] * a[i]
        nq += q[i] * q[i]
    return 1.0 - dot / (math.sqrt(na) * math.sqrt(nq))


qd = qv.astype(np.float64)
cand = []
for vec_id, emb in embs:
    bkt = bucket_of(emb)
    if bin(bkt ^ qbucket).count("1") <= RADIUS:
        cand.append((vec_id, bkt, round(cosine(emb, qd), 6)))
py_top = sorted(cand, key=lambda r: (r[2], r[0]))[:10]

sql_lsh = f"""
WITH planes AS (
  SELECT b, list_transform(range({dim}), j ->
    CASE WHEN ('0x' || substring(md5('lsh:' || b::VARCHAR || ':' || j::VARCHAR), 1, 12))::BIGINT % 2 = 0
         THEN 1.0 ELSE -1.0 END) AS plane
  FROM (SELECT unnest(range({NBITS})) AS b)
), bk AS (
  SELECT e.vec_id,
         sum(CASE WHEN list_dot_product(e.embedding::DOUBLE[], p.plane) >= 0
                  THEN (1::BIGINT << p.b) ELSE 0 END)::BIGINT AS lsh_bucket
  FROM embeddings e CROSS JOIN planes p GROUP BY e.vec_id
), qb AS (
  SELECT sum(CASE WHEN list_dot_product({q_lit}, plane) >= 0
                  THEN (1::BIGINT << b) ELSE 0 END)::BIGINT AS qbucket
  FROM planes
), cand AS (
  SELECT bk.vec_id, bk.lsh_bucket FROM bk, qb
  WHERE len(list_filter(range({NBITS}), i ->
        ((bk.lsh_bucket >> i) & 1) <> ((qb.qbucket >> i) & 1))) <= {RADIUS}
), d AS (
  SELECT c.vec_id, c.lsh_bucket,
         (1.0 - (list_dot_product(e.embedding::DOUBLE[], {q_lit}) /
           (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
            sqrt(list_dot_product({q_lit}, {q_lit}))))) AS dist
  FROM cand c JOIN embeddings e ON c.vec_id = e.vec_id
)
SELECT vec_id, lsh_bucket, round(dist, 6) AS distance
FROM d ORDER BY dist, vec_id LIMIT 10
"""
duck_top = con.sql(sql_lsh).fetchall()
print("py  :", py_top)
print("duck:", duck_top)
print("LSH MATCH:", [tuple(r) for r in py_top] == [tuple(r) for r in duck_top],
      f"(candidates: {len(cand)})")
