#!/usr/bin/env python3
"""Probe DuckDB's float/decimal conversion semantics — the evidence base
for graft's cross-engine float-parity rules (Queries.dsum / Money / xsum)
and for FloatParitySpec's DuckDB models.

Run: python3 tools/proto_parity.py   (expects every PROBE line to print OK)

Findings on this environment's DuckDB (v1.0.0), each probed on the
EXECUTOR path (through a table scan — DuckDB's constant-folding path can
differ from the vectorized executor for double->decimal!):

1. decimal->decimal scale REDUCTION **truncates toward zero** — not
   HALF_UP (Spark), not half-even: 1.996000 -> DECIMAL(38,2) gives 1.99,
   -2.015000 gives -2.01. Any reduction of a sum with nonzero sub-target
   digits therefore diverges from Spark. Parity rules that survive this:
   (a) only reduce sums whose addends are exact at the target scale
   (dsum over 2-decimal data: residue is zero, truncation == rounding ==
   identity), or (b) exit through FLOOR on the positive cents grid
   (xsum), which is the same exact integer under every rounding mode.

2. decimal->double is **two roundings**: unscaled-int -> double
   (correctly rounded), then a double division by 10^scale. For unscaled
   > 2^53 this differs from the correctly-rounded mathematical value
   (Spark's BigDecimal.doubleValue) — e.g. 18014398509.481989 at scale 6.
   Rule: reduce scale (shrinking unscaled below 2^53) BEFORE the double
   cast; an exact-integer-valued decimal < 2^53 converts identically in
   both engines, and the final /100.0 is one IEEE division in each.

3. double->decimal rounding is **path- and value-dependent** (0.285 ->
   0.29 through a DOUBLE-typed table at scale 2, yet 8.0581925 ->
   8.058192 at scale 6 in one run and 8.058193 in another depending on
   how the value reached the cast) — NO simple model (shortest-repr
   HALF_UP, exact-binary nearest, scaled-multiply-round) reproduces it
   everywhere. Rule: never let a cross-engine compare depend on casting
   an arbitrary double to decimal. The Money factor casts are safe
   because the fixture doubles sit ~1e-11 from a 2-decimal grid point
   and the nearest rounding boundary is 5e-3 away: EVERY candidate model
   (and both engines) agrees there. FloatParitySpec asserts exactly that
   all-models-agree property; this script checks DuckDB against it.
"""
import duckdb
from decimal import Decimal


def check(label, ok):
    print(("OK   " if ok else "FAIL ") + label)
    if not ok:
        raise SystemExit(1)


con = duckdb.connect()

# -- 1. scale reduction truncates toward zero (executor path) ----------
con.execute("""CREATE TABLE red AS SELECT * FROM (VALUES
  ('1.996000'), ('-1.996000'), ('2.015000'), ('-2.015000'), ('1.005000')) t(s)""")
got = dict(con.execute(
    "SELECT s, CAST(CAST(s AS DECIMAL(38,6)) AS DECIMAL(38,2)) FROM red").fetchall())
expect = {'1.996000': Decimal('1.99'), '-1.996000': Decimal('-1.99'),
          '2.015000': Decimal('2.01'), '-2.015000': Decimal('-2.01'),
          '1.005000': Decimal('1.00')}
check("scale reduction truncates toward zero", got == expect)

# -- 2. decimal->double = unscaled->double, then /10^scale -------------
con.execute("""CREATE TABLE big AS SELECT * FROM (VALUES
  ('9007199254.740993'), ('18014398509.481989')) t(s)""")
rows = con.execute(
    "SELECT s, CAST(CAST(s AS DECIMAL(38,6)) AS DOUBLE) FROM big").fetchall()
two_rounding = all(v == float(int(Decimal(s) * 10**6)) / 1e6 for s, v in rows)
check("decimal->double is unscaled/10^scale (two roundings)", two_rounding)
diverges = any(v != float(Decimal(s)) for s, v in rows)
check("  ...and diverges from correctly-rounded above 2^53", diverges)

# -- 2b. after scale-2 reduction of a grid-exact sum, parity holds -----
# sum = 9007199254740.93: >2^53 in 1e-6 units (the raw-cast trap zone),
# <2^53 in cents (inside dsum/xsum's documented ~9e13 domain)
con.execute("""CREATE TABLE grid AS SELECT * FROM (VALUES
  (CAST('4503599627370.46' AS DOUBLE)), (CAST('4503599627370.47' AS DOUBLE))) t(x)""")
v = con.execute("""SELECT CAST(CAST(SUM(CAST(x AS DECIMAL(38,6)))
  AS DECIMAL(38,2)) AS DOUBLE) FROM grid""").fetchone()[0]
s = Decimal('4503599627370.46') + Decimal('4503599627370.47')
assert int(s * 10**6) > 2**53 and int(s * 100) < 2**53
check("dsum shape: grid sum > 2^53 micro-units reduces then casts exactly",
      v == float(int(s * 100)) / 100.0 == float(s))

# -- 2c. duckXsum: FLOOR exit is exact through the double cast ---------
v = con.execute("SELECT CAST(FLOOR(SUM(x) * 100) AS DOUBLE) / 100.0 FROM grid").fetchone()[0]
check("duckXsum: floor-cents exit matches the exact model",
      v == float(int(s * 100)) / 100.0)

# -- 2d. the ~9e13 domain cap is REAL: 2^53+1 cents is inexact ---------
v = con.execute("""SELECT CAST(CAST('90071992547409.93' AS DECIMAL(38,2)) AS DOUBLE)""").fetchone()[0]
check("cents above 2^53 no longer convert exactly (the xsum domain cap)",
      v != float(Decimal('90071992547409.93')))

# -- 3. Money factor casts: grid doubles round identically -------------
con.execute("""CREATE TABLE m AS SELECT CAST(i AS DOUBLE) / 100 AS x
  FROM range(0, 10000) t(i)""")
bad = con.execute("""SELECT count(*) FROM m
  WHERE CAST(x AS DECIMAL(12,2)) != CAST(CAST(x * 100 AS BIGINT) +
        CASE WHEN x * 100 - CAST(x * 100 AS BIGINT) >= 0.5 THEN 1 ELSE 0 END
        AS DECIMAL(12,2)) / 100""").fetchone()[0]
check("grid doubles in [0,100): double->DECIMAL(12,2) is the grid value", bad == 0)

print("all probes OK (DuckDB " + duckdb.__version__ + ")")
