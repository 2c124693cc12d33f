#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each SparkEntry oracle SQL in DuckDB over the same parquet fixtures
and diffs against the Verify parquet dumps. Usage:

    tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vout
    python3 tools/local_check.py /root/testdata/sf0.01 /tmp/vout [--only a,b,c]

At synthesized-decade SFs (sf10: 60M-row lineitem), DuckDB's defaults
exhaust the box: unlimited memory OOMs the process mid-suite and the
cwd-relative temp dir fills the root filesystem. The resource caps
below keep the oracle within one machine's budget; --only re-runs a
named subset (e.g. the queries past a crash) without repeating the
hours-long full suite.
"""
import json
import math
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def main(sf_dir, out_dir, only=None):
    con = duckdb.connect()
    # bounded resources: spill to a dedicated temp dir instead of OOM,
    # and never fill the cwd filesystem silently (see module docstring)
    con.execute("SET temp_directory='/tmp/graft_duck_tmp'")
    # default 48GB leaves room for a concurrent Spark JVM; override via
    # GRAFT_DUCK_MEM when DuckDB runs alone and a spill-heavy oracle
    # (dedup_incremental at sf10) would otherwise exhaust the disk
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCK_MEM', '48GB')}'")
    con.execute("SET threads=16")
    # Do NOT set preserve_insertion_order=false here: DuckDB 1.0's docs
    # say it only affects queries without an ORDER BY, but in practice
    # (witnessed on stream_ingest_dedup at sf1) it can scramble the
    # output of a query WITH a final ORDER BY — wrapping the set-op in
    # an ordered subquery doesn't help. This compare is ordered, so the
    # memory saving isn't worth nondeterministic false FAILs.
    for t in TABLES:
        # driver fixtures are single files; synthesized SFs (SynthScale)
        # are Spark-written DIRECTORIES of part files — glob those
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            # driver fixtures store ts as TIMESTAMP(NANOS); SynthScale
            # (Spark) re-writes it as raw INT64 nanos. Expose the same
            # µs-truncated timestamp Spark's reader produces.
            row = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1").fetchone()
            if row is not None and row[0] == "BIGINT":
                # DuckDB's `//` on BIGINT truncates toward zero
                # (verified: (-7)::BIGINT // 2 = -3, not floor's -4),
                # exactly matching Spark's `ts div 1000` — including
                # for hypothetical pre-epoch (negative) nanos. Integer
                # arithmetic throughout; no double rounding.
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(
            f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    n_pass = n_fail = 0
    for name in sorted(oracles):
        if only is not None and name not in only:
            continue
        sql = oracles[name]
        spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"FAIL {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            spark_tbl = pq.read_table(spark_dir)
        except Exception as e:
            print(f"FAIL {name}: cannot read spark parquet: {e}")
            n_fail += 1
            continue
        try:
            duck = con.sql(sql)
            duck_cols = list(duck.columns)
            duck_types = [str(t) for t in duck.types]
            duck_rows = duck.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            n_fail += 1
            continue

        # HUGEINT guard (round-11 VERDICT): DuckDB SUM(BIGINT) widens to
        # int128, which the DRIVER's hasher serializes differently from
        # Spark's int64 even when every value is equal — so a HUGEINT
        # output column is hash-red upstream despite passing the value
        # compare below. Fail loudly here so the class can't recur:
        # cast the aggregate ::BIGINT in the oracle SQL.
        huge = [f"{c}:{t}" for c, t in zip(duck_cols, duck_types)
                if "HUGEINT" in t.upper()]
        if huge:
            print(f"FAIL {name}: oracle emits HUGEINT column(s) {huge} — "
                  f"add ::BIGINT casts (driver hash gate would be red)")
            n_fail += 1
            continue

        s_cols = sorted(spark_tbl.column_names)
        d_cols = sorted(duck_cols)
        if s_cols != d_cols:
            print(f"FAIL {name}: columns differ spark={s_cols} duck={d_cols}")
            n_fail += 1
            continue

        s_rows = [tuple(canon(spark_tbl.column(c)[i].as_py()) for c in s_cols)
                  for i in range(spark_tbl.num_rows)]
        didx = [duck_cols.index(c) for c in d_cols]
        d_rows = [tuple(canon(r[j]) for j in didx) for r in duck_rows]

        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: row count spark={len(s_rows)} duck={len(d_rows)}")
            n_fail += 1
            continue

        # order-sensitive compare (queries are required to ORDER BY);
        # also report whether a sorted compare would pass.
        mismatches = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
        if not mismatches:
            print(f"PASS {name} ({len(s_rows)} rows)")
            n_pass += 1
        else:
            sorted_ok = sorted(map(repr, s_rows)) == sorted(map(repr, d_rows))
            print(f"FAIL {name}: {len(mismatches)}/{len(s_rows)} rows differ "
                  f"(sorted-compare {'PASSES' if sorted_ok else 'fails'})")
            for i, a, b in mismatches[:5]:
                print(f"  row {i}:\n    spark={a}\n    duck ={b}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    only = None
    if "--only" in sys.argv:
        i = sys.argv.index("--only")
        only = set(sys.argv[i + 1].split(","))
        del sys.argv[i:i + 2]
    sys.exit(main(sys.argv[1], sys.argv[2], only))
