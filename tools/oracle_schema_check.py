#!/usr/bin/env python3
"""Oracle OUTPUT-schema guard, callable from the ScalaTest suite.

DuckDB's SUM(BIGINT) widens to HUGEINT (int128), which the driver's
hasher serializes differently from Spark's int64 even when every value
is equal — a HUGEINT output column is hash-red at the driver despite a
value-equal result (this cost round 11 six red queries). The guard in
tools/local_check.py:108 only runs when someone runs that tool; this
script is the same check shaped for `sbt test` (OracleSchemaSpec shells
out to it), making the gate mandatory.

Usage: python3 tools/oracle_schema_check.py <sf_dir> <oracle_sql.json>

Prints one `HUGEINT <name> <col>:<type>` line per offending output
column (DESCRIBE only — nothing is executed, so the check is O(plan)
regardless of fixture size; intermediate HUGEINT arithmetic like
stat_gini's is correctly NOT flagged). Exits 0 with no output when
every registered oracle's final projection is HUGEINT-free.
"""
import json
import os
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir, oracle_json):
    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        sel = "*"
        if t == "events":
            row = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{path}') LIMIT 1").fetchone()
            if row is not None and row[0] == "BIGINT":
                sel = "* REPLACE (make_timestamp(ts // 1000) AS ts)"
        con.execute(
            f"CREATE VIEW {t} AS SELECT {sel} FROM read_parquet('{path}')")
    with open(oracle_json) as f:
        oracles = json.load(f)
    bad = 0
    for name in sorted(oracles):
        try:
            desc = con.sql(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as e:
            print(f"DESCRIBE-ERROR {name}: {e}")
            bad += 1
            continue
        for col, typ, *_ in desc:
            if "HUGEINT" in str(typ).upper():
                print(f"HUGEINT {name} {col}:{typ}")
                bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
