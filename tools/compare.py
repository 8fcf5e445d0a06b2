#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against DuckDB views over <sfDir>/*.parquet, loads the matching
Spark result parquet, sorts columns by name and rows by all columns, and
reports value equality per query. Dev tooling only — not part of the
library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows):
    out = []
    for row in rows:
        canon_row = []
        for v in row:
            if isinstance(v, float):
                if math.isnan(v):
                    canon_row.append("NaN")
                else:
                    canon_row.append(repr(v))
            else:
                canon_row.append(repr(v))
        out.append(tuple(canon_row))
    out.sort()
    return out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracles = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_bad = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = Path(out_dir) / name
        if not spark_dir.exists():
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        try:
            oracle = con.execute(sql)
            ocols = [d[0] for d in oracle.description]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        sres = con.execute(
            f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols = [d[0] for d in sres.description]
        srows = sres.fetchall()
        if sorted(ocols) != sorted(scols):
            print(f"FAIL {name}: columns spark={sorted(scols)} oracle={sorted(ocols)}")
            n_bad += 1
            continue
        o_idx = sorted(range(len(ocols)), key=lambda i: ocols[i])
        s_idx = sorted(range(len(scols)), key=lambda i: scols[i])
        o_sorted = canon([[r[i] for i in o_idx] for r in orows])
        s_sorted = canon([[r[i] for i in s_idx] for r in srows])
        if len(o_sorted) != len(s_sorted):
            print(f"FAIL {name}: rows spark={len(s_sorted)} oracle={len(o_sorted)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(s_sorted)} rows differ; first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(s_sorted)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
