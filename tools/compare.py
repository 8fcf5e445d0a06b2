#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle against DuckDB views over <sfDir>/*.parquet, loads the matching
Spark result parquet, and compares THROUGH PANDAS, the way the driver
does: columns sorted by name, rows sorted by all columns via
DataFrame.sort_values, values canonicalized from the pandas dtypes.

Canonicalizing through pandas is the point (round-3 lesson): DuckDB
sum(BIGINT) returns HUGEINT, which pandas coerces to float64, while the
Spark parquet holds int64 — a repr() on raw fetchall() rows hides that
(both sides are Python ints), so the old version of this tool passed
queries the driver failed. Same for array columns: pandas sort_values
raises "unhashable type: numpy.ndarray", exactly like the driver.
Dev tooling only — not part of the library.
"""
import json
import math
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon_df(df):
    """Sorted-column, sorted-row list of canonical value tuples."""
    cols = sorted(df.columns)
    df = df[cols].sort_values(by=cols).reset_index(drop=True)
    out = []
    for row in df.itertuples(index=False, name=None):
        canon_row = []
        for v in row:
            # numpy scalars → Python scalars so repr is dtype-faithful
            # but numpy-version-independent (np.int64(5) vs 5).
            if hasattr(v, "item"):
                v = v.item()
            if isinstance(v, float):
                canon_row.append("NaN" if math.isnan(v) else repr(v))
            else:
                canon_row.append(repr(v))
        out.append(tuple(canon_row))
    return cols, out


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
            odf = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_bad += 1
            continue
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark read error: {e}")
            n_bad += 1
            continue
        if sorted(odf.columns) != sorted(sdf.columns):
            print(f"FAIL {name}: columns spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            n_bad += 1
            continue
        try:
            _, o_sorted = canon_df(odf)
            _, s_sorted = canon_df(sdf)
        except Exception as e:
            # the driver dies the same way on unsortable (array) columns
            print(f"FAIL {name}: pandas canonicalization error: {e}")
            n_bad += 1
            continue
        if len(o_sorted) != len(s_sorted):
            print(f"FAIL {name}: rows spark={len(s_sorted)} "
                  f"oracle={len(o_sorted)}")
            n_bad += 1
            continue
        diffs = [(a, b) for a, b in zip(s_sorted, o_sorted) if a != b]
        if diffs:
            print(f"FAIL {name}: {len(diffs)}/{len(s_sorted)} rows differ; "
                  f"first: spark={diffs[0][0]} oracle={diffs[0][1]}")
            n_bad += 1
        else:
            print(f"OK   {name}: {len(s_sorted)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} failed")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()


