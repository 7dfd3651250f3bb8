#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL on the same parquet tables and compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(Driver-side python: duckdb + pyarrow are available here, not in the engine.)
"""
import json
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.6f}"
    if v is None:
        return "NULL"
    return str(v)


def canon(rows, cols):
    """Sort columns by name, then rows; stringify cells (driver-style)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"MISSING  {name} (no spark output)")
            n_fail += 1
            continue
        spark_rel = con.execute(
            f"SELECT * FROM read_parquet('{qdir}/*.parquet')")
        spark_cols = [d[0] for d in spark_rel.description]
        spark_rows = spark_rel.fetchall()
        try:
            o_rel = con.execute(oracle[name])
            o_cols = [d[0] for d in o_rel.description]
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        sc, sr = canon(spark_rows, spark_cols)
        oc, orows = canon(o_rows, o_cols)
        if sc != oc:
            print(f"SCHEMA   {name}: spark={sc} oracle={oc}")
            n_fail += 1
        elif sr != orows:
            n_fail += 1
            print(f"ROWS     {name}: spark={len(sr)} oracle={len(orows)}")
            diffs = [(a, b) for a, b in zip(sr, orows) if a != b]
            for a, b in diffs[:3]:
                print(f"         spark : {a}\n         oracle: {b}")
        else:
            n_pass += 1
            print(f"OK       {name} ({len(sr)} rows)")
    # rows-only queries (no oracle): check non-empty output exists
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{qdir}/*.parquet')").fetchone()[0]
            print(f"ROWSONLY {qdir.name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
