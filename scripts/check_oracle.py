#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against DuckDB oracle SQL on the same parquet tables and compare.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
(Driver-side python: duckdb + pyarrow + pandas are available here, not in
the engine.)

FAITHFUL TO THE DRIVER (round-12 alignment): the compare is pandas-based
with NO normalization the driver doesn't do —
  * rows sort via DataFrame.sort_values over ALL columns: a non-scalar
    (array) output column raises "unhashable type: numpy.ndarray" and the
    query records an err (exactly the driver's r11 failure mode for
    d_tokenize_ids/d_pack_payloads/d_fim_splits);
  * no numeric coercion: DuckDB HUGEINT lands as float64 and a Spark
    int64 column hashes differently (the driver's r11 d_vocab_drift red);
    cells stringify with plain str(), so 27165 != 27165.0.
Repo rule enforced downstream: no query lands with a non-scalar output
column (enforced by the PlanAudit schema sweep, examples/PlanAudit.scala).
"""
import hashlib
import json
import sys
import traceback
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    """Driver-style canonicalization: sort columns by name, then rows by
    all columns. Raises on unsortable (array) cells — by design."""
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def df_hash(df):
    h = hashlib.sha256()
    for row in df.itertuples(index=False, name=None):
        for v in row:
            if v is None or v != v:  # None or NaN
                h.update(b"\x00NULL")
            else:
                h.update(str(v).encode())
            h.update(b"\x01")
        h.update(b"\x02")
    return h.hexdigest()


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
        try:
            sdf = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
            odf = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"SCHEMA   {name}: spark={sorted(sdf.columns)} "
                  f"oracle={sorted(odf.columns)}")
            n_fail += 1
            continue
        try:
            sc, oc = canon(sdf), canon(odf)
        except Exception:
            # the driver records this as err with no correctness signal —
            # a red row. Usually an array-typed output column.
            tb = traceback.format_exc().strip().splitlines()[-1]
            print(f"ERR      {name}: compare crashed (driver-red): {tb}")
            n_fail += 1
            continue
        if len(sc) != len(oc):
            print(f"ROWS     {name}: spark={len(sc)} oracle={len(oc)}")
            n_fail += 1
        elif df_hash(sc) != df_hash(oc):
            n_fail += 1
            print(f"HASH     {name}: {len(sc)} rows; dtypes "
                  f"spark={list(sc.dtypes.astype(str))} "
                  f"oracle={list(oc.dtypes.astype(str))}")
            diffs = 0
            for i in range(len(sc)):
                a = tuple(str(v) for v in sc.iloc[i])
                b = tuple(str(v) for v in oc.iloc[i])
                if a != b:
                    print(f"         row {i} spark : {a}\n"
                          f"         row {i} oracle: {b}")
                    diffs += 1
                    if diffs >= 3:
                        break
        else:
            n_pass += 1
            print(f"OK       {name} ({len(sc)} rows)")
    # rows-only queries (no oracle): check non-empty output exists
    for qdir in sorted(Path(out_dir).iterdir()):
        if qdir.is_dir() and qdir.name not in oracle:
            n = con.execute(
                f"SELECT COUNT(*) FROM read_parquet('{qdir}/*.parquet')"
            ).fetchone()[0]
            print(f"ROWSONLY {qdir.name}: {n} rows")
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
