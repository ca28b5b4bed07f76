#!/usr/bin/env python3
"""Dev-only driver simulator: compare graft.Verify parquet dumps against
DuckDB running SparkEntry.oracleSql on the same fixture tables.

Mirrors the driver's t2 gate (sort columns by name, exact value compare).
Usage: python3 tools/check_oracle.py [sfdir] [outdir]
"""
import json, math, sys
from pathlib import Path

import duckdb
import pyarrow.parquet as pq

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # The driver hashes cell values via pandas sort_values + hash: any
    # list/array cell crashes it (TypeError: unhashable numpy.ndarray).
    # REJECT instead of canonicalizing, so an array-typed output column
    # can never pass locally and then fail the driver (q161, round 12).
    if isinstance(v, (list, tuple, dict)):
        raise TypeError(
            f"non-scalar cell {type(v).__name__}: driver harness cannot hash "
            "array/map outputs — emit array_join'd strings (q35 protocol)")
    return v

n_pass = n_fail = 0
for name in sorted(oracle):
    qdir = OUT / name
    if not qdir.exists():
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        spark_tbl = pq.read_table(qdir)
        duck_tbl = con.execute(oracle[name]).fetch_arrow_table()
    except Exception as ex:
        print(f"FAIL {name}: {ex}"); n_fail += 1; continue
    s_cols, d_cols = sorted(spark_tbl.column_names), sorted(duck_tbl.column_names)
    if s_cols != d_cols:
        print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}"); n_fail += 1; continue
    try:
        s_rows = [tuple(canon(r[c]) for c in s_cols) for r in spark_tbl.to_pylist()]
        d_rows = [tuple(canon(r[c]) for c in d_cols) for r in duck_tbl.to_pylist()]
    except TypeError as ex:
        print(f"FAIL {name}: {ex}"); n_fail += 1; continue
    if len(s_rows) != len(d_rows):
        print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}"); n_fail += 1; continue
    bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b]
    if bad:
        i, a, b = bad[0]
        print(f"FAIL {name}: {len(bad)}/{len(s_rows)} rows differ; first at {i}:\n  spark={a}\n  duck ={b}")
        n_fail += 1
        continue
    # schema types (informational — flag suspicious width mismatches)
    s_types = {c: str(spark_tbl.schema.field(c).type) for c in s_cols}
    d_types = {c: str(duck_tbl.schema.field(c).type) for c in d_cols}
    tdiff = {c: (s_types[c], d_types[c]) for c in s_cols if s_types[c] != d_types[c]}
    note = f"  [type diff: {tdiff}]" if tdiff else ""
    print(f"PASS {name} ({len(s_rows)} rows){note}")
    n_pass += 1

print(f"\n{n_pass} passed, {n_fail} failed, "
      f"{len([d for d in OUT.iterdir() if d.is_dir()]) - len(oracle)} rows-only")
sys.exit(1 if n_fail else 0)
