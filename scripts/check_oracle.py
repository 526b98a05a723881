#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: load each Verify output
parquet, run the matching oracle SQL in DuckDB over the same sfDir tables,
and compare (columns sorted by name, row-by-row values).

Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    return v


def compare(name, got, exp):
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA col names: got {list(got.columns)} exp {list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS: got {len(got)} exp {len(exp)}"
    for col in got.columns:
        g, e = got[col].tolist(), exp[col].tolist()
        for i, (a, b) in enumerate(zip(g, e)):
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                # 9-place ABSOLUTE tolerance consistent with norm();
                # rel_tol must stay 0 or large aggregates (revenue ~1e7)
                # would absorb genuine cent-level mismatches.
                if math.isclose(a, b, rel_tol=0.0, abs_tol=1e-9) or round(a, 9) == round(b, 9):
                    continue
                return f"VALUE {col}[{i}]: got {a!r} exp {b!r} (diff {a-b:.3e})"
            if norm(a) != norm(b):
                return f"VALUE {col}[{i}]: got {a!r} exp {b!r}"
    return None


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_ok = n_fail = 0
    for name in sorted(oracle):
        res_dir = Path(out_dir) / name
        if not res_dir.exists():
            print(f"MISSING {name}")
            n_fail += 1
            continue
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as ex:
            print(f"ORACLE-ERR {name}: {ex}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)]
        exp = exp[sorted(exp.columns)]
        err = compare(name, got, exp)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
