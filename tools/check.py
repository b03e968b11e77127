#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py [sfdir] [outdir] [--skip-verify]

1. sbt runMain graft.Verify <sfdir> <outdir>   (unless --skip-verify)
2. for each query: load <outdir>/<name> parquet, run the oracle SQL from
   oracle_sql.json in DuckDB over views named after the testdata tables,
   sort columns by name + rows, compare cell-by-cell.
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if pd.isna(a) and pd.isna(b):
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sfdir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    outdir = Path(args[1] if len(args) > 1 else "/tmp/verify_out")
    only = args[2].split(",") if len(args) > 2 else None
    if "--skip-verify" not in sys.argv:
        r = subprocess.run(
            ["sbt", "-batch", f'runMain graft.Verify {sfdir} {outdir}'],
            capture_output=True, text=True, cwd="/root/repo")
        if r.returncode != 0:
            print(r.stdout[-4000:], r.stderr[-4000:])
            sys.exit(1)
        for line in r.stdout.splitlines():
            if "[verify]" in line:
                print(line)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.loads((outdir / "oracle_sql.json").read_text())

    n_pass = n_fail = 0
    for d in sorted(outdir.iterdir()):
        if not d.is_dir():
            continue
        name = d.name
        if only and name not in only:
            continue
        got = norm(pd.read_parquet(d))
        if name not in oracle:
            print(f"  {name}: NO-ORACLE rows={len(got)} (rows-only check: {'ok' if len(got) > 0 else 'EMPTY!'})")
            continue
        try:
            exp = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"  {name}: ORACLE-SQL-ERROR {e}")
            n_fail += 1
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"  {name}: SCHEMA-MISMATCH spark={sorted(got.columns)} duckdb={sorted(exp.columns)}")
            n_fail += 1
            continue
        if len(got) != len(exp):
            print(f"  {name}: ROWCOUNT-MISMATCH spark={len(got)} duckdb={len(exp)}")
            n_fail += 1
            continue
        bad = None
        for i in range(len(got)):
            for c in got.columns:
                if not cells_equal(got.at[i, c], exp.at[i, c]):
                    bad = (i, c, got.at[i, c], exp.at[i, c])
                    break
            if bad:
                break
        if bad:
            print(f"  {name}: VALUE-MISMATCH row={bad[0]} col={bad[1]} spark={bad[2]!r} duckdb={bad[3]!r}")
            n_fail += 1
            continue
        # Calibrated against the round-1 driver verdict: int-vs-float splits
        # (DuckDB HUGEINT sums -> pandas float64 vs Spark int64) hash-FAILED
        # there, while int-width splits (Spark int32 vs DuckDB int64, e.g.
        # q10's rn / q14's norm_len) hash-PASSED. So int-vs-float fails here
        # and width-only splits get an informational note.
        dt_bad = []
        for c in got.columns:
            g, e = str(got[c].dtype), str(exp[c].dtype)
            if g != e:
                g_int, e_int = g.startswith("int") or g.startswith("uint"), e.startswith("int") or e.startswith("uint")
                g_f, e_f = g.startswith("float"), e.startswith("float")
                if (g_int and e_f) or (g_f and e_int):
                    dt_bad.append((c, g, e))
                else:
                    print(f"  {name}: dtype-note col={c} spark={g} duckdb={e}")
        if dt_bad:
            print(f"  {name}: DTYPE-MISMATCH (driver hash would fail) {dt_bad}")
            n_fail += 1
        else:
            print(f"  {name}: PASS ({len(got)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
