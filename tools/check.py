#!/usr/bin/env python3
"""Dev-loop replica of the driver's correctness gate.

Usage: python3 tools/check.py <outDir> [sfDir]

Assumes `graft.Verify` already wrote <outDir>/<name>/ parquet dirs and
<outDir>/oracle_sql.json. Registers each testdata table as a DuckDB view,
runs every oracle SQL, and compares against the Spark parquet output:
row count, sorted column names, and exact sorted-values hash (floats
compared exactly first, then with 1e-9 rel tolerance fallback reported).
"""
import sys, os, json, glob
import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def main():
    out = sys.argv[1]
    sf = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(os.path.join(out, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        res_dir = os.path.join(out, name)
        files = glob.glob(os.path.join(res_dir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output");  n_fail += 1; continue
        try:
            got = con.sql(f"SELECT * FROM read_parquet({files!r})").fetchdf()
            want = con.sql(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        gc, wc = sorted(got.columns), sorted(want.columns)
        if gc != wc:
            print(f"FAIL {name}: columns {gc} != {wc}"); n_fail += 1; continue
        got, want = got[gc], want[wc]
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        g = got.sort_values(by=gc, ignore_index=True)
        w = want.sort_values(by=wc, ignore_index=True)
        # Dtype guard: the driver's gate hashes exact value reprs, so int64
        # vs float64 (DuckDB HUGEINT sums → pandas float64) fails there even
        # when values compare equal (123 vs 123.0). Width differences within
        # a kind (int32 vs int64) repr identically and are fine — compare
        # dtype KIND ('i'nt vs 'f'loat vs 'O'bject …), not exact dtype.
        dtype_bad = [f"{c}: spark={g[c].dtype} oracle={w[c].dtype}"
                     for c in gc if g[c].dtype.kind != w[c].dtype.kind]
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch (driver hash would MISS): "
                  + "; ".join(dtype_bad)); n_fail += 1; continue
        mismatch, tol_only = [], []
        for c in gc:
            a, b = g[c], w[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
                # BIT-exact guard for floats: the driver hashes value reprs,
                # so -0.0 vs 0.0 (numerically ==) still fails there. Compare
                # the sign bit too (r07's q303 lesson).
                import pandas.api.types as _pt
                if _pt.is_float_dtype(a) and _pt.is_float_dtype(b):
                    import numpy as _np
                    eq = eq & (_np.signbit(a.to_numpy()) == _np.signbit(b.to_numpy()))
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                # float columns get a 1e-9 relative-tolerance fallback,
                # reported as WARN (the driver's gate is exact — a WARN
                # here still means the round hash will MISS)
                import pandas.api.types as ptypes
                if ptypes.is_float_dtype(a) and ptypes.is_float_dtype(b):
                    close = ((a - b).abs() <= 1e-9 * b.abs().clip(lower=1)) | (a.isna() & b.isna())
                    if close.all():
                        i = (~eq).idxmax()
                        tol_only.append(f"{c}[row{i}]: {a[i]!r} ~ {b[i]!r}")
                        continue
                i = (~eq).idxmax()
                mismatch.append(f"{c}[row{i}]: {a[i]!r} != {b[i]!r}")
        if mismatch:
            print(f"FAIL {name}: " + "; ".join(mismatch[:3])); n_fail += 1
        elif tol_only:
            print(f"WARN {name}: exact-miss within 1e-9 rel tol (driver gate would FAIL): "
                  + "; ".join(tol_only[:3])); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
