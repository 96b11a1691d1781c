#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
sfDir parquet tables, sorts columns by name, sorts rows, compares values.
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64 (nullable), floats -> float64
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def compare(name, got: pd.DataFrame, exp: pd.DataFrame):
    if sorted(got.columns) != sorted(exp.columns):
        return f"SCHEMA cols spark={sorted(got.columns)} oracle={sorted(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS spark={len(got)} oracle={len(exp)}"
    g, e = canon(got), canon(exp)
    for c in g.columns:
        gc, ec = g[c], e[c]
        if pd.api.types.is_float_dtype(gc):
            ok = np.isclose(gc.fillna(1e308), ec.fillna(1e308), rtol=1e-9, atol=1e-9, equal_nan=True)
        else:
            ok = (gc.fillna("\0NULL") == ec.fillna("\0NULL")) if gc.dtype == object else (
                gc.astype(object).where(gc.notna(), None) == ec.astype(object).where(ec.notna(), None)) | (gc.isna() & ec.isna())
        if not np.all(ok):
            bad = np.where(~np.asarray(ok))[0][:3]
            detail = "; ".join(f"row{i}: spark={g[c].iloc[i]!r} oracle={e[c].iloc[i]!r}" for i in bad)
            return f"VALUES col {c}: {detail}"
        # strict-equality check too (driver hashes exact values)
        if pd.api.types.is_float_dtype(gc):
            exact = (gc.fillna(1e308) == ec.fillna(1e308))
            if not np.all(exact):
                bad = np.where(~np.asarray(exact))[0][:3]
                detail = "; ".join(f"row{i}: spark={g[c].iloc[i]!r} oracle={e[c].iloc[i]!r}" for i in bad)
                return f"FLOAT-ULP col {c} (close but not bit-equal): {detail}"
    return None

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    errs_path = f"{out_dir}/_verify_errors.json"
    dump_failed = {}
    if os.path.exists(errs_path):
        dump_failed = json.load(open(errs_path))
        for name, msg in dump_failed.items():
            print(f"FAIL {name}: verify dump threw: {msg[:200]}")
            n_fail += 1
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in dump_failed:
            continue  # already FAILed above; a stale dir must not print PASS
        got = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))],
                        ignore_index=True) if glob.glob(f"{d}/*.parquet") else None
        if got is None:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle ({len(got)} rows)"); continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle error {ex}"); n_fail += 1; continue
        err = compare(name, got, exp)
        if err: print(f"FAIL {name}: {err}"); n_fail += 1
        else: print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
