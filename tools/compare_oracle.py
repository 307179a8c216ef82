#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: python3 tools/compare_oracle.py <sfDir> <verifyOutDir>

For each query result parquet under <verifyOutDir>/<name>/, runs the
matching oracle SQL from <verifyOutDir>/oracle_sql.json in DuckDB with the
sf tables registered as views, sorts columns by name, and compares values.
"""
import sys, os, json, glob
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        # unify ints
        if str(df[c].dtype) in ("int32", "int16", "int8", "uint32"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
        if str(df[c].dtype) == "object":
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            results[name] = "NO_OUTPUT"
            continue
        got = pd.read_parquet(files[0])
        if name not in oracles:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            if len(got) == 0:
                results[name] = "ROWS_ONLY_EMPTY!"
            continue
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"
            continue
        g, e = normalize(got), normalize(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
            continue
        if len(g) != len(e):
            results[name] = f"ROWCOUNT got={len(g)} exp={len(e)}"
            continue
        bad = []
        for c in g.columns:
            gs, es = g[c], e[c]
            if str(gs.dtype) != str(es.dtype):
                bad.append(f"{c}: dtype {gs.dtype} vs {es.dtype}")
                continue
            if str(gs.dtype) == "float64":
                import numpy as np
                neq = ~((gs.isna() & es.isna()) | (gs == es))
                if neq.any():
                    i = neq.idxmax()
                    bad.append(f"{c}: value row{i} {gs[i]!r} vs {es[i]!r}")
            else:
                neq = ~((gs.isna() & es.isna()) | (gs == es))
                try:
                    if neq.any():
                        i = neq.idxmax()
                        bad.append(f"{c}: value row{i} {gs[i]!r} vs {es[i]!r}")
                except Exception as ex:
                    bad.append(f"{c}: compare error {ex}")
        results[name] = "OK" if not bad else "MISMATCH " + "; ".join(bad[:3])

    for name in names:
        print(f"{results[name]:<60} {name}")
    n_ok = sum(1 for v in results.values()
               if v == "OK" or v.startswith("ROWS_ONLY rows"))
    print(f"\n{n_ok}/{len(results)} pass")
    missing = set(oracles) - set(names)
    if missing:
        print("oracles without output:", sorted(missing))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
