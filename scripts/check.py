#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares the two the way the DRIVER does: `fetchdf()` into pandas, columns
sorted by name, rows sorted by all columns, then a pandas value hash.

This intentionally inherits the driver's sharp edges so they fail HERE
first:
  * ARRAY/MAP/STRUCT output columns make `sort_values` /
    `hash_pandas_object` raise ("unhashable type: numpy.ndarray") → the
    query is reported as an ERROR, exactly like the driver's `err` field.
  * DuckDB HUGEINT (bare `sum()` over ints) coerces to float64 in pandas
    and hash-mismatches Spark's int64 even when the integer values agree.
"""
import sys, os, json
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon_frame(df):
    """Driver semantics: columns sorted by name, rows sorted by all
    columns. Raises on unhashable (array-typed) values, like the driver."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def frame_hash(df):
    if len(df) == 0:
        return 0
    # hash_pandas_object is dtype-sensitive: int64 176 != float64 176.0,
    # matching the driver's behavior on HUGEINT→float64 coercions.
    return int(pd.util.hash_pandas_object(df, index=False).sum())


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)

    n_pass = n_fail = 0
    results_dirs = sorted(d for d in os.listdir(out_dir)
                          if os.path.isdir(os.path.join(out_dir, d)))
    for name in results_dirs:
        if name not in oracle:
            n_rows = con.execute(
                f"SELECT count(*) FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchone()[0]
            print(f"  ~ {name}: no oracle (rows-only) rows={n_rows}")
            continue
        try:
            got = canon_frame(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
            ).fetchdf())
            exp = canon_frame(con.execute(oracle[name]).fetchdf())
            rows_ok = len(got) == len(exp)
            schema_ok = list(got.columns) == list(exp.columns)
            hash_ok = schema_ok and rows_ok and frame_hash(got) == frame_hash(exp)
        except Exception as e:
            print(f"  ✗ {name}: ERROR: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if rows_ok and schema_ok and hash_ok:
            print(f"  ✓ {name} rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
            if not schema_ok:
                print(f"  ✗ {name}: COLUMNS got={list(got.columns)} exp={list(exp.columns)}")
            elif not rows_ok:
                print(f"  ✗ {name}: ROWS got={len(got)} exp={len(exp)}")
            else:
                # surface the first differing cells (incl. dtype) for debugging
                diffs = []
                for c in got.columns:
                    if len(diffs) >= 3:
                        break
                    ga, ea = got[c], exp[c]
                    if ga.dtype != ea.dtype:
                        diffs.append(f"{c}: dtype {ga.dtype} vs {ea.dtype}")
                        continue
                    neq = ga.astype(str) != ea.astype(str)
                    if neq.any():
                        i = int(neq.idxmax())
                        diffs.append(f"{c}[{i}]: {ga[i]!r} vs {ea[i]!r}")
                print(f"  ✗ {name}: HASH differs ({'; '.join(diffs) or 'values'})")
    missing = [k for k in oracle if k not in results_dirs]
    for k in missing:
        print(f"  ✗ {k}: oracle declared but no result parquet")
        n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
