#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet (written by graft.Verify), runs the
matching SQL from oracle_sql.json in DuckDB over the sfDir tables, and
compares row count, column names, and values (rows sorted by all columns).
"""
import sys, os, json, math
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return (0, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (1, "nan")
        return (1, repr(v))
    try:
        import decimal
        if isinstance(v, decimal.Decimal):
            return (1, repr(float(v)))
    except Exception:
        pass
    if isinstance(v, (list, tuple)):
        return (3, tuple(canon(x) for x in v))
    return (2, str(v))


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
        got = con.execute(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')"
        ).fetchall()
        got_cols = [d[0] for d in con.description]
        if name not in oracle:
            print(f"  ~ {name}: no oracle (rows-only) rows={len(got)}")
            continue
        try:
            exp = con.execute(oracle[name]).fetchall()
            exp_cols = [d[0] for d in con.description]
        except Exception as e:
            print(f"  ✗ {name}: ORACLE SQL ERROR: {e}")
            n_fail += 1
            continue
        # driver sorts columns by name before hashing values
        gi = sorted(range(len(got_cols)), key=lambda i: got_cols[i])
        ei = sorted(range(len(exp_cols)), key=lambda i: exp_cols[i])
        ok = True
        if sorted(got_cols) != sorted(exp_cols):
            print(f"  ✗ {name}: COLUMNS got={sorted(got_cols)} exp={sorted(exp_cols)}")
            ok = False
        elif len(got) != len(exp):
            print(f"  ✗ {name}: ROWS got={len(got)} exp={len(exp)}")
            ok = False
        else:
            g = sorted(tuple(canon(r[i]) for i in gi) for r in got)
            e = sorted(tuple(canon(r[i]) for i in ei) for r in exp)
            if g != e:
                bad = [(a, b) for a, b in zip(g, e) if a != b][:3]
                print(f"  ✗ {name}: VALUES differ, first diffs: {bad}")
                ok = False
        if ok:
            print(f"  ✓ {name} rows={len(got)}")
            n_pass += 1
        else:
            n_fail += 1
    missing = [k for k in oracle if k not in results_dirs]
    for k in missing:
        print(f"  ✗ {k}: oracle declared but no result parquet")
        n_fail += 1
    print(f"PASS {n_pass} FAIL {n_fail}")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
