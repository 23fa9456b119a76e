#!/usr/bin/env python3
"""Dev-loop oracle compare (mimics the driver's t2 gate).

Reads each Verify output parquet under OUT_DIR, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the testdata parquet
tables, sorts columns by name, and compares row-by-row values.

Usage: compare_oracle.py OUT_DIR SF_DIR
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    # array-valued columns (numpy arrays / lists) → tuples for ==
    if hasattr(v, "tolist") and not hasattr(v, "upper"):
        return tuple(norm(x) for x in v.tolist())
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v


def main(out_dir, sf_dir):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        # fresh connection per query with bounded threads: one
        # long-lived 32-thread connection develops allocator
        # fragmentation after ~100 heavy queries on this box and
        # starts failing tiny allocations ("bad allocation") on
        # queries that pass in isolation
        con = None
        try:
            con = duckdb.connect()
            con.execute("SET threads=8")
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf_dir}/{t}.parquet'")
            got = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
            exp = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_bad += 1
            continue
        finally:
            if con is not None:
                con.close()
        got = got.reindex(sorted(got.columns), axis=1)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != "
                  f"{list(exp.columns)}")
            n_bad += 1
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
            n_bad += 1
            continue
        bad = None
        for c in got.columns:
            gv = [norm(x) for x in got[c].tolist()]
            ev = [norm(x) for x in exp[c].tolist()]
            for i, (g, e) in enumerate(zip(gv, ev)):
                eq = (g == e) or (g is None and e is None) or \
                    (isinstance(g, float) and isinstance(e, float)
                     and g == e)
                # pandas NaT/None mixups
                if not eq and str(g) == str(e):
                    eq = True
                if not eq:
                    bad = (c, i, g, e)
                    break
            if bad:
                break
        if bad:
            c, i, g, e = bad
            print(f"FAIL {name}: col {c} row {i}: got {g!r} exp {e!r}")
            n_bad += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
