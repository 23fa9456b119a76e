#!/usr/bin/env python3
"""Dev-loop oracle compare (mimics the driver's t2 gate).

Reads each Verify output parquet under OUT_DIR, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the testdata parquet
tables, sorts columns by name, and compares row-by-row values.

Usage: compare_oracle.py OUT_DIR SF_DIR [QUERY_NAME ...]

With QUERY_NAME args, only those queries are compared (dev loop).

DuckDB in this container sporadically throws "bad allocation" /
"Out of Memory Error: Failed to allocate block of N bytes" on tiny
allocations with >100 GB free — allocator state poisoned process-wide
(a fresh connection in the same process still fails; the same query in
a fresh process passes). Transient failures are therefore retried in a
fresh SUBPROCESS, which clears them reliably.
"""
import decimal, json, math, multiprocessing, os, subprocess, sys
# PRELOAD the multiprocessing C extensions at module import, while the
# process map table is still small: after ~200 DuckDB connection
# cycles the process nears vm.max_map_count and any LAZY dlopen
# (importing _multiprocessing inside the retry path) dies with
# "failed to map segment" — preloading makes the retry machinery
# immune to late-run map exhaustion.
import multiprocessing.queues  # noqa: F401  (forces _multiprocessing)
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

SUBPROCESS_RETRIES = 2


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


def compare_one(out_dir, sf_dir, name, sql):
    """Run got-vs-oracle for one query; returns a one-line verdict.

    Raises on DuckDB execution errors (caller decides about retries).
    """
    # fresh connection per query with bounded threads: one long-lived
    # 32-thread connection develops allocator fragmentation after
    # ~100 heavy queries on this box and starts failing tiny
    # allocations on queries that pass in isolation
    con = duckdb.connect()
    try:
        con.execute("SET threads=8")
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{sf_dir}/{t}.parquet'")
        got = con.execute(
            f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
        exp = con.execute(sql).fetchdf()
    finally:
        con.close()
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    if list(got.columns) != list(exp.columns):
        return (f"FAIL {name}: columns {list(got.columns)} != "
                f"{list(exp.columns)}", False)
    if len(got) != len(exp):
        return f"FAIL {name}: rows {len(got)} != {len(exp)}", False
    # STRICT dtype lint (always on): an int-kind column on one side
    # vs a float-kind column on the other fails even when every value
    # compares equal under Python ==. This is the exact class the
    # driver's value hash detects (DuckDB HUGEINT -> fetchdf float64,
    # 5 vs 5.0) and that r10/r11 tooling normalized away. Running the
    # full battery through this compare is the registry-wide lint.
    for c in got.columns:
        gk, ek = got[c].dtype.kind, exp[c].dtype.kind
        if {gk, ek} == {"i", "f"} or {gk, ek} == {"u", "f"}:
            return (f"FAIL {name}: col {c} dtype kind mismatch: "
                    f"spark {got[c].dtype} vs oracle {exp[c].dtype} "
                    f"(un-CAST aggregate in oracle final projection?)",
                    False)
    # BANNED dtype classes (always on): the driver's gate hashes a
    # pandas canonicalization of both frames, and two classes of final
    # column diverge or crash there even when this tool's value compare
    # passes — (a) wide DECIMAL: Spark parquet and DuckDB fetchdf map
    # DECIMAL(38,0) to different pandas dtypes, so the value hash
    # diverges (r14: q_vec_assortativity, q_cdc_checksum_diff); (b)
    # array/list columns: the driver's sort_values lexsort dies on
    # unhashable numpy.ndarray (r14: q_cdc_apply_conflicts). This tool
    # must never be MORE lenient than the gate it rehearses, so both
    # classes fail here loudly; narrow to BIGINT or serialize to a
    # sorted CSV string in BOTH engines instead.
    def banned(v):
        if isinstance(v, decimal.Decimal):
            return "decimal (wide-DECIMAL final column)"
        if isinstance(v, (list, tuple, dict)) or \
                (hasattr(v, "tolist") and not hasattr(v, "upper")
                 and getattr(v, "ndim", 1) != 0):
            return "array/list (unhashable in driver row sort)"
        return None
    for side, df in (("spark", got), ("oracle", exp)):
        for c in df.columns:
            if df[c].dtype.kind != "O":
                continue
            for v in df[c]:
                b = None if v is None else banned(v)
                if b:
                    return (f"FAIL {name}: col {c} ({side}) carries "
                            f"{b}: {type(v).__name__} — driver-gate "
                            f"hazard, narrow/serialize the final "
                            f"projection", False)
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
                return (f"FAIL {name}: col {c} row {i}: "
                        f"got {g!r} exp {e!r}", False)
    return f"ok   {name} ({len(got)} rows)", True


def _child(queue, out_dir, sf_dir, name, sql):
    try:
        queue.put(compare_one(out_dir, sf_dir, name, sql))
    except Exception as e:
        queue.put((f"FAIL {name}: exec error: {e}", False))


def compare_in_subprocess(out_dir, sf_dir, name, sql):
    try:
        ctx = multiprocessing.get_context("spawn")
        queue = ctx.Queue()
        p = ctx.Process(target=_child,
                        args=(queue, out_dir, sf_dir, name, sql))
        p.start()
        try:
            result = queue.get(timeout=300)
        except Exception:
            result = (f"FAIL {name}: subprocess timeout/crash", False)
        p.join(10)
        if p.is_alive():
            p.terminate()
        return result
    except Exception as e:  # never let retry machinery kill the run
        return f"FAIL {name}: retry-spawn error: {e}", False


CHUNK = 60


def main(out_dir, sf_dir, only):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    names = [n for n in sorted(oracle) if not only or n in only]
    # Big sweeps recycle the process every CHUNK queries: each chunk
    # runs in a fresh interpreter (this same script with an explicit
    # query list), capping DuckDB's memory-map accumulation — the
    # full-registry run otherwise exhausts the map table around
    # query ~200 and dies mid-sweep.
    if len(names) > CHUNK and not os.environ.get("GRAFT_CMP_CHILD"):
        env = dict(os.environ, GRAFT_CMP_CHILD="1")
        results = {}

        def run_chunked(todo, size):
            for i in range(0, len(todo), size):
                chunk = todo[i:i + size]
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     out_dir, sf_dir] + chunk,
                    capture_output=True, text=True, env=env)
                seen = set()
                for line in r.stdout.strip().splitlines():
                    if line.startswith(("ok ", "FAIL")):
                        qn = line.split()[1].rstrip(":")
                        results[qn] = line
                        seen.add(qn)
                for qn in chunk:
                    if qn not in seen:
                        results[qn] = (f"FAIL {qn}: chunk runner "
                                       f"died rc={r.returncode}: "
                                       f"{r.stderr[-300:]}")

        run_chunked(names, CHUNK)
        # transient-failure retry lives HERE, in the parent: when the
        # allocator poisoning strikes inside a chunk child, every
        # later query in that child fails and the CHILD cannot even
        # spawn its own retry (ENOMEM) — a fresh small chunk from the
        # parent clears all of it
        TRANSIENT = ("allocat", "out of memory", "retry-spawn",
                     "subprocess timeout", "chunk runner died")
        for _ in range(2):
            retry = [qn for qn, line in results.items()
                     if line.startswith("FAIL")
                     and any(t in line.lower() for t in TRANSIENT)]
            if not retry:
                break
            run_chunked(sorted(retry), 20)
        n_ok = n_bad = 0
        for qn in names:
            line = results.get(qn, f"FAIL {qn}: no result")
            print(line, flush=True)
            n_ok += line.startswith("ok ")
            n_bad += line.startswith("FAIL")
        print(f"\n{n_ok} ok, {n_bad} fail")
        return 1 if n_bad else 0
    n_ok = n_bad = 0
    for name in names:
        sql = oracle[name]
        try:
            line, ok = compare_one(out_dir, sf_dir, name, sql)
        except Exception as e:
            line, ok = f"FAIL {name}: exec error: {e}", False
        # transient allocator failures: retry in a FRESH PROCESS —
        # in-process retries inherit the poisoned allocator and keep
        # failing; a clean process passes
        attempt = 0
        while (not ok and attempt < SUBPROCESS_RETRIES
               and ("allocat" in line.lower()
                    or "out of memory" in line.lower())):
            line, ok = compare_in_subprocess(out_dir, sf_dir, name, sql)
            attempt += 1
        print(line, flush=True)
        n_ok += ok
        n_bad += not ok
    print(f"\n{n_ok} ok, {n_bad} fail")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], set(sys.argv[3:])))
