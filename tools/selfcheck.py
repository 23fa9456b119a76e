#!/usr/bin/env python3
"""Round self-check artifact: triplicate adjudication of disputed
queries + full-battery summary.

History: the r10/r11 "4 non-reproducing hash mismatches" turned out
to be a REAL repo bug (un-CAST SUM -> DuckDB HUGEINT -> fetchdf
float64) that this tool's old integral-float canonicalization masked.
The hash below is now byte-faithful to the representation, like the
driver's. This tool makes stability adjudication PROVABLE:
for each named query it reruns the DuckDB compare N times in fresh
subprocesses, records the md5 of the column-sorted value matrix of
BOTH sides each time, and emits SELFCHECK_r<N>.json. Identical
spark/oracle hashes across all runs = the engine result is stable
and equal; any driver-side red row for these queries is then
attributable to the sweep, not the engine (see also the
q_aa_canary / q_zz_canary constant probes).

Usage: selfcheck.py OUT_DIR SF_DIR ROUND [QUERY ...]
       selfcheck.py OUT_DIR SF_DIR ROUND --rotate N
(defaults to the four r10-disputed queries + both canaries)

Rotation (r15 verdict #7): at ~370 registered queries a full
triplicate sweep per round is not cheap, so `--rotate N` selects the
N queries whose last triplicate check is OLDEST — never-checked
first (alphabetical for determinism), then ascending by the last
SELFCHECK_r*.json round that contains them — plus both canaries.
Run with N ≈ registry/3 per round and every query gets a triplicate
adjudication at least once per ~3 rounds. The rotation state IS the
committed SELFCHECK artifacts: no extra bookkeeping file, and a
clobbered artifact just re-queues its queries.
"""
import glob, hashlib, json, re, subprocess, sys

DEFAULT = ["q_text_dedup_curve", "q_text_stopwords",
           "q_text_vocab_growth", "q_vec_centroid_margin",
           "q_aa_canary", "q_zz_canary"]

CHILD = r"""
import hashlib, json, math, sys
import duckdb
out_dir, sf_dir, name, sql = sys.argv[1:5]
con = duckdb.connect()
con.execute("SET threads=4")
# long queries (recursive CTEs) trip the ASCII progress bar ON
# STDOUT, corrupting the one-line JSON protocol
con.execute("SET enable_progress_bar=false")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
def mat(df):
    df = df.reindex(sorted(df.columns), axis=1)
    def n(v):
        # numpy arrays -> python lists, numpy scalars -> python
        # scalars BEFORE repr: engines disagree on dtype (int32 vs
        # int64) and numpy 2 reprs carry the dtype name
        if hasattr(v, "tolist") and not hasattr(v, "upper"):
            v = v.tolist()
        if isinstance(v, list):
            return repr([n(x) for x in v])
        if isinstance(v, float):
            # BYTE-FAITHFUL: do NOT canonicalize integral floats back
            # to ints. The r10/r11 driver hash-fails were caused by
            # DuckDB HUGEINT->float64 (5 -> 5.0); the old int(v)
            # normalization here masked exactly that for two rounds.
            # The driver's hash sees the representation — so must we.
            if math.isnan(v):
                return "NaN"
            return repr(v)
        if isinstance(v, int):
            return repr(v)
        return repr(str(v))
    rows = [[n(v) for v in row] for row in df.itertuples(index=False)]
    return hashlib.md5(json.dumps(
        [list(df.columns)] + rows).encode()).hexdigest()
got = con.execute(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").fetchdf()
exp = con.execute(sql).fetchdf()
print(json.dumps({"spark_md5": mat(got), "oracle_md5": mat(exp),
                  "rows": len(got), "oracle_rows": len(exp)}))
"""


def rotation(sqls, n):
    """The n oldest-unchecked oracle-backed queries (+ canaries)."""
    last = {}
    for path in glob.glob("SELFCHECK_r*.json"):
        m = re.search(r"SELFCHECK_r(\d+)", path)
        if not m:
            continue
        r = int(m.group(1))
        try:
            checked = json.load(open(path))
        except (json.JSONDecodeError, OSError):
            continue
        for q in checked:
            last[q] = max(last.get(q, -1), r)
    pool = sorted(sqls, key=lambda q: (last.get(q, -1), q))
    picked = [q for q in pool if not q.endswith("_canary")][:n]
    return picked + ["q_aa_canary", "q_zz_canary"]


def main():
    out_dir, sf_dir, rnd = sys.argv[1:4]
    sqls = json.load(open(f"{out_dir}/oracle_sql.json"))
    if len(sys.argv) >= 6 and sys.argv[4] == "--rotate":
        queries = rotation(sqls, int(sys.argv[5]))
    else:
        queries = sys.argv[4:] or DEFAULT
    report = {}
    for name in queries:
        runs = []
        for i in range(3):
            p = subprocess.run(
                [sys.executable, "-c", CHILD, out_dir, sf_dir, name,
                 sqls[name]], capture_output=True, text=True)
            if p.returncode != 0:
                runs.append({"err": p.stderr.strip()[-300:]})
            else:
                # parse the LAST stdout line: belt-and-braces against any
                # engine chatter that slips past the progress-bar off switch
                runs.append(json.loads(
                    p.stdout.strip().splitlines()[-1]))
        ok = (all("err" not in r for r in runs) and
              len({r["spark_md5"] for r in runs}) == 1 and
              len({r["oracle_md5"] for r in runs}) == 1 and
              runs[0]["spark_md5"] is not None and
              all(r["spark_md5"] == r["oracle_md5"] for r in runs))
        report[name] = {"runs": runs, "stable_and_equal": ok}
        print(f"{'ok  ' if ok else 'FAIL'} {name}")
    path = f"SELFCHECK_r{rnd}.json"
    json.dump(report, open(path, "w"), indent=1)
    print(f"wrote {path}")
    sys.exit(0 if all(v["stable_and_equal"] for v in report.values())
             else 1)


if __name__ == "__main__":
    main()
