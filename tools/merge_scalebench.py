#!/usr/bin/env python3
"""Merge ScaleBench batch outputs into the round artifact.

Usage: merge_scalebench.py SCALEBENCH_rN.json batch1.json [batch2.json ...]

Each batch file is one ScaleBench JSON line ({metric, sf, scales,
queries:{name:{k1, k1_med, ..., samples, alpha}}}). Merging keeps the
per-cell MIN across batches (k-cells and their medians follow the min
batch), sums samples, and recomputes alpha from the merged min cells
over the widest k-range both sides share. The round artifact is
created if absent. Never run a ScaleBench main pointed AT the round
artifact (the r15b SCALEBENCH_r12 clobber) — always merge explicitly.
"""
import json
import math
import sys


def inject_probes(src):
    """Copy the batch's per-k host probe into each cell (k1_probe,
    ...) so merged artifacts record the host state each retained min
    was measured under (r17 verdict #5)."""
    probes = src.pop("probes", None)
    if not probes:
        return
    for cell in src["queries"].values():
        for k in list(cell):
            if k.startswith("k") and "_" not in k and k in probes:
                cell[f"{k}_probe"] = probes[k]


def merge(dst, src):
    for name, cell in src["queries"].items():
        if name not in dst["queries"]:
            dst["queries"][name] = cell
            continue
        d = dst["queries"][name]
        # only BARE k-cells drive the merge; a _med travels with the
        # batch that supplied its base cell's retained min (copying a
        # stray _med on absence alone could pair another batch's
        # median with this batch's min)
        for k in cell:
            if not k.startswith("k") or "_" in k:
                continue
            if k in d:
                if cell[k] < d[k]:
                    d[k] = cell[k]
                    # companions (median, host probe) travel with the
                    # batch that supplied the retained min; a winning
                    # batch without one DROPS the loser's, or we'd
                    # pair another batch's companion with this
                    # batch's min
                    for suf in ("_med", "_probe"):
                        if f"{k}{suf}" in cell:
                            d[f"{k}{suf}"] = cell[f"{k}{suf}"]
                        else:
                            d.pop(f"{k}{suf}", None)
            else:
                d[k] = cell[k]
                for suf in ("_med", "_probe"):
                    if f"{k}{suf}" in cell:
                        d[f"{k}{suf}"] = cell[f"{k}{suf}"]
        d["samples"] = d.get("samples", 0) + cell.get("samples", 0)
        # alpha over the WIDEST k-range present after the merge (a
        # narrower batch must not shrink the exponent's span); a
        # non-positive min cell (errored run recorded as 0.0) makes
        # the log undefined — leave the prior alpha rather than crash
        ks = sorted(
            (k for k in d if k.startswith("k") and "_" not in k),
            key=lambda s: int(s[1:]))
        if len(ks) >= 2:
            lo, hi = ks[0], ks[-1]
            if d[lo] > 0 and d[hi] > 0:
                d["alpha"] = round(
                    math.log(d[hi] / d[lo]) /
                    math.log(int(hi[1:]) / int(lo[1:])), 3)


def main():
    out_path, batches = sys.argv[1], sys.argv[2:]
    try:
        dst = json.load(open(out_path))
    except (OSError, json.JSONDecodeError):
        dst = None
    for b in batches:
        with open(b) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                src = json.loads(line)
                inject_probes(src)
                if dst is None:
                    dst = src
                else:
                    merge(dst, src)
    json.dump(dst, open(out_path, "w"), indent=None)
    print(f"{out_path}: {len(dst['queries'])} entries")


if __name__ == "__main__":
    main()
