"""Recompute the N→4N scaling evidence from BENCH/pairs_r*.jsonl.

Pure arithmetic over the logged legs — no Spark, instant — so every
aggregate quoted in BENCH/BASELINE.md is reproducible from the record:

    python tools/pairs_report.py            # all pairs_r*.jsonl
    python tools/pairs_report.py BENCH/pairs_r5.jsonl

A "pair" is a consecutive (8-leg, 32-leg) bench couple in log order.
Probe/bwprobe lines between and around pairs are attached to the
nearest pair as window-health annotations (the ratio printed is the
32-core per-cpu rate over the 8-core per-cpu rate of the closest
preceding and following couple of the same kind).
"""

from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(paths: list[str]) -> list[dict]:
    recs = []
    for p in paths:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line:
                    r = json.loads(line)
                    r["_src"] = os.path.basename(p)
                    recs.append(r)
    return recs


def couple_ratios(recs: list[dict], kind: str) -> list[dict]:
    """(t_wall, ratio) for every consecutive same-kind 8/32 couple."""
    out, pending = [], None
    for r in recs:
        if r["kind"] != kind:
            continue
        if r["cpus"] == 8:
            pending = r
        elif r["cpus"] == 32 and pending is not None:
            out.append({
                "t": r["t_wall"],
                "ratio": r["rows_per_cpu_sec"] / pending["rows_per_cpu_sec"],
            })
            pending = None
    return out


def nearest(couples: list[dict], t: float, max_dt: float = 1800.0) -> float | None:
    """Closest same-kind couple, but only if it's actually in the same
    window (a probe logged hours later annotates nothing)."""
    if not couples:
        return None
    best = min(couples, key=lambda c: abs(c["t"] - t))
    return best["ratio"] if abs(best["t"] - t) <= max_dt else None


def main() -> None:
    paths = sys.argv[1:] or sorted(
        glob.glob(os.path.join(REPO, "BENCH", "pairs_r*.jsonl"))
    )
    recs = load(paths)
    probes = couple_ratios(recs, "probe")
    bwprobes = couple_ratios(recs, "bwprobe")

    pairs, pending = [], None
    for r in recs:
        if r["kind"] != "bench":
            continue
        if r["cpus"] == 8:
            pending = r
        elif r["cpus"] == 32 and pending is not None:
            pairs.append((pending, r))
            pending = None

    print(f"{'src':<16} {'t8 s':>8} {'t32 s':>8} {'M/s@8':>7} {'M/s@32':>7}"
          f" {'eff':>5} {'probe':>6} {'bw':>5}")
    t8_sum = t32_sum = 0.0
    effs = []
    for p8, p32 in pairs:
        eff = (p32["docs_per_sec"] / p8["docs_per_sec"]) / 4
        effs.append(eff)
        t8_sum += p8["headline_sec"]
        t32_sum += p32["headline_sec"]
        pr = nearest(probes, p32["t_wall"])
        bw = nearest(bwprobes, p32["t_wall"])
        print(f"{p8['_src']:<16} {p8['headline_sec']:>8.1f}"
              f" {p32['headline_sec']:>8.1f}"
              f" {p8['docs_per_sec'] / 1e6:>7.1f}"
              f" {p32['docs_per_sec'] / 1e6:>7.1f}"
              f" {eff:>5.2f}"
              f" {pr if pr is None else round(pr, 2)!s:>6}"
              f" {bw if bw is None else round(bw, 2)!s:>5}")
    if not pairs:
        print("no pairs found")
        return
    n = len(pairs)
    agg = (t8_sum / t32_sum) / 4
    effs.sort()
    med = (effs[n // 2] if n % 2 else (effs[n // 2 - 1] + effs[n // 2]) / 2)
    print(f"\npairs: {n}   all-legs aggregate (sum t8 / sum t32 / 4):"
          f" {agg:.3f}")
    print(f"median pair efficiency: {med:.2f}   best: {max(effs):.2f}")
    if bwprobes:
        bws = sorted(c["ratio"] for c in bwprobes)
        print(f"bwprobe window ceilings: {', '.join(f'{b:.2f}' for b in bws)}")


if __name__ == "__main__":
    main()
