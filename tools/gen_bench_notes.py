#!/usr/bin/env python3
"""Generate the BENCH_NOTES round-summary block FROM the shipped bench
JSONs, so the hand-written table can never drift from the artifacts
again (r16 verdict "What's wrong" #2: the notes said 7 windows /
124.3 s / 6.7 s of new rows while the shipped fold was 8 windows /
120.771 s / 9.1 s).

Usage: tools/gen_bench_notes.py <round> [prevRound]
  e.g. tools/gen_bench_notes.py 17 16

Reads  docs/BENCH_FULL_r{N}*.json  (per-window records, driver + local)
and    docs/BENCH_MIN_r{N}.json    (the min-over-windows fold)
and    docs/BENCH_MIN_r{prev}.json (to derive the new-row set)
and prints a markdown block to paste verbatim into docs/BENCH_NOTES.md.
Every number in the output is computed from the JSONs."""
import glob
import json
import os
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    rnd = int(sys.argv[1])
    prev = int(sys.argv[2]) if len(sys.argv) > 2 else rnd - 1
    base = os.path.join(os.path.dirname(__file__), "..", "docs")
    full = sorted(glob.glob(os.path.join(base, f"BENCH_FULL_r{rnd:02d}*.json"))
                  + glob.glob(os.path.join(base, f"BENCH_FULL_r{rnd}*.json")))
    full = sorted(set(full))
    min_path = os.path.join(base, f"BENCH_MIN_r{rnd}.json")
    fold = load(min_path)
    qs = fold["queries"]
    print("| window | queries | total | s/query |")
    print("|---|---|---|---|")
    for i, p in enumerate(full):
        d = load(p)
        n = len(d["queries"])
        tot = d["value"]
        print(f"| `{os.path.basename(p)}` (w{i + 1}) | {n} | {tot:.1f} s "
              f"| {tot / n:.3f} |")
    n = len(qs)
    tot = fold["value"]
    print(f"| min fold (`{os.path.basename(min_path)}`, "
          f"{fold['n_windows']} windows) | {n} | {tot:.2f} s "
          f"| {tot / n:.3f} |")
    prev_path = os.path.join(base, f"BENCH_MIN_r{prev}.json")
    if os.path.exists(prev_path):
        pq = load(prev_path)["queries"]
        new = sorted(set(qs) - set(pq))
        shared = sorted(set(qs) & set(pq))
        s_new = sum(qs[k] for k in new)
        s_now = sum(qs[k] for k in shared)
        s_prev = sum(pq[k] for k in shared)
        print()
        print(f"Derived from the fold JSONs (r{prev} -> r{rnd}): "
              f"{len(new)} new rows summing {s_new:.1f} s in the fold "
              f"({', '.join(new) if len(new) <= 24 else len(new)}); "
              f"the {len(shared)} shared rows went "
              f"{s_prev:.1f} -> {s_now:.1f} s "
              f"({s_now / s_prev:.3f}x).")


if __name__ == "__main__":
    main()
