#!/usr/bin/env python3
"""Dev-only scaling report: join the committed bench_results records
(graft.Bench at 1x, graft.ScaleBench at Nx) into the per-query ratio /
marginal-slope table quoted in PERF_NOTES.md — so the scaling claims
are reproducible from the repo with one command. Usage:

  python3 scripts/scale_report.py \
      [base.json] [x10.json] [x30.json]

Defaults to bench_results/r5_sf0.1.json, r5_scale_x10.json,
r5_scale_x30.json. Ratio rN = tN / t1 (linear expectation at factor F
is rN == F); slope = t30/t10/3 (1.0 = linear in the 10->30 segment).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    args = sys.argv[1:]
    base = load(args[0] if len(args) > 0 else "bench_results/r5_sf0.1.json")
    x10 = load(args[1] if len(args) > 1 else "bench_results/r5_scale_x10.json")
    x30 = load(args[2] if len(args) > 2 else "bench_results/r5_scale_x30.json")
    b, q10, q30 = base["queries"], x10["queries"], x30["queries"]

    print(f"1x  total {base['value']:8.1f}s  n={len(b):3d}  "
          f"failed={base['failed']}  load {base['load_avg_start']:.1f}"
          f"->{base['load_avg_end']:.1f}")
    print(f"10x total {x10['value']:8.1f}s  n={len(q10):3d}  "
          f"failed={x10['failed']}  load {x10['load_avg_start']:.1f}"
          f"->{x10['load_avg_end']:.1f}")
    print(f"30x total {x30['value']:8.1f}s  n={len(q30):3d}  "
          f"failed={x30['failed']}  load {x30['load_avg_start']:.1f}"
          f"->{x30['load_avg_end']:.1f}")
    print()
    print(f"{'query':30s} {'1x':>7s} {'10x':>8s} {'30x':>8s} "
          f"{'r10':>6s} {'r30':>6s} {'slope':>6s}")
    rows = []
    for k in sorted(set(b) | set(q10) | set(q30)):
        t1, t10, t30 = b.get(k), q10.get(k), q30.get(k)
        slope = (t30 / t10 / 3) if (t10 and t30) else None
        rows.append((k, t1, t10, t30, slope))
    rows.sort(key=lambda r: -(r[3] or r[2] or r[1] or 0))
    over_linear, over_2x = [], []
    for k, t1, t10, t30, slope in rows:
        def f(v, w):
            return f"{v:{w}.2f}" if v is not None else " " * (w - 1) + "-"
        r10 = f(t10 / t1 if t1 and t10 else None, 6)
        r30 = f(t30 / t1 if t1 and t30 else None, 6)
        print(f"{k:30s} {f(t1, 7)} {f(t10, 8)} {f(t30, 8)} "
              f"{r10} {r30} {f(slope, 6)}")
        if slope and slope > 1.0:
            over_linear.append((k, round(slope, 2)))
        if t1 and t10 and t10 / t1 > 20:
            over_2x.append((k, round(t10 / t1, 1)))
    print()
    print("10x queries above 2x-linear (ratio>20):", over_2x or "none")
    print("10->30 slopes above 1.0:", over_linear or "none")


if __name__ == "__main__":
    main()
