#!/usr/bin/env python3
"""Summarize ATE_r04_*.json artifacts: table row + drift diagnosis per run.

Usage: python summarize_ate.py ATE_r04_seq00.json [more.json ...]
"""

import json
import sys


def summarize(path):
    with open(path) as f:
        r = json.load(f)
    ate = r.get("ate_sim3_m")
    pl = r.get("path_length_m") or 0
    pct = 100.0 * ate / pl if (ate and pl) else float("nan")
    print(f"== {path}")
    print(f"  seq {r.get('seq', r.get('dataset'))}: {r['tracked']}/{r['frames']} tracked, "
          f"{r['keyframes']} KFs, {r['map_points']} MPs, "
          f"{r.get('loops_closed', 0)} loops, ATE {ate} m ({pct:.2f}% of "
          f"{pl} m), fps {r.get('fps')} (tracking {r.get('fps_tracking')})")
    if "ate_kf_sim3_m" in r:
        print(f"  KEYFRAME-trajectory ATE (reference protocol, "
              f"n={r.get('keyframe_poses')}): {r['ate_kf_sim3_m']} m "
              f"({100.0 * r['ate_kf_sim3_m'] / pl:.2f}%)")
    if "loop_funnel" in r:
        print(f"  loop funnel: {r['loop_funnel']}")
    if r.get("loop_events"):
        print(f"  loops at frames: "
              f"{[ev['frame'] for ev in r['loop_events']]}")
    d = r.get("drift")
    if d:
        print(f"  global sim3 scale {d['global_scale']}, max local-scale dev "
              f"{d['scale_drift_pct']}%")
        segs = d["segments"]
        if segs:
            rmses = sorted(s["local_rmse_m"] for s in segs)
            med = rmses[len(rmses) // 2]
            worst = max(segs, key=lambda s: s["global_err_m"])
            print(f"  per-~100m windows: median local RMSE {med:.3f} m "
                  f"(tracking noise), worst global-err window at arc "
                  f"{worst['arc_m']} m: {worst['global_err_m']} m "
                  f"(local scale {worst['local_scale']})")
        curve = d["error_curve"]
        peak = max(curve, key=lambda c: c["err_m"])
        print(f"  error curve peak {peak['err_m']} m at arc {peak['arc_m']} m "
              f"(frame {peak['id']}); final {curve[-1]['err_m']} m")


if __name__ == "__main__":
    for p in sys.argv[1:]:
        summarize(p)
