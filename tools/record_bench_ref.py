#!/usr/bin/env python3
"""Record bench_out.json as the committed contention-defense reference.

Usage: python3 tools/record_bench_ref.py [bench_out.json] [bench_ref.json]

Run ONLY from a quiet-box bench (check `contended` is empty and the driver
tail looks sane first): the reference defines the 3x re-measure gate, so a
contended recording would make the defense re-measure everything (slow) or
miss regressions (stale). BenchGuardSpec fails the suite if the recording
does not cover every registered query.
"""
import json
import sys


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "bench_out.json"
    dst = sys.argv[2] if len(sys.argv) > 2 else "bench_ref.json"
    with open(src) as f:
        out = json.load(f)
    if out.get("contended"):
        sys.exit(f"refusing to record: contended queries {out['contended']}")
    ref = {"_sf": out["sf"]}
    # drift-calibration row (Bench.CalibrationKey): the recording's own
    # calibration time anchors later runs' drift normalization
    calib = out.get("calibration", {}).get("now", -1.0)
    if calib > 0:
        ref["_calibration"] = round(calib, 3)
        # host shape the calibration ran on: a later run on a different core
        # count disables drift normalization instead of silently skewing it
        par = out.get("calibration", {}).get("parallelism", -1)
        if par > 0:
            ref["_calibration_par"] = par
    for name in sorted(out["queries"]):
        t = out["queries"][name]
        if t < 0:
            sys.exit(f"refusing to record: {name} errored (t={t})")
        ref[name] = round(t, 3)
    with open(dst, "w") as f:
        json.dump(ref, f, indent=1)
        f.write("\n")
    print(f"{dst}: {len(ref) - 1} queries recorded from {src} ({out['sf']})")


if __name__ == "__main__":
    main()
