"""Run bench.py across every kernel family and emit one JSON report.

Round-tracking harness: each row is the family's standard configuration
(the README table geometries).  Runs take ~1-2 min each on the chip
(first compile dominates); results append to stdout as they finish and
the combined report prints last.

    python scripts/bench_all.py            # all families
    python scripts/bench_all.py bgk mrtcg  # a subset
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

CONFIGS = {
    "bgk": ["--model", "bgk", "--rows", "7936", "--cols", "128",
            "--steps", "800"],
    "kbc": ["--model", "kbc", "--rows", "3968", "--cols", "128",
            "--steps", "1600"],
    "mrtcg": ["--model", "mrtcg", "--rows", "2048", "--cols", "128",
              "--steps", "800"],
    "csf": ["--model", "csf", "--rows", "2048", "--cols", "128",
            "--steps", "600"],
    "rk": ["--model", "rk", "--rows", "1024", "--cols", "256",
           "--steps", "600"],
    "cavity": ["--model", "cavity", "--rows", "512", "--cols", "512",
               "--steps", "3000"],
    "cylinder": ["--model", "cylinder", "--rows", "1024", "--cols", "512",
                 "--steps", "1000"],
    "sediment": ["--model", "sediment", "--rows", "1024", "--cols", "512",
                 "--steps", "400"],
    "falling": ["--model", "falling", "--rows", "1024", "--cols", "512",
               "--steps", "1000"],
    "thermal": ["--model", "thermal", "--rows", "1024", "--cols", "512",
                "--steps", "400"],
    "thermal5": ["--model", "thermal5", "--rows", "1024", "--cols", "512",
                 "--steps", "400"],
    "les": ["--model", "les", "--rows", "1024", "--cols", "512",
            "--steps", "800"],
    "trt": ["--model", "trt", "--rows", "1024", "--cols", "512",
            "--steps", "800"],
    "sc": ["--model", "sc", "--rows", "1024", "--cols", "512",
           "--steps", "800"],
    "plaw": ["--model", "plaw", "--rows", "1024", "--cols", "512",
             "--steps", "800"],
    "d3q19": ["--model", "d3q19", "--rows", "512", "--cols", "512",
              "--steps", "200"],
    "bgk_sharded": ["--model", "bgk", "--sharded", "--rows", "4096",
                    "--cols", "512", "--steps", "800"],
    # the flagship wide multiphase shapes (mrt_rayleigh_taylor.cpp:180)
    # at the measured round-4 optimum defaults (default_geometry)
    "mrtcg_wide": ["--model", "mrtcg", "--rows", "1024", "--cols", "512",
                   "--steps", "600"],
    "csf_wide": ["--model", "csf", "--rows", "1024", "--cols", "512",
                 "--steps", "600"],
}


def main(argv):
    names = argv or list(CONFIGS)
    unknown = [n for n in names if n not in CONFIGS]
    if unknown:
        print(f"unknown: {unknown}; available: {list(CONFIGS)}")
        return 2
    report = {}
    for name in names:
        t0 = time.perf_counter()
        try:
            proc = subprocess.run(
                [sys.executable, "bench.py"] + CONFIGS[name],
                capture_output=True, text=True, timeout=1200)
        except subprocess.TimeoutExpired:
            print(f"[FAIL] {name}: timeout", flush=True)
            report[name] = {"error": "timeout"}
            continue
        dt = time.perf_counter() - t0
        lines = proc.stdout.strip().splitlines()
        if proc.returncode or not lines:
            tail = proc.stderr.strip().splitlines()[-1] if proc.stderr else ""
            print(f"[FAIL] {name}: rc={proc.returncode} {tail}", flush=True)
            report[name] = {"error": proc.returncode or "no output"}
            continue
        row = json.loads(lines[-1])
        print(f"[{name}] {row['value']} {row['unit']} "
              f"({row['vs_baseline']}x baseline, {dt:.0f}s)", flush=True)
        report[name] = row
    print(json.dumps(report))
    return 1 if any("error" in v for v in report.values()) else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
