"""In-session code A/B: r4 committed code vs the current tree, interleaved
scaling sweeps at local[8] and local[32] over ONE shared pre-materialized
input (r5 judge item #1).

The question this answers: was the r5 scaling artifact's 27 % absolute-
throughput drop vs r4 a code regression or host phase?  Cross-session
numbers cannot say (this VM's host phase swings ~1.9x between sessions —
BENCH.md methodology); only an interleaved same-session A/B can.  Each
code tree runs ITS OWN committed harness (tools/scaling.py run_once), so
the comparison covers the full committed stack — engine code AND harness
constants (r4 hardcodes 4 splits/core; the current tree defaults to 2).

Per cycle: one md5-burn calibration sample (32 procs, bench.calibrate),
then both codes at local[8] back-to-back, then both at local[32] — pair
quotients computed WITHIN a cycle compare adjacent measurements in the
same host phase.  Code order alternates per cycle.  Every sample is
persisted raw; two aggregate views are reported per code:

* best-by-throughput — min seconds per (code, cores) across all cycles,
  pair efficiency from those mins (the fastest the code ran);
* best-by-efficiency — the single cycle whose within-cycle 8->32
  quotient is highest (the cleanest host window).

Usage: python tools/scaling_ab.py [mult] [cycles] [repeats] [r4_dir]
Writes SCALING_AB.json.  Needs a quiet machine (no concurrent Spark).
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

# runs one (code_dir, cores) measurement in a FRESH interpreter: loads the
# code tree's own tools/scaling.py, strips /root/repo from sys.path so the
# worktree's stanza_spark wins, calls its run_once
_RUNNER = r'''
import importlib.util, json, os, sys
code_dir, cores, workdir, repeats = (
    sys.argv[1], int(sys.argv[2]), sys.argv[3], int(sys.argv[4]))
sys.path.insert(0, code_dir)
spec = importlib.util.spec_from_file_location(
    "scmod", os.path.join(code_dir, "tools", "scaling.py"))
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)
if os.path.realpath(code_dir) != os.path.realpath("/root/repo"):
    while "/root/repo" in sys.path:
        sys.path.remove("/root/repo")
res = mod.run_once(cores, workdir, repeats)
print("RESULT " + json.dumps(res))
'''


def _run(code_dir: str, cores: int, workdir: str, repeats: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _RUNNER, code_dir, str(cores), workdir,
         str(repeats)],
        capture_output=True, text=True, timeout=1800)
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(
        f"{code_dir} cores={cores} produced no RESULT:\n"
        f"stdout tail: {out.stdout[-2000:]}\nstderr tail: {out.stderr[-2000:]}")


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    cycles = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    r4_dir = sys.argv[4] if len(sys.argv) > 4 else "/tmp/r4code"
    sf_dir = "/root/testdata/sf0.1"
    codes = {"r4": r4_dir, "cur": "/root/repo"}
    cores_list = (8, 32)

    import importlib.util as ilu
    spec = ilu.spec_from_file_location("curscaling",
                                       "/root/repo/tools/scaling.py")
    cursc = ilu.module_from_spec(spec)
    spec.loader.exec_module(cursc)
    import bench

    workdir = tempfile.mkdtemp(prefix="scaling-ab-")
    samples: list[dict] = []
    try:
        cursc.prepare_input(sf_dir, mult, workdir)
        for cycle in range(cycles):
            cal = bench.calibrate(sizes=(32,))
            order = list(codes.items())
            if cycle % 2 == 1:
                order.reverse()
            for cores in cores_list:
                for tag, cdir in order:
                    t0 = time.time()
                    r = _run(cdir, cores, workdir, repeats)
                    r.update(code=tag, cycle=cycle,
                             cal_ops_s_32=cal[32],
                             wall=round(time.time() - t0, 1))
                    samples.append(r)
                    print(f"cycle {cycle} {tag} local[{cores}]: "
                          f"{r['seconds']} s ({r['docs_per_sec']} docs/s) "
                          f"runs={r['all_runs']}", flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    out: dict = {"mult": mult, "cycles": cycles, "repeats": repeats,
                 "sf_dir": sf_dir, "samples": samples, "codes": {}}
    for tag in codes:
        view: dict = {"best_by_throughput": {}, "per_cycle": []}
        for cores in cores_list:
            best = min((s for s in samples
                        if s["code"] == tag and s["cores"] == cores),
                       key=lambda s: s["seconds"])
            view["best_by_throughput"][f"local{cores}"] = {
                "seconds": best["seconds"],
                "docs_per_sec": best["docs_per_sec"],
                "cycle": best["cycle"]}
        t8 = view["best_by_throughput"]["local8"]["seconds"]
        t32 = view["best_by_throughput"]["local32"]["seconds"]
        view["best_by_throughput"]["eff_8_32"] = round(t8 / t32 / 4, 3)
        for cycle in range(cycles):
            by = {s["cores"]: s for s in samples
                  if s["code"] == tag and s["cycle"] == cycle}
            view["per_cycle"].append({
                "cycle": cycle,
                "local8_s": by[8]["seconds"],
                "local32_s": by[32]["seconds"],
                "eff_8_32": round(by[8]["seconds"] / by[32]["seconds"] / 4,
                                  3)})
        view["best_by_efficiency"] = max(view["per_cycle"],
                                         key=lambda c: c["eff_8_32"])
        out["codes"][tag] = view
    # the verdict the A/B exists to render: per-parallelism code ratio in
    # the SAME host phase (min over cycles of within-cycle cur/r4)
    for cores in cores_list:
        ratios = []
        for cycle in range(cycles):
            cur = next(s for s in samples if s["code"] == "cur"
                       and s["cycle"] == cycle and s["cores"] == cores)
            r4 = next(s for s in samples if s["code"] == "r4"
                      and s["cycle"] == cycle and s["cores"] == cores)
            ratios.append(round(cur["seconds"] / r4["seconds"], 3))
        out[f"cur_vs_r4_seconds_ratio_local{cores}"] = {
            "per_cycle": ratios, "min": min(ratios), "max": max(ratios)}
    print(json.dumps({k: v for k, v in out.items() if k != "samples"},
                     indent=2))
    with open("/root/repo/SCALING_AB.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
