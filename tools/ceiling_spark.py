"""Spark-native scaling ceiling: the 8->32 efficiency of a PERFECTLY
parallel Spark job on this VM — the tightest upper bound the engine's own
pair quotient can be compared against in like units (r5 judge item #1).

The earlier ceilings (tools/ceiling.py md5 burn 0.617, ceiling_mixed.py
ALU/DRAM/IO 0.361) are bare-host proxies the ENGINE EXCEEDS, which makes
them floors for skepticism, not ceilings.  This probe stays inside Spark:
same session config as tools/scaling.py run_once (same split carving,
same GC setup), one stage, zero shuffles beyond the final partial-agg
count, zero Python — a chained xxhash64 fold over the same pre-
materialized pages parquet.  Whatever 8->32 quotient THIS job posts is
what 'embarrassingly parallel' costs on this VM through the whole Spark
stack; no real operator with joins and aggregation can be expected to
beat it.

`rounds` chains per-row string-hash work so compute dominates the scan
(each link re-hashes the text column, so the work is string-width, not
8-byte-long-width); the chain is built by python-side NESTING (capped at
256 — Catalyst's analysis stack overflows near 500) because nesting
keeps the job inside whole-stage codegen, while the higher-order
F.aggregate alternative is CodegenFallback and measures GC, not CPU.

Usage: python tools/ceiling_spark.py [mult] [rounds] [repeats] [cycles]
Writes CEILING_SPARK.json.  Quiet machine required.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def run_once(cores: int, workdir: str, rounds: int, repeats: int) -> dict:
    from stanza_spark.session import get_spark

    pages_path = os.path.join(workdir, "pages.parquet")
    size = os.path.getsize(pages_path)
    splits_per_core = int(os.environ.get("SPARK_GRAFT_SPLITS_PER_CORE", "2"))
    spark = get_spark(f"ceiling-{cores}", cores=cores,
                      shuffle_partitions=max(2 * cores, 16),
                      extra={
                          "spark.ui.showConsoleProgress": "false",
                          "spark.sql.files.maxPartitionBytes":
                              str(max(size // (splits_per_core * cores),
                                      65536)),
                          "spark.sql.files.openCostInBytes": "0",
                      })
    p = spark.read.parquet(pages_path)
    n_docs = p.count()

    def job_for(run_id: int):
        # FRESH lineage per run: re-collecting the same DataFrame lets
        # Spark REUSE the warmup's shuffle files (stage skipping) and
        # the "measurement" times only the final reduce — measured 0.08 s
        # for a 5-gigahash job before this fix.  Salting the chain's
        # first link with the run id changes the DAG, so every run
        # recomputes end to end.
        #
        # The chain is a python-side NESTED expression (depth = rounds,
        # capped well below Catalyst's ~500-deep analysis stack limit)
        # over the TEXT column each link, because nesting keeps the whole
        # job inside WHOLE-STAGE CODEGEN — the tempting alternative,
        # F.aggregate over a sequence, is CodegenFallback (interpreted,
        # boxing every long), whose allocation load measures the JVM GC
        # under thread pressure rather than the host's parallel compute.
        h = F.xxhash64("text", F.lit(run_id))
        for i in range(rounds):
            h = F.xxhash64("text", h)
        # try_sum: a plain long sum overflows under ANSI mode; the value
        # is discarded anyway — only the per-row hash work is timed
        return p.select(h.alias("h")).agg(F.try_sum("h").alias("s"))

    job_for(-1).collect()                           # warmup (codegen, JIT)
    times = []
    for r in range(repeats):
        t0 = time.time()
        job_for(r).collect()
        times.append(time.time() - t0)
    dt = min(times)
    spark.stop()
    return {"cores": cores, "docs": n_docs, "seconds": round(dt, 2),
            "all_runs": [round(t, 2) for t in times],
            "docs_per_sec": round(n_docs / dt, 1)}


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cycles = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    sf_dir = "/root/testdata/sf0.1"

    import importlib.util as ilu
    spec = ilu.spec_from_file_location("curscaling",
                                       "/root/repo/tools/scaling.py")
    cursc = ilu.module_from_spec(spec)
    spec.loader.exec_module(cursc)

    workdir = tempfile.mkdtemp(prefix="ceiling-spark-")
    runs: dict = {}
    try:
        cursc.prepare_input(sf_dir, mult, workdir)
        for _cycle in range(cycles):
            for c in (8, 32):
                r = run_once(c, workdir, rounds, repeats)
                if c not in runs or r["seconds"] < runs[c]["seconds"]:
                    runs[c] = r
                print(f"local[{c}]: {r['seconds']} s runs={r['all_runs']}",
                      flush=True)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
    out = {"mult": mult, "rounds": rounds, "repeats": repeats,
           "cycles": cycles,
           "local8": runs[8], "local32": runs[32],
           "eff_8_32": round(runs[8]["seconds"] / runs[32]["seconds"] / 4,
                             3),
           "method": "one-stage pure-codegen xxhash64 fold over the same "
                     "pre-materialized pages parquet, same session/split "
                     "config as tools/scaling.py; min over repeats, best "
                     "over interleaved cycles"}
    print(json.dumps(out, indent=2))
    with open("/root/repo/CEILING_SPARK.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
