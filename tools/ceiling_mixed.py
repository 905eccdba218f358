"""Tightened host-scaling ceiling: a MIXED compute/memory/IO burn.

The pure md5 burn (tools/ceiling.py) UNDERSELLS this host's parallel
ceiling for engine-like work (r4 judge): it is 100 % integer-ALU, so at
32 processes on 32 SMT vCPUs every pair of hyperthreads contends for the
same execution ports and nothing ever blocks — the worst case for
scaling.  A real Spark stage overlaps page-cache IO (parquet reads,
Arrow IPC) and memory-streaming (columnar batches) with compute;
while one thread waits on a syscall or a cache miss, its sibling runs.

Each worker loop here therefore interleaves the three resource classes a
stage actually exercises:

* md5 chain       — integer ALU (the original burn's quantum),
* numpy pass      — memory bandwidth over an 8 MB array,
* pread           — page-cached file IO (syscall + kernel memcpy).

Aggregate loops/s at 1/4/8/16/32 processes, interleaved cycles,
max-per-size (same methodology as tools/ceiling.py).  Writes
CEILING_MIXED.json; read BENCH_SCALING.json's engine efficiencies
against BOTH ceilings — the md5 burn is the pessimistic bound, this one
the engine-profile bound.

Usage: python tools/ceiling_mixed.py [cycles] [loops]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import tempfile
import time

SIZES = (1, 4, 8, 16, 32)
IO_FILE = None          # set in worker init
IO_SIZE = 64 * 1024 * 1024
READ = 1 * 1024 * 1024


def _init(path):
    global IO_FILE
    IO_FILE = os.open(path, os.O_RDONLY)
    import numpy as np
    global _ARR
    _ARR = np.ones(1024 * 1024, dtype=np.float64)   # 8 MB


def _work(loops: int) -> int:
    import numpy as np
    h = b"seed"
    acc = 0.0
    for i in range(loops):
        for _ in range(20_000):                     # ALU
            h = hashlib.md5(h).digest()
        acc += float(np.add(_ARR, 1.0).sum())       # memory bandwidth
        off = (i * 7 * READ) % (IO_SIZE - READ)     # page-cache IO
        acc += len(os.pread(IO_FILE, READ, off))
    return h[0] + int(acc) % 7


def main():
    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    loops = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    import multiprocessing as mp

    with tempfile.NamedTemporaryFile(delete=False) as f:
        f.write(os.urandom(IO_SIZE))
        path = f.name
    # prime the page cache so IO is cache-served like a warm executor
    with open(path, "rb") as f:
        while f.read(8 * 1024 * 1024):
            pass

    best: dict = {}
    try:
        for _cycle in range(cycles):
            for n in SIZES:
                with mp.get_context("spawn").Pool(
                        n, initializer=_init, initargs=(path,)) as pool:
                    pool.map(_work, [1] * n)        # warm
                    t0 = time.monotonic()
                    pool.map(_work, [loops] * n)
                    dt = time.monotonic() - t0
                rate = n * loops / dt
                best[n] = max(best.get(n, 0.0), rate)
    finally:
        os.unlink(path)

    speedup = {n: round(best[n] / best[1], 3) for n in SIZES}
    out = {
        "method": "mixed md5/numpy/pread burn, multiprocessing, "
                  "interleaved sweeps, max aggregate loops/s per size",
        "cycles": cycles,
        "loops_per_proc": loops,
        "cpus_reported": os.cpu_count(),
        "aggregate_loops_per_s": {str(n): round(best[n], 3) for n in SIZES},
        "speedup_vs_1": {str(n): speedup[n] for n in SIZES},
        "efficiency_8_to_32": round((best[32] / best[8]) / 4.0, 3),
        "efficiency_4_to_16": round((best[16] / best[4]) / 4.0, 3),
        "note": "engine-profile ceiling: overlaps IO + memory traffic "
                "with ALU work the way a Spark stage does; read "
                "BENCH_SCALING.json against this AND the pure-CPU "
                "CEILING.json",
    }
    print(json.dumps(out, indent=2))
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "CEILING_MIXED.json"), "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")


if __name__ == "__main__":
    main()
