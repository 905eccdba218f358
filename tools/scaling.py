"""Two-cluster-size scaling evidence (north rule: throughput efficiency
>= 0.8 from N to 4N executors; sandbox proxy: local[8] vs local[32] on the
same input).

The input is the sf0.1 corpus replicated MULT times (doc_id remapped to
keep urls unique) so compute dominates fixed session/JIT overhead — the
quantity that actually scales with cluster size.  The job is the flagship
chain pages -> annotate -> mentions -> triples (count).

Usage: python tools/scaling.py [mult] [sf_dir]
Writes JSON to stdout; paste into BENCH.md.
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


def prepare_input(sf_dir: str, mult: int, workdir: str) -> str:
    """Replicate documents.parquet MULT times with remapped doc_ids."""
    import duckdb
    out = os.path.join(workdir, "documents.parquet")
    parts = " UNION ALL ".join(
        f"SELECT doc_id * {mult} + {k} AS doc_id, text, lang, source, n_chars "
        f"FROM src" for k in range(mult))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW src AS SELECT * FROM '{sf_dir}/documents.parquet'")
    con.execute(f"COPY ({parts}) TO '{out}' (FORMAT PARQUET)")
    return workdir


def run_once(cores: int, sf_dir: str, repeats: int = 3) -> dict:
    from stanza_spark.session import get_spark
    from stanza_spark.sources.pages import pages
    from stanza_spark.operators.annotate import triples_narrow
    from stanza_spark.operators.graph import materialize_graph
    from stanza_spark.operators.linking import alias_df

    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=max(2 * cores, 16),
                      extra={"spark.ui.showConsoleProgress": "false"})
    p = pages(spark, sf_dir, with_html=False)
    n_docs = p.count()

    def chain(df):
        # production plan: narrow pages->triples pass, then the one
        # unavoidable exchange (graph aggregate on canonical keys)
        t = triples_narrow(df)
        return materialize_graph(t, alias_df(spark)) \
            .agg(F.sum("support")).collect()[0][0]

    # warmup: full chain on ~1/16 of the corpus — primes python workers,
    # Arrow serializers and whole-stage codegen (one-time session costs a
    # long-lived cluster never re-pays; we measure steady-state throughput)
    chain(p.filter(F.col("doc_id") % 16 == 0))

    # repeat and take the best: this VM shows bimodal JVM behavior
    # (background compilation / frequency noise); min = steady state
    times = []
    n_triples = None
    for _ in range(repeats):
        t0 = time.time()
        n_triples = chain(p)
        times.append(time.time() - t0)
    dt = min(times)
    spark.stop()
    return {"cores": cores, "docs": n_docs, "triples": n_triples,
            "seconds": round(dt, 2),
            "all_runs": [round(t, 2) for t in times],
            "docs_per_sec": round(n_docs / dt, 1)}


def main():
    mult = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_big = 4 * n_small
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    workdir = tempfile.mkdtemp(prefix="scaling-")
    try:
        big = prepare_input(sf_dir, mult, workdir)
        r_n = run_once(n_small, big, repeats)
        r_4n = run_once(n_big, big, repeats)
        ratio = r_n["seconds"] / r_4n["seconds"]
        out = {
            "input_docs": r_n["docs"], "mult": mult,
            f"local{n_small}": r_n, f"local{n_big}": r_4n,
            "throughput_ratio_4n_vs_n": round(ratio, 3),
            "efficiency_n_to_4n": round(ratio / 4.0, 3),
        }
        print(json.dumps(out, indent=2))
        with open("/root/repo/BENCH_SCALING.json", "w") as f:
            json.dump(out, f, indent=2)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
