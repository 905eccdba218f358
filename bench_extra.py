"""Round-7 optimization harness (guide §1.4/§1.5): per-query noop-sink
isolation + ``explain("formatted")`` capture.

NOT part of the frozen driver bench (bench.py is measurement-frozen); this
file exists so optimization evidence (stage isolation, plan shapes) can be
cited in OPTIMIZATION_r07.md without touching the driver contract.

Usage:
  python bench_extra.py                      # all headline queries, noop
  python bench_extra.py kg_triples ...       # subset
  python bench_extra.py --plans r07/before   # also write plans/<tag>/<q>.txt
  python bench_extra.py --stages             # kg_triples stage isolation
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

HEADLINE = [
    "kg_extract_text", "kg_tokens", "kg_triples", "kg_triples_mst",
    "kg_graph_edges", "kg_links_fuzzy", "kg_constituency",
    "rel_pricing_summary", "rel_top_orders", "rel_sessionize",
    "text_dedup_lsh_pairs", "text_ann_topk", "text_ann_ivf", "text_langid",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def time_noop(spark, name, fn, repeats=3):
    samples = []
    for _ in range(repeats):
        spark.sparkContext.setJobDescription(f"noop:{name}")
        t0 = time.time()
        noop(fn(spark, SF_DIR))
        samples.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    return samples


def main():
    args = [a for a in sys.argv[1:]]
    plans_tag = None
    stages = False
    if "--plans" in args:
        i = args.index("--plans")
        plans_tag = args[i + 1]
        del args[i:i + 2]
    if "--stages" in args:
        stages = True
        args.remove("--stages")
    names = args or HEADLINE

    import __spark_entry__ as entrymod
    from stanza_spark.session import get_spark
    queries = {**entrymod.queries(), **entrymod.parity_queries()}
    spark = get_spark(f"bench-extra-{CPUS}", cores=CPUS,
                      shuffle_partitions=max(CPUS, 8),
                      extra={"spark.ui.showConsoleProgress": "false"})
    # warm codegen/python workers like bench.py does
    queries[names[0]](spark, SF_DIR).count()

    out = {}
    for name in names:
        fn = queries[name]
        if plans_tag:
            os.makedirs(f"plans/{plans_tag}", exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            with open(f"plans/{plans_tag}/{name}.txt", "w") as f:
                f.write(plan)
        s = time_noop(spark, name, fn)
        out[name] = {"min": min(s), "samples": s}
        print(f"{name:24s} min={min(s):7.3f}  {s}", flush=True)

    if stages:
        # kg_triples stage isolation: annotate -> checkpoint -> mentions ->
        # join fan (each timed separately, noop sink)
        from stanza_spark.sources.pages import pages
        from stanza_spark.operators.annotate import annotate
        from stanza_spark.operators.mentions import decode_mentions
        from stanza_spark.operators.triples import extract_triples
        from pyspark.sql import functions as F

        t = {}
        t0 = time.time()
        noop(pages(spark, SF_DIR, with_html=False))
        t["pages_noop"] = round(time.time() - t0, 3)
        t0 = time.time()
        noop(annotate(pages(spark, SF_DIR, with_html=False)))
        t["annotate_noop"] = round(time.time() - t0, 3)
        t0 = time.time()
        w = annotate(pages(spark, SF_DIR, with_html=False)) \
            .localCheckpoint(eager=True)
        t["annotate_ckpt"] = round(time.time() - t0, 3)
        t0 = time.time()
        noop(decode_mentions(w))
        t["mentions_noop_from_ckpt"] = round(time.time() - t0, 3)
        t0 = time.time()
        m = decode_mentions(w).localCheckpoint(eager=True)
        t["mentions_ckpt"] = round(time.time() - t0, 3)
        t0 = time.time()
        noop(extract_triples(w, m))
        t["joinfan_noop"] = round(time.time() - t0, 3)
        t0 = time.time()
        noop(extract_triples(w, decode_mentions(w)))
        t["joinfan_lazy_mentions_noop"] = round(time.time() - t0, 3)
        print(json.dumps(t, indent=1), flush=True)
        out["_stages_kg_triples"] = t

    with open("/tmp/bench_extra_last.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
