"""Graph materialize + dedup (operator C5): triples -> canonical, deduplicated
``graph_edges(subj_canon, pred, obj_canon, support)``.

Canonical ids come from the broadcast alias dictionary (C3); surfaces that
don't link keep their lowercased surface as id.  The aggregation is algebraic
(count), so Spark's partial (map-side) aggregation absorbs Zipfian entity
skew before the shuffle; for holistic aggregates (e.g. collect_set of source
urls) use `salted_support` which two-stage-aggregates over a salted key
(SURVEY §2.3 C6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canon(triples: DataFrame, aliases: DataFrame, col: str) -> DataFrame:
    a = F.broadcast(
        aliases.select(F.lower("alias").alias(f"{col}_l"),
                       F.col("entity_id").alias(f"{col}_eid"))
    )
    t = triples.withColumn(f"{col}_l", F.lower(col))
    return (
        t.join(a, f"{col}_l", "left")
        .withColumn(f"{col}_canon", F.coalesce(f"{col}_eid", f"{col}_l"))
        .drop(f"{col}_l", f"{col}_eid")
    )


def materialize_graph(triples: DataFrame, aliases: DataFrame) -> DataFrame:
    """-> (subj_canon, pred, obj_canon, support)."""
    t = _canon(_canon(triples, aliases, "subj"), aliases, "obj")
    return (
        t.groupBy("subj_canon", "pred", "obj_canon")
        .agg(F.count(F.lit(1)).alias("support"))
    )


def salted_support(triples: DataFrame, aliases: DataFrame,
                   n_salt: int = 16) -> DataFrame:
    """Two-stage skew-safe variant: first aggregate on a salted key
    (pmod(xxhash64(url), n_salt)), then merge — the cluster-scale analog of
    the reference's long-row isolation
    (/root/reference/stanza/models/depparse/data.py:46-51)."""
    t = _canon(_canon(triples, aliases, "subj"), aliases, "obj")
    salted = t.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(n_salt)))
    partial = (
        salted.groupBy("subj_canon", "pred", "obj_canon", "salt")
        .agg(F.count(F.lit(1)).alias("psupport"),
             F.collect_set("url").alias("purls"))
    )
    return (
        partial.groupBy("subj_canon", "pred", "obj_canon")
        .agg(F.sum("psupport").alias("support"),
             F.slice(F.array_sort(F.flatten(F.collect_list("purls"))), 1, 5)
              .alias("sample_urls"))
    )


def merge_graph_edges(spark, existing_dir: str, new_triples: DataFrame,
                      aliases: DataFrame) -> DataFrame:
    """Idempotent incremental upsert — the parquet equivalent of Iceberg's
    ``MERGE INTO graph_edges USING new ON keys WHEN MATCHED THEN UPDATE
    support = support + delta WHEN NOT MATCHED THEN INSERT`` (SURVEY §2.3
    C5).  Reads the existing table (if any), aggregates the delta, merges
    via full outer join on the canonical key, and commits atomically
    (write-to-temp + directory swap — the snapshot-commit stand-in).

    Returns the merged DataFrame (already persisted at ``existing_dir``).
    """
    import os
    import shutil

    delta = materialize_graph(new_triples, aliases) \
        .withColumnRenamed("support", "delta_support")
    if os.path.exists(os.path.join(existing_dir, "_SUCCESS")):
        existing = spark.read.parquet(existing_dir)
        merged = (
            existing.join(delta, ["subj_canon", "pred", "obj_canon"], "full")
            .select(
                "subj_canon", "pred", "obj_canon",
                (F.coalesce("support", F.lit(0))
                 + F.coalesce("delta_support", F.lit(0))).alias("support"))
        )
    else:
        merged = delta.withColumnRenamed("delta_support", "support")
    tmp = existing_dir.rstrip("/") + ".__merge_tmp__"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(existing_dir):
        shutil.rmtree(existing_dir)
    os.rename(tmp, existing_dir)
    return spark.read.parquet(existing_dir)
