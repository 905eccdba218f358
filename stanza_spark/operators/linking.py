"""Entity linking: mention -> broadcast alias dictionary (operator C3).

Dict-lookup-then-fallback is exactly the reference's lemma/MWT ensemble
shape (/root/reference/stanza/models/lemma/trainer.py:221-269): broadcast
hash join on the dictionary key, misses fall through.  The alias dictionary
is tiny relative to the corpus (entities << mentions), so `F.broadcast`
keeps the join shuffle-free at any corpus scale; the optional fuzzy stage
(MinHash-LSH over char n-grams, operators.dedup) only ever sees the
anti-join residue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .. import vocab as V


def alias_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        V.alias_rows(),
        schema="alias string, entity_id string, canonical_name string, "
               "entity_type string",
    )


def link_mentions(mentions: DataFrame, aliases: DataFrame,
                  how: str = "inner") -> DataFrame:
    """mentions (operators.mentions schema) x broadcast aliases ->
    (url, sent_id, mention, type, entity_id, canonical_name, entity_type).
    ``how='left'`` keeps unlinked mentions (entity_id null) for the fuzzy
    fallback path."""
    a = F.broadcast(aliases.withColumn("alias_l", F.lower("alias")).drop("alias"))
    m = mentions.withColumn("alias_l", F.lower("mention"))
    return (
        m.join(a, "alias_l", how)
        .select("url", "sent_id", "mention", "type",
                "entity_id", "canonical_name", "entity_type")
    )


def unlinked_mentions(mentions: DataFrame, aliases: DataFrame) -> DataFrame:
    """Anti-join residue for the fuzzy/LSH fallback (the `skip_seq2seq`
    pattern, lemma/trainer.py:236-250)."""
    a = F.broadcast(aliases.select(F.lower("alias").alias("alias_l")))
    m = mentions.withColumn("alias_l", F.lower("mention"))
    return m.join(a, "alias_l", "left_anti").drop("alias_l")
