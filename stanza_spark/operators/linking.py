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


def _char_ngrams(col, n: int = 3):
    """Distinct character n-grams of a string column (whole string when
    shorter than n), as a pure higher-order-function expression."""
    c = F.lower(col)
    return F.when(
        F.length(c) >= n,
        F.array_distinct(
            F.transform(F.sequence(F.lit(1), F.length(c) - n + 1),
                        lambda i: c.substr(i, F.lit(n)))),
    ).otherwise(F.array(c))


def _minhash_bands(grams: DataFrame, id_col: str, n_bands: int) -> DataFrame:
    """(id, gram) -> (id, band, band_hash) via the shared MinHash
    machinery (operators.dedup: affine-mod-Mersenne over md5-prefix
    hashes, banded)."""
    from . import dedup as D
    sig = D.minhash_signatures(
        grams.select(F.col(id_col).alias("doc_id"),
                     F.col("gram").alias("shingle")))
    rpb = D.N_HASHES // n_bands
    return sig.select(
        F.col("doc_id").alias(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_bands - 1)),
                lambda b: F.md5(F.concat_ws(
                    ",", F.slice("sig", b * rpb + 1, rpb))))
        ).alias("band", "band_hash"),
    )


def fuzzy_link_mentions(mentions: DataFrame, aliases: DataFrame,
                        threshold: float = 0.6, n: int = 3,
                        n_bands: int = 8) -> DataFrame:
    """Fuzzy fallback for dict-miss mentions (SURVEY C3): **MinHash-LSH
    blocking over char n-grams** (the north star's stated blocking
    scheme) of the anti-join residue against the alias dictionary, exact
    Jaccard verification on candidates only, best alias per surface above
    ``threshold``.

    Scale shape: matching runs once per DISTINCT miss surface (typo
    populations are tiny relative to occurrences); candidate pairs come
    from a banded signature join against the *broadcast* alias bands —
    never an all-pairs comparison and never a raw shared-gram join (hot
    grams cannot blow up a band bucket the way stop-grams would);
    occurrences get their link back through a broadcast join on the
    surface.  This is the corpus-scale analog of the reference's
    dict-then-expensive-model ensemble
    (/root/reference/stanza/models/lemma/trainer.py:236-269).
    Banding is deterministic md5 arithmetic, so candidate recall for a
    given surface pair is a fixed fact, not a coin flip: at (16 hashes,
    8 bands) a J=0.75 pair collides with probability 1-(1-J^2)^8 ≈ 0.999
    over random gram sets, and the planted corpus pairs are asserted
    exactly by the kg_links_fuzzy gate."""
    residue = unlinked_mentions(mentions, aliases)
    surfaces = residue.select(F.lower("mention").alias("m_l")).distinct()
    m_grams = surfaces.select(
        "m_l", F.explode(_char_ngrams(F.col("m_l"), n)).alias("gram"))
    m_sizes = m_grams.groupBy("m_l").agg(F.count(F.lit(1)).alias("m_n"))

    a = aliases.select(F.lower("alias").alias("alias_l"), "entity_id",
                       "canonical_name", "entity_type").distinct()
    a_grams = a.select(
        "alias_l", "entity_id", "canonical_name", "entity_type",
        F.explode(_char_ngrams(F.col("alias_l"), n)).alias("gram"))
    a_sizes = a_grams.groupBy("alias_l").agg(F.count(F.lit(1)).alias("a_n"))

    cand = (
        _minhash_bands(m_grams, "m_l", n_bands)
        .join(F.broadcast(_minhash_bands(
            a_grams.select("alias_l", "gram"), "alias_l", n_bands)),
            ["band", "band_hash"])
        .select("m_l", "alias_l")
        .distinct()
    )
    inter = (
        m_grams.join(cand, "m_l")
        .join(F.broadcast(a_grams), ["alias_l", "gram"])
        .groupBy("m_l", "alias_l", "entity_id", "canonical_name",
                 "entity_type")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    scored = (
        inter.join(m_sizes, "m_l").join(F.broadcast(a_sizes), "alias_l")
        .withColumn("jaccard",
                    F.col("inter")
                    / (F.col("m_n") + F.col("a_n") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
    )
    from pyspark.sql import Window
    w = Window.partitionBy("m_l").orderBy(
        F.col("jaccard").desc(), F.col("alias_l").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("m_l", "entity_id", "canonical_name", "entity_type")
    )
    return (
        residue.withColumn("m_l", F.lower("mention"))
        .join(F.broadcast(best), "m_l")
        .select("url", "sent_id", "mention", "type",
                "entity_id", "canonical_name", "entity_type")
    )


def link_mentions_with_fallback(mentions: DataFrame, aliases: DataFrame,
                                threshold: float = 0.6) -> DataFrame:
    """Dict-first ensemble: exact broadcast-join links plus fuzzy links
    for the residue, tagged by ``method`` — the coalesce order of the
    reference's lemma ensemble (dict hit wins; the expensive path only
    ever sees misses)."""
    exact = link_mentions(mentions, aliases).withColumn(
        "method", F.lit("exact"))
    fuzzy = fuzzy_link_mentions(mentions, aliases, threshold).withColumn(
        "method", F.lit("fuzzy"))
    return exact.unionByName(fuzzy)
