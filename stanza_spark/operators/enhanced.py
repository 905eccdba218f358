"""Enhanced dependencies (SURVEY gap item: doc.py:543-596,1543-1596): the
UD enhanced-graph augmentation, expressed relationally.

The reference stores per-word enhanced heads as a ``deps`` string
(``head:rel|...``, Word.deps, doc.py:1543-1596) whose most common
enrichment is the case-marker suffix on obliques/nominal modifiers
(``obl:in``, ``nmod:of``).  Here:

* ``with_enhanced_deps(words)`` adds that ``deps`` column: one self-join
  per sentence key attaching each obl/nmod head's case-child lemma
  (exactly one exchange, on the (url, sent_id) key every annotation join
  already uses);
* ``enhanced_obl_edges(words)`` projects the enriched oblique edges
  (verb lemma, oblique head word, obl:<case>) — the gate surface checked
  against the grammar oracle (kg_enhanced_deps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _case_children(words: DataFrame) -> DataFrame:
    return (
        words.filter(F.col("deprel") == "case")
        .groupBy("url", "sent_id", F.col("head").alias("word_id"))
        .agg(F.min(F.lower("lemma")).alias("case_lemma"))
    )


def with_enhanced_deps(words: DataFrame) -> DataFrame:
    """words -> + ``deps`` column (``head:rel`` with case-suffixed
    obl/nmod), the Word.deps analog."""
    cases = _case_children(words)
    rel = F.when(
        F.col("deprel").isin("obl", "nmod") & F.col("case_lemma").isNotNull(),
        F.concat(F.col("deprel"), F.lit(":"), F.col("case_lemma")),
    ).otherwise(F.col("deprel"))
    return (
        words.join(cases, ["url", "sent_id", "word_id"], "left")
        .withColumn("deps",
                    F.concat(F.col("head").cast("string"), F.lit(":"), rel))
        .drop("case_lemma")
    )


def enhanced_obl_edges(words: DataFrame) -> DataFrame:
    """-> (url, sent_id, pred, obl_head, rel): every case-enriched
    oblique edge hanging off a verb root."""
    obl = words.filter(F.col("deprel") == "obl").select(
        "url", "sent_id", "word_id",
        F.col("text").alias("obl_head"), F.col("head").alias("verb_id"))
    cases = _case_children(words)
    verbs = words.filter(F.col("upos") == "VERB").select(
        "url", "sent_id", F.col("word_id").alias("verb_id"),
        F.col("lemma").alias("pred"))
    return (
        obl.join(cases, ["url", "sent_id", "word_id"])
        .join(verbs, ["url", "sent_id", "verb_id"])
        .select("url", "sent_id", "pred", "obl_head",
                F.concat(F.lit("obl:"), F.col("case_lemma")).alias("rel"))
    )
