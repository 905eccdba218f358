"""Ssurgeon-analog dependency-graph rewriting — declarative edit rules
applied to the flat words table as pure DataFrame transforms.

The reference exposes graph surgery through a Java subprocess: Semgrex
matches select nodes/edges and Ssurgeon edits mutate them —
``relabelNamedEdge`` / ``setRoots`` / reattachment etc.
(/root/reference/stanza/server/ssurgeon.py — ``process_doc`` builds one
request per document and replaces each sentence's dependencies with the
edited graph).  Its KG-relevant use is patching SYSTEMATIC parse errors
before triple extraction (e.g. a parser that emits generic ``dep`` where
``obl`` belongs).

Here a rule is DATA — match predicates over one dependency arc plus an
optional child-of-dependent constraint — and application is a broadcast
join + conditional projection, so Catalyst plans the whole edit pass and
nothing is per-document:

* ``match_deprel``        — the arc label to match.
* ``child_rel``           — if set, the DEPENDENT must itself have a child
                            with this deprel (the "nominal with a case
                            marker" test used to recover obliques).
* ``dep_upos``            — if set, UPOS tags the dependent may carry.
* ``action='relabel'``    — set the arc's deprel to ``new_deprel``.
* ``action='reattach'``   — move the arc's head to the dependent's
                            GRANDPARENT (head of head) — the classic
                            Ssurgeon re-hang for mis-attached modifiers.

Rules apply IN ORDER, each over the previous rule's output (the reference
applies its edit list sequentially per match).  The output carries an
``ss_edited`` flag per word row so downstream stages (and lineage
metrics) can see exactly which arcs surgery touched.

Scale: each rule is one narrow self-join keyed on (url, sent_id) — the
same co-located key every KG stage shuffles on, so at 100 TB the edit
pass rides the words table's existing partitioning; no collect, no UDF.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F


@dataclass(frozen=True)
class SsurgeonRule:
    match_deprel: str
    child_rel: str | None = None
    dep_upos: tuple[str, ...] | None = None
    action: str = "relabel"          # 'relabel' | 'reattach'
    new_deprel: str | None = None

    def __post_init__(self):
        if self.action not in ("relabel", "reattach"):
            raise ValueError(f"ssurgeon: unknown action {self.action!r}")
        if self.action == "relabel" and not self.new_deprel:
            raise ValueError("ssurgeon: relabel requires new_deprel")


def apply_ssurgeon(words: DataFrame,
                   rules: list[SsurgeonRule]) -> DataFrame:
    """words (url, sent_id, word_id, head, deprel, upos, ...) -> the same
    table with every rule applied in order and an ``ss_edited`` boolean
    marking rows any rule touched."""
    out = words.withColumn("ss_edited", F.lit(False))
    for rule in rules:
        hit = F.col("deprel") == rule.match_deprel
        if rule.dep_upos is not None:
            hit = hit & F.col("upos").isin(*rule.dep_upos)
        if rule.child_rel is not None:
            kids = (out.filter(F.col("deprel") == rule.child_rel)
                    .select("url", "sent_id",
                            F.col("head").alias("word_id"))
                    .distinct().withColumn("_kid", F.lit(True)))
            out = out.join(kids, ["url", "sent_id", "word_id"], "left")
            hit = hit & F.col("_kid").isNotNull()
        # materialize the match BEFORE mutating the columns it reads —
        # otherwise a relabel would un-match its own rows when ss_edited
        # is computed afterwards
        out = out.withColumn("_hit", hit)
        if rule.action == "relabel":
            out = out.withColumn(
                "deprel",
                F.when(F.col("_hit"), F.lit(rule.new_deprel))
                .otherwise(F.col("deprel")))
        else:                                    # reattach to grandparent
            gp = out.select("url", "sent_id",
                            F.col("word_id").alias("head"),
                            F.col("head").alias("_gp_head"))
            out = (out.join(gp, ["url", "sent_id", "head"], "left")
                   .withColumn(
                       "head",
                       F.when(F.col("_hit") & F.col("_gp_head").isNotNull(),
                              F.col("_gp_head")).otherwise(F.col("head")))
                   .drop("_gp_head"))
        out = (out.withColumn("ss_edited", F.col("ss_edited") | F.col("_hit"))
               .drop("_hit"))
        if rule.child_rel is not None:
            out = out.drop("_kid")
    return out
