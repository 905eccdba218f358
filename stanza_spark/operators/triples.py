"""OpenIE-style triple extraction from dependency arcs — pure Spark SQL
self-joins, no UDF (operator C2, SURVEY §2.3).

The reference's analog is Semgrex patterns run in a Java subprocess per
document (/root/reference/stanza/server/semgrex.py:53-102, default pattern
``{}=source >obj=zzz {}=target``); here the same dependency patterns are
relational joins over the flat words table, so Catalyst plans them and there
is no per-document IPC at all.

Pattern (anchored to the reference golden parse
`Obama --nsubj--> attended <--obj-- Harvard` =>
``(Obama, attend, Harvard)``, test_english_pipeline.py:66-87):

* predicate: any VERB ``v``; pred = lemma(v) (lemma normalization = op 16).
* subject:   child of ``v`` with deprel nsubj | nsubj:pass.
* object:    highest-priority child among obj > xcomp > obl (ties: word
  order) — the first obl is e.g. ``moved to *Tokyo* in 1999``.
* argument spans expand over ``flat`` children (``Barack <-flat- Obama``),
  joined in surface order.
* types: a span that exactly covers a NER mention inherits its type.

Every join keys on (url, sent_id): AQE reuses the one exchange, and the
arity of each side is O(words).  At 100 TB the words table is pre-hashed on
url so all five joins co-locate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, functions as F, Window


@dataclass(frozen=True)
class DepPattern:
    """Declarative dependency-pattern spec — the Semgrex-analog surface.

    The reference exposes user-definable dependency patterns (semgrex.py:193,
    default ``{}=source >obj=zzz {}=target``; engine :53-102) run in a Java
    subprocess per document.  Here the pattern is DATA compiled onto the
    same relational self-joins Catalyst already plans: a user wanting
    ``(X, advise, Y)`` from an ``nmod`` arc passes
    ``DepPattern(obj_rels=("nmod",))`` instead of editing operator source.

    * ``pred_upos``   — UPOS tags a predicate node may carry.
    * ``pred_from``   — which word column becomes the relation surface
                        (``lemma`` = normalized, ``text`` = literal).
    * ``subj_rels``   — child deprels that qualify as the source argument.
    * ``obj_rels``    — child deprels that qualify as the target argument,
                        PRIORITY = listed order (ties: word order).
    * ``expand_rels`` — child deprels folded into the argument's surface
                        span (multiword names etc.).
    """

    pred_upos: tuple[str, ...] = ("VERB",)
    pred_from: str = "lemma"
    subj_rels: tuple[str, ...] = ("nsubj", "nsubj:pass")
    obj_rels: tuple[str, ...] = ("obj", "xcomp", "obl")
    expand_rels: tuple[str, ...] = ("flat",)

    @classmethod
    def from_semgrex(cls, pattern: str) -> "DepPattern":
        """Parse the reference's textual Semgrex shape into a DepPattern.

        Supported subset (the KG-extraction shape, semgrex.py:193):

            {upos:VERB}=pred >nsubj|nsubj:pass=subj {} >obl=obj {}

        * the first node is the predicate; ``{attr:V1|V2}`` constrains its
          UPOS (bare ``{}`` keeps the VERB default);
        * each ``>rels=name {}`` clause is a child arc — relation
          alternatives separated by ``|``; the clause named ``subj`` sets
          subj_rels, ``obj`` sets obj_rels (priority = listed order);
        * an optional ``>rels=expand {}`` clause overrides the span
          expansion labels (default flat).
        """
        import re as _re

        head = _re.match(r"\s*\{([^}]*)\}=(\w+)", pattern)
        if not head:
            raise ValueError(f"semgrex: missing head node in {pattern!r}")
        attrs, _name = head.groups()
        kwargs = {}
        m = _re.search(r"upos:([\w|]+)", attrs)
        if m:
            kwargs["pred_upos"] = tuple(m.group(1).split("|"))
        for rels, name in _re.findall(r">([\w:|]+)=(\w+)\s*\{\s*\}",
                                      pattern[head.end():]):
            parts = tuple(rels.split("|"))
            if name == "subj":
                kwargs["subj_rels"] = parts
            elif name == "obj":
                kwargs["obj_rels"] = parts
            elif name == "expand":
                kwargs["expand_rels"] = parts
            else:
                raise ValueError(f"semgrex: unknown clause =<{name}> "
                                 f"(expected subj/obj/expand)")
        return cls(**kwargs)


#: ``{}=source >nsubj {} >obj|xcomp|obl=prio {}=target`` — the reference's
#: default OpenIE shape (semgrex.py:193 generalized per SURVEY §2.3).
DEFAULT_PATTERN = DepPattern()

#: Oblique-only relations: ``(X, pred, obl-arg)`` — the non-default gate
#: proving patterns are user-switchable data (kg_triples_pattern).
OBL_PATTERN = DepPattern(obj_rels=("obl",))


def spans(words: DataFrame,
          expand_rels: tuple[str, ...] = ("flat",)) -> DataFrame:
    """Span-head rows with flat-expanded surface text.

    -> (url, sent_id, word_id, span_text, last_word_id)
    """
    flats = (
        words.filter(F.col("deprel").isin(*expand_rels))
        .groupBy("url", "sent_id", F.col("head").alias("word_id"))
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("word_id", "text"))),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("flat_text"),
            F.max("word_id").alias("flat_last"),
        )
    )
    heads = words.filter(~F.col("deprel").isin(*expand_rels)).select(
        "url", "sent_id", "word_id", "text"
    )
    return (
        heads.join(flats, ["url", "sent_id", "word_id"], "left")
        .select(
            "url", "sent_id", "word_id",
            F.when(
                F.col("flat_text").isNotNull(),
                F.concat_ws(" ", F.col("text"), F.col("flat_text")),
            ).otherwise(F.col("text")).alias("span_text"),
            F.coalesce("flat_last", "word_id").alias("last_word_id"),
        )
    )


def extract_triples_multi(words: DataFrame,
                          patterns: dict[str, DepPattern],
                          mentions: DataFrame | None = None) -> DataFrame:
    """Run a NAMED LIST of dependency patterns in one job — the reference
    Semgrex surface processes pattern lists per request (semgrex.py:53-102
    iterates patterns); here each pattern's self-join plan is unioned with
    a ``pattern`` label column.  Catalyst still plans each branch
    independently (shared words-table scan, AQE exchange reuse), so k
    patterns cost at most k narrow join fans over one cached input —
    never k corpus scans at 100 TB when ``words`` is checkpointed."""
    out = None
    for name, pat in patterns.items():
        t = extract_triples(words, mentions, pattern=pat) \
            .withColumn("pattern", F.lit(name))
        out = t if out is None else out.unionByName(t)
    if out is None:
        raise ValueError("extract_triples_multi: empty pattern dict")
    return out


def extract_triples(words: DataFrame, mentions: DataFrame | None = None,
                    pattern: DepPattern = DEFAULT_PATTERN) -> DataFrame:
    """words (+ optional decoded mentions for typing) ->
    (url, sent_id, subj, pred, obj, subj_type, obj_type).

    ``pattern`` compiles a user-declared :class:`DepPattern` onto the
    self-joins — the default reproduces the reference's OpenIE shape."""
    verbs = words.filter(F.col("upos").isin(*pattern.pred_upos)).select(
        "url", "sent_id", F.col("word_id").alias("v_id"),
        F.col(pattern.pred_from).alias("pred"),
    )
    subj = words.filter(F.col("deprel").isin(*pattern.subj_rels)).select(
        "url", "sent_id", F.col("head").alias("v_id"),
        F.col("word_id").alias("s_id"),
    )
    prio = F.lit(len(pattern.obj_rels) + 1)
    for rank in range(len(pattern.obj_rels) - 1, -1, -1):
        prio = F.when(F.col("deprel") == pattern.obj_rels[rank],
                      rank + 1).otherwise(prio)
    objc = (
        words.filter(F.col("deprel").isin(*pattern.obj_rels))
        .select(
            "url", "sent_id", F.col("head").alias("v_id"),
            F.col("word_id").alias("o_id"),
            prio.alias("prio"),
        )
    )
    w = Window.partitionBy("url", "sent_id", "v_id").orderBy("prio", "o_id")
    best_obj = (
        objc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "prio")
    )

    sp = spans(words, pattern.expand_rels)

    t = (
        verbs
        .join(subj, ["url", "sent_id", "v_id"])
        .join(best_obj, ["url", "sent_id", "v_id"])
        .join(
            sp.select("url", "sent_id",
                      F.col("word_id").alias("s_id"),
                      F.col("span_text").alias("subj"),
                      F.col("last_word_id").alias("s_last")),
            ["url", "sent_id", "s_id"],
        )
        .join(
            sp.select("url", "sent_id",
                      F.col("word_id").alias("o_id"),
                      F.col("span_text").alias("obj"),
                      F.col("last_word_id").alias("o_last")),
            ["url", "sent_id", "o_id"],
        )
    )

    if mentions is None:
        return t.select("url", "sent_id", "subj", "pred", "obj")

    ms_subj = mentions.select(
        "url", "sent_id",
        F.col("first_word_id").alias("s_id"),
        F.col("last_word_id").alias("s_last"),
        F.col("type").alias("subj_type"),
    )
    ms_obj = mentions.select(
        "url", "sent_id",
        F.col("first_word_id").alias("o_id"),
        F.col("last_word_id").alias("o_last"),
        F.col("type").alias("obj_type"),
    )
    t = t.join(ms_subj, ["url", "sent_id", "s_id", "s_last"], "left")
    t = t.join(ms_obj, ["url", "sent_id", "o_id", "o_last"], "left")
    return t.select("url", "sent_id", "subj", "pred", "obj",
                    "subj_type", "obj_type")
