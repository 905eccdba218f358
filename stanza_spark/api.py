"""User-facing Pipeline facade: the drop-in surface for a reference user
(`nlp = Pipeline(...); doc_df = nlp(text)`), mapped onto the Spark-native
engine.

Mirrors the reference's construction-time plan validation
(/root/reference/stanza/pipeline/core.py:178-347): the processor list is
topologically ordered by PIPELINE_NAMES, each processor's ``requires`` set
must be provided by an earlier one (processor.py:100-157), and a violation
raises PipelineRequirementsException *before* any execution — the static
DAG check happening before Catalyst ever sees a plan.

Execution is columnar: every requested processor's annotations are columns
of the returned words DataFrame.  The configured processor set is threaded
INTO the Arrow annotator (annotate_sentences ``processors``), so
unrequested stages genuinely never execute — a tokenize-only pipeline pays
no NER/depparse Python time, and without 'mwt' a contraction stays one
word row, exactly like a reference pipeline that never loaded those
models (reference contract: row counts match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# execution order (reference PIPELINE_NAMES, core.py:22-31 + registry)
PIPELINE_NAMES = ["tokenize", "mwt", "pos", "lemma", "constituency",
                  "coref", "depparse", "sentiment", "ner", "morphseg"]

REQUIRES = {
    "tokenize": set(),
    "mwt": {"tokenize"},
    "pos": {"tokenize"},
    "lemma": {"tokenize"},
    "constituency": {"tokenize", "pos"},
    "coref": {"tokenize"},
    "depparse": {"tokenize", "pos", "lemma"},
    "sentiment": {"tokenize"},
    "ner": {"tokenize"},
    "morphseg": {"tokenize"},
}

class PipelineRequirementsException(Exception):
    pass


class Pipeline:
    """stanza.Pipeline analog over Spark.

    >>> nlp = Pipeline(spark, processors="tokenize,pos,lemma")
    >>> words_df = nlp("Barack Obama was born in Hawaii.")
    """

    def __init__(self, spark: SparkSession,
                 processors: str = "tokenize,mwt,pos,lemma,depparse,ner",
                 lang: str = "en", pretokenized: bool = False,
                 no_ssplit: bool = False, decoder: str = "grammar"):
        if decoder not in ("grammar", "mst"):
            raise ValueError(f"unknown decoder: {decoder!r}")
        self.spark = spark
        self.lang = lang
        self.pretokenized = pretokenized
        self.no_ssplit = no_ssplit
        # 'mst' = general decode kernels (Chu-Liu/Edmonds + Viterbi) in
        # place of the fixed grammars — the semantics-complete path
        self.decoder = decoder
        names = [p.strip() for p in processors.split(",") if p.strip()]
        unknown = [p for p in names if p not in PIPELINE_NAMES]
        if unknown:
            raise ValueError(f"unknown processors: {unknown}")
        # topo-order by the canonical pipeline order (common.py:169-185)
        self.processors = [p for p in PIPELINE_NAMES if p in names]
        provided: set[str] = set()
        for p in self.processors:
            missing = REQUIRES[p] - provided
            if missing:
                raise PipelineRequirementsException(
                    f"processor {p!r} requires {sorted(missing)} but the "
                    f"pipeline only provides {sorted(provided)}")
            provided.add(p)

    # -- execution ---------------------------------------------------------

    def _pages(self, docs) -> DataFrame:
        if isinstance(docs, DataFrame):
            return docs
        if isinstance(docs, str):
            docs = [docs]
        return self.spark.createDataFrame(
            [(f"doc{i}", self.lang, t) for i, t in enumerate(docs)],
            "url string, lang string, text string")

    def process(self, docs) -> DataFrame:
        """str | list[str] | pages DataFrame -> words DataFrame with the
        configured processors' columns (unrequested stages are skipped
        inside the UDF, not computed-and-nulled)."""
        from .operators.annotate import annotate
        variant = ("pretokenized" if self.pretokenized
                   else "no_ssplit" if self.no_ssplit else None)
        pages = self._pages(docs)
        # bind to locals: the foreachBatch/mapInPandas closures must not
        # capture `self` (it holds the SparkSession — unpicklable on
        # workers, SPARK-5063)
        procs = self.processors
        dec = self.decoder
        if variant == "pretokenized":
            w = annotate(pages, en_only=False, pretokenized=True,
                         processors=procs, decoder=self.decoder)
        elif variant == "no_ssplit":
            # route through the registered variant
            from .operators import annotate as A

            def batches(it):
                import pandas as pd
                for pdf in it:
                    out = []
                    for url, lng, text in zip(pdf["url"], pdf["lang"],
                                              pdf["text"]):
                        for sid, ss, se, words in A.annotate_sentences(
                                text, variant="no_ssplit",
                                processors=procs, decoder=dec):
                            for wi, wd in enumerate(words):
                                out.append((url, lng, sid, ss, se,
                                            wd["token_id"], wi + 1,
                                            wd["is_mwt"], wd["text"],
                                            wd["start"], wd["end"],
                                            wd["upos"], wd["xpos"],
                                            wd["feats"], wd["lemma"],
                                            wd["head"], wd["deprel"],
                                            wd["ner"]))
                    yield pd.DataFrame(out, columns=A.WORD_COLUMNS)

            w = pages.select("url", "lang", "text").mapInPandas(
                batches, schema=A.WORDS_SCHEMA)
        else:
            w = annotate(pages, en_only=False, processors=procs,
                         decoder=self.decoder)
        if "morphseg" in self.processors:
            from .operators.morphseg import segment_words
            w = segment_words(w)
        return w

    __call__ = process

    def bulk_process(self, texts: list[str]) -> DataFrame:
        return self.process(list(texts))

    def triples(self, docs, pattern=None) -> DataFrame:
        """Dependency-pattern triple extraction from the facade — the
        reference's Semgrex entry point (semgrex.py:193).  ``pattern``
        accepts a :class:`~stanza_spark.operators.triples.DepPattern`, a
        Semgrex-style string (parsed via ``DepPattern.from_semgrex``), or
        a name->pattern dict (multi-pattern run, output gains a
        ``pattern`` column)."""
        if "depparse" not in self.processors:
            raise PipelineRequirementsException(
                "triples requires the depparse processor")
        from .operators.mentions import decode_mentions
        from .operators.triples import (DEFAULT_PATTERN, DepPattern,
                                        extract_triples,
                                        extract_triples_multi)
        w = self.process(docs).localCheckpoint(eager=True)
        m = decode_mentions(w) if "ner" in self.processors else None
        if isinstance(pattern, dict):
            pats = {k: (DepPattern.from_semgrex(v) if isinstance(v, str)
                        else v) for k, v in pattern.items()}
            return extract_triples_multi(w, pats, m)
        if isinstance(pattern, str):
            pattern = DepPattern.from_semgrex(pattern)
        return extract_triples(w, m, pattern=pattern or DEFAULT_PATTERN)

    def conllu(self, text: str) -> str:
        """Reference {:C} rendering of one document (requires the full
        pipeline: golden-format comments need constituency+sentiment)."""
        from .sources.conllu import render_document
        return render_document(text)

    def semgrex(self, docs, pattern: str,
                uniq: bool = False) -> DataFrame:
        """General Semgrex matching with ARBITRARY named nodes — every
        named node becomes an output column (the reference names any
        node; triples() is the subj/obj special case).  One row per root
        binding satisfying every clause.  The full bounded grammar is
        :mod:`~stanza_spark.operators.semgrex` — nested relation chains
        to any depth, governor direction ``<``, bounded ``>>`` dominance,
        negation, relation regexes, optional ``?``-clauses; a bare
        ``{}`` root defaults to VERB here (the facade is verb-rooted
        like the reference's patterns).  ``uniq=True`` collapses
        duplicate output rows (the Semgrex CLI's uniq post-step)."""
        if "depparse" not in self.processors:
            raise PipelineRequirementsException(
                "semgrex requires the depparse processor")
        from .operators.triples import match_dep_pattern
        w = self.process(docs).localCheckpoint(eager=True)
        return match_dep_pattern(w, pattern, uniq=uniq)

    def ssurgeon(self, docs, rules) -> DataFrame:
        """Dependency-graph surgery from the facade — the reference's
        Ssurgeon entry point (stanza/server/ssurgeon.py) as declarative
        edit rules over the words DataFrame.  ``rules`` is a list of
        :class:`~stanza_spark.operators.ssurgeon.SsurgeonRule`; returns
        the rewritten words table with the ``ss_edited`` lineage flag."""
        if "depparse" not in self.processors:
            raise PipelineRequirementsException(
                "ssurgeon requires the depparse processor")
        from .operators.ssurgeon import apply_ssurgeon
        return apply_ssurgeon(self.process(docs), rules)

    def tsurgeon(self, docs, rules) -> DataFrame:
        """Constituency-tree surgery from the facade — the reference's
        Tsurgeon entry point (stanza/server/tsurgeon.py).  ``rules`` is
        a list of :class:`~stanza_spark.operators.tsurgeon.TsurgeonRule`;
        returns (url, sent_id, tree) with every rule applied."""
        if "constituency" not in self.processors and \
                "depparse" not in self.processors:
            raise PipelineRequirementsException(
                "tsurgeon requires the depparse processor (trees are "
                "derived from the dependency analysis)")
        from .operators.constituency import constituency_trees
        from .operators.tsurgeon import apply_tsurgeon
        return apply_tsurgeon(
            constituency_trees(self._pages(docs)), rules)

    def tokensregex(self, docs, patterns) -> DataFrame:
        """Token-sequence pattern matching from the facade — the
        reference's TokensRegex entry point (stanza/server/
        tokensregex.py).  ``patterns``: one pattern (string or
        TokenSeqPattern) or a name->pattern dict (output gains a
        ``pattern`` column); matches never cross sentence bounds."""
        from .operators.tokensregex import (match_token_pattern,
                                            match_token_patterns)
        cols = ["url", "sent_id", "word_id", "text", "upos"]
        if "ner" in self.processors:
            cols.append("ner")      # enables [{ner:PERSON}] attributes
        w = self.process(docs).select(*cols)
        if isinstance(patterns, dict):
            return match_token_patterns(w, patterns)
        return match_token_pattern(w, patterns)
