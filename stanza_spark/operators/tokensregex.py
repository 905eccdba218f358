"""TokensRegex-analog surface pattern matching — token-sequence patterns
(attribute predicates + bounded quantifiers) compiled onto window leads
over the words table, pure Catalyst.

The reference runs CoreNLP TokensRegex in a Java subprocess per request
(/root/reference/stanza/server/tokensregex.py — one
``TokensRegexRequest`` per document, patterns like
``([ner: PERSON]+) /wrote/ /an?/ /article/``).  Here the bracketed-token
pattern is DATA: each ``[{...}]`` step is a conjunction of attribute
predicates, a ``{m,n}`` quantifier bounds its repetitions, and matching
compiles to ONE projection with ``lead()`` columns over the per-sentence
window plus a union of fixed-length filters — every concrete repetition
assignment is a filter over the same lead columns, so Catalyst plans the
whole pattern family as a single window pass (no per-document IPC, no
Python in the hot path).

Semantics: ALL matches are emitted — every (start, assignment) whose
positions satisfy the step predicates yields a row (CoreNLP's findall
over all sub-lengths; overlapping and nested matches included).  Matches
never cross sentence boundaries (the window is keyed by url, sent_id).

Supported bounded subset of the textual surface:

    [{lower:/in|at|to/}] [{upos:PROPN}]{1,2} [{word:/[0-9]{4}/}]

* ``lower:/a|b/``  — lowercased surface in the alternation set;
* ``word:/re/``    — whole-token regex on the raw surface;
* ``upos:A|B``     — UPOS tag in the set;
* ``{m,n}``        — the step repeats m..n times (default exactly 1);
* attributes inside one ``[{...}]`` conjoin.

Anything outside this subset raises — unsupported syntax fails loudly.

Scale: the window partitions by (url, sent_id) — per-sentence keys,
bounded fan-in, no skew; total pattern length is capped (MAX_PATTERN_LEN)
so the lead-column count is static and small.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from itertools import product

from pyspark.sql import Column, DataFrame, Window, functions as F

#: cap on the total concrete length of a pattern (sum of max repetitions)
#: — bounds the number of lead() columns the compiled plan materializes.
MAX_PATTERN_LEN = 8


@dataclass(frozen=True)
class TokenPred:
    lower: tuple[str, ...] | None = None
    word_re: str | None = None
    upos: tuple[str, ...] | None = None
    #: entity types — matches any BIOES-tagged token of these types
    #: (CoreNLP's ``[ner: PERSON]`` attribute)
    ner: tuple[str, ...] | None = None

    def to_column(self, text: Column, upos: Column,
                  ner: Column | None = None) -> Column:
        conds = [text.isNotNull()]
        if self.lower is not None:
            conds.append(F.lower(text).isin(*self.lower))
        if self.word_re is not None:
            # whole-token anchored, like TokensRegex /re/ token matching
            conds.append(text.rlike(f"^(?:{self.word_re})$"))
        if self.upos is not None:
            conds.append(upos.isin(*self.upos))
        if self.ner is not None:
            if ner is None:
                raise ValueError(
                    "tokensregex: pattern uses a ner: attribute but the "
                    "words table has no `ner` column (run the ner "
                    "processor)")
            types = "|".join(self.ner)
            conds.append(ner.rlike(f"^[BIES]-(?:{types})$"))
        out = conds[0]
        for c in conds[1:]:
            out = out & c
        return out


@dataclass(frozen=True)
class TokenSeqPattern:
    #: (predicate, min_reps, max_reps) per step
    steps: tuple[tuple[TokenPred, int, int], ...]

    @property
    def max_len(self) -> int:
        return sum(hi for _, _, hi in self.steps)

    @classmethod
    def parse(cls, pattern: str) -> "TokenSeqPattern":
        """Parse the bracketed-token textual surface (subset above)."""
        # step body = everything up to the first '}]' — a '}' not
        # followed by ']' stays inside the body, so attribute regexes may
        # contain braces ('[0-9]{4}'); the literal sequence '}]' inside a
        # regex is the one thing the bounded subset cannot express.
        step_re = re.compile(
            r"\s*\[\{((?:[^}]|\}(?!\]))*)\}\]\s*(?:\{(\d+),(\d+)\})?")
        attr_re = re.compile(
            r"\s*(lower|word):/((?:[^/\\]|\\.)*)/\s*(?:,|$)"
            r"|\s*(upos|ner):([\w|]+)\s*(?:,|$)")
        steps = []
        pos = 0
        while pos < len(pattern.rstrip()):
            m = step_re.match(pattern, pos)
            if not m:
                raise ValueError(
                    f"tokensregex: unsupported syntax at {pattern[pos:]!r}")
            pos = m.end()
            attrs, lo, hi = m.group(1), m.group(2), m.group(3)
            lo, hi = (int(lo), int(hi)) if lo is not None else (1, 1)
            if not (0 < lo <= hi):
                raise ValueError(f"tokensregex: bad quantifier {{{lo},{hi}}}")
            kw: dict = {}
            apos = 0
            while attrs[apos:].strip():
                am = attr_re.match(attrs, apos)
                if not am:
                    raise ValueError(
                        f"tokensregex: unsupported attribute at "
                        f"{attrs[apos:]!r}")
                apos = am.end()
                if am.group(1) == "lower":
                    kw["lower"] = tuple(am.group(2).split("|"))
                elif am.group(1) == "word":
                    kw["word_re"] = am.group(2)
                else:
                    kw[am.group(3)] = tuple(am.group(4).split("|"))
            if not kw:
                raise ValueError("tokensregex: empty token predicate [{}]")
            steps.append((TokenPred(**kw), lo, hi))
        if not steps:
            raise ValueError("tokensregex: empty pattern")
        pat = cls(steps=tuple(steps))
        if pat.max_len > MAX_PATTERN_LEN:
            raise ValueError(
                f"tokensregex: pattern max length {pat.max_len} exceeds "
                f"cap {MAX_PATTERN_LEN}")
        return pat


def _assignments(pattern: TokenSeqPattern):
    """Every concrete repetition count vector (one int per step)."""
    return product(*(range(lo, hi + 1) for _, lo, hi in pattern.steps))


def match_token_pattern(words: DataFrame, pattern: TokenSeqPattern | str,
                        label: str | None = None) -> DataFrame:
    """words (url, sent_id, word_id, text, upos) ->
    (url, sent_id[, pattern], first_word_id, n_tokens, matched).

    One window pass computes text/upos leads up to the pattern's max
    length; each concrete repetition assignment contributes a fixed-length
    filter over those leads (unioned — all projections of the SAME lead
    table, so the corpus is scanned once)."""
    if isinstance(pattern, str):
        pattern = TokenSeqPattern.parse(pattern)
    L = pattern.max_len
    uses_ner = any(p.ner is not None for p, _lo, _hi in pattern.steps)
    if uses_ner and "ner" not in words.columns:
        raise ValueError(
            "tokensregex: pattern uses a ner: attribute but the words "
            "table has no `ner` column (run the ner processor)")
    win = Window.partitionBy("url", "sent_id").orderBy("word_id")
    cols = [F.col("text").alias("t0"), F.col("upos").alias("u0")]
    cols += [c for j in range(1, L)
             for c in (F.lead("text", j).over(win).alias(f"t{j}"),
                       F.lead("upos", j).over(win).alias(f"u{j}"))]
    if uses_ner:
        cols.append(F.col("ner").alias("n0"))
        cols += [F.lead("ner", j).over(win).alias(f"n{j}")
                 for j in range(1, L)]
    base = words.select("url", "sent_id", "word_id", *cols)

    out = None
    seen: set[tuple] = set()
    for reps in _assignments(pattern):
        # adjacent steps with identical predicates make distinct count
        # vectors (e.g. (1,2) vs (2,1)) compile to the SAME concrete
        # predicate sequence — dedupe on it, or the union emits duplicate
        # rows for one (start, length) match
        concrete = tuple(p for (p, _lo, _hi), r in zip(pattern.steps, reps)
                         for _ in range(r))
        if concrete in seen:
            continue
        seen.add(concrete)
        n = sum(reps)
        cond = F.lit(True)
        j = 0
        for (pred, _lo, _hi), r in zip(pattern.steps, reps):
            for _ in range(r):
                cond = cond & pred.to_column(
                    F.col(f"t{j}"), F.col(f"u{j}"),
                    F.col(f"n{j}") if uses_ner else None)
                j += 1
        sel = base.filter(cond).select(
            "url", "sent_id",
            *([F.lit(label).alias("pattern")] if label is not None else []),
            F.col("word_id").alias("first_word_id"),
            F.lit(n).alias("n_tokens"),
            F.concat_ws(" ", *[F.col(f"t{j}") for j in range(n)])
            .alias("matched"))
        out = sel if out is None else out.unionByName(sel)
    return out


def match_token_patterns(words: DataFrame,
                         patterns: dict[str, TokenSeqPattern | str]
                         ) -> DataFrame:
    """Named pattern list in one job (the reference surface matches
    pattern lists per request) — union with a ``pattern`` label."""
    out = None
    for name, pat in patterns.items():
        m = match_token_pattern(words, pat, label=name)
        out = m if out is None else out.unionByName(m)
    if out is None:
        raise ValueError("match_token_patterns: empty pattern dict")
    return out
