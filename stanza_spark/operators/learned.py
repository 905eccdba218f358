"""Learned-scorer decode: committed weight tables driving the generic
Viterbi + Chu-Liu/Edmonds kernels (operators.decode) END-TO-END — no
grammar anywhere in the path.

The reference's neural models produce score matrices that feed exactly
these decoders (depparse/model.py:260-275 -> chuliu_edmonds;
ner/model.py crf -> viterbi).  decode.py accepts arbitrary matrices; this
module proves the claim with a REAL non-grammar scorer: a tiny
deterministic weight table (tag-emission log-weights per word shape, tag
transition log-weights, tag-pair arc affinities with distance decay).
The pipeline is tagger -> parser: Viterbi tags under the emission/
transition tables, then MST heads under arc scores computed FROM THE
PREDICTED TAGS — so every output value derives from the weights alone.

The kg_learned_decode gate runs this over a twin corpus of fixed token
patterns (one per doc_id mod NPAT, several deliberately OUT of the en
grammar: no determiner, no verb, double verb).  The DuckDB oracle splices
in per-pattern constants computed by ``expected_analysis`` — i.e. by the
same weight tables — and tests/test_learned.py brute-forces every pattern
(all tag sequences, all single-root trees) to certify those constants are
truly the weight-optimal analyses, not decoder artifacts.

Arc weights here are POSITIVE reals (trained-count flavor), exercising
mst_single_root's arbitrary-score path (the r3 advice fix) in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from .decode import mst_single_root, viterbi_decode

# ---------------------------------------------------------------------------
# The committed "model": log-ish weights (pretend MLE counts from a tiny
# treebank).  TAGS is the closed tag set; OOV words emit the UNK row.
# ---------------------------------------------------------------------------

TAGS = ("DET", "NOUN", "VERB", "ADJ", "PUNCT")
_T = {t: i for i, t in enumerate(TAGS)}

# word -> per-tag emission log-weights; ambiguous entries ("saw" NOUN vs
# VERB, "old" ADJ vs NOUN) are decided by the transition context, the
# behavior a per-token argmax cannot reproduce.
EMIT_W = {
    "the":    {"DET": 0.0},
    "a":      {"DET": 0.0},
    "cat":    {"NOUN": 0.0},
    "dog":    {"NOUN": 0.0},
    "man":    {"NOUN": 0.0},
    "rust":   {"NOUN": 0.0},
    "saw":    {"NOUN": -0.9, "VERB": -0.5},
    "old":    {"ADJ": -0.4, "NOUN": -1.1},
    "chased": {"VERB": 0.0},
    "ran":    {"VERB": 0.0},
    ".":      {"PUNCT": 0.0},
}
_EMIT_FLOOR = -8.0

# tag -> tag transition log-weights (row = previous tag)
TRANS_W = np.array([
    #  DET   NOUN  VERB   ADJ  PUNCT
    [-6.0,  -0.2, -6.0,  -1.0, -6.0],   # DET  ->
    [-2.0,  -1.5, -0.4,  -3.0, -0.7],   # NOUN ->
    [-0.5,  -1.0, -2.5,  -2.0, -1.2],   # VERB ->
    [-6.0,  -0.2, -4.0,  -2.5, -4.0],   # ADJ  ->
    [-3.0,  -3.0, -3.0,  -3.0, -3.0],   # PUNCT->
])
INIT_W = np.array([-0.3, -1.0, -2.0, -1.5, -5.0])

# (dep_tag, head_tag) arc affinity; attachment likelihoods a parser would
# learn.  POSITIVE scale on purpose (see module docstring).
ARC_W = np.array([
    #  DET   NOUN  VERB   ADJ  PUNCT      dep v / head >
    [ 0.2,   2.6,  0.4,   0.9,  0.0],    # DET
    [ 0.1,   0.8,  2.4,   0.3,  0.0],    # NOUN
    [ 0.0,   0.3,  0.5,   0.0,  0.0],    # VERB
    [ 0.1,   2.3,  0.4,   0.2,  0.0],    # ADJ
    [ 0.0,   0.6,  1.2,   0.1,  0.0],    # PUNCT
])
ROOT_W = np.array([0.0, 0.9, 2.0, 0.2, 0.0])   # dep tag -> ROOT affinity
DIST_DECAY = 0.35                               # per extra token of distance


def emissions(tokens: list[str]) -> np.ndarray:
    """(T × |TAGS|) emission log-weights for a token sequence; position 0
    folds in the start-of-sentence weights (viterbi_decode has no
    separate init vector)."""
    em = np.full((len(tokens), len(TAGS)), _EMIT_FLOOR)
    for i, tok in enumerate(tokens):
        for tag, w in EMIT_W.get(tok.lower(), {}).items():
            em[i, _T[tag]] = w
    em[0] += INIT_W
    return em


def tag_tokens(tokens: list[str]) -> list[str]:
    """Viterbi-decoded tag sequence under the committed tables."""
    path, _score = viterbi_decode(emissions(tokens), TRANS_W)
    return [TAGS[i] for i in path]


def arc_scores(tags: list[str]) -> np.ndarray:
    """(n+1)² arc score matrix over the PREDICTED tags: row = dependent,
    col = head, index 0 = ROOT; ARC_W affinity minus linear distance
    decay.  Row 0 is -inf except the diagonal convention the kernel
    expects (it ignores ROOT's row)."""
    n = len(tags)
    s = np.full((n + 1, n + 1), -np.inf)
    for dep in range(1, n + 1):
        dt = _T[tags[dep - 1]]
        s[dep, 0] = ROOT_W[dt]
        for head in range(1, n + 1):
            if head == dep:
                continue
            s[dep, head] = (ARC_W[dt, _T[tags[head - 1]]]
                            - DIST_DECAY * (abs(dep - head) - 1))
    return s


def analyze_tokens(tokens: list[str]) -> tuple[list[str], list[int]]:
    """tokens -> (tags, heads): the full learned pipeline, weights only."""
    tags = tag_tokens(tokens)
    heads = [int(h) for h in mst_single_root(arc_scores(tags))[1:]]
    return tags, heads


# ---------------------------------------------------------------------------
# The twin corpus: fixed token patterns, several outside the en grammar.
# ---------------------------------------------------------------------------

PATTERNS = [
    ["the", "cat", "chased", "the", "dog", "."],
    ["the", "old", "man", "saw", "a", "dog"],   # ambiguous saw/old
    ["a", "man", "saw", "the", "cat", "."],
    ["cat", "saw", "dog", "."],                 # no determiners
    ["the", "old", "rust", "."],                # NO verb (out of grammar)
    ["chased", "ran", "."],                     # DOUBLE verb (out of grammar)
]


def expected_analysis(pid: int) -> tuple[list[str], list[str], list[int]]:
    """(tokens, tags, heads) for one pattern — derived from the weight
    tables via the kernels; brute-force-certified in tests/test_learned.py
    and spliced into the DuckDB oracle as constants."""
    toks = PATTERNS[pid]
    tags, heads = analyze_tokens(toks)
    return toks, tags, heads


SCHEMA = ("url string, sent_id int, word_id int, word string, "
          "tag string, head int")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # only len(PATTERNS) distinct inputs exist — decode each ONCE per
    # worker (executor-local memo; the corpus maps doc -> pattern_id, and
    # re-running the trellis + MST per row would be pure wasted CPU)
    memo: dict[int, tuple] = {}
    for pdf in batches:
        rows = []
        for url, pid in zip(pdf["url"], pdf["pattern_id"]):
            pid = int(pid)
            if pid not in memo:
                toks = PATTERNS[pid]
                memo[pid] = (toks, *analyze_tokens(toks))
            toks, tags, heads = memo[pid]
            rows.extend((url, 0, i + 1, toks[i], tags[i], heads[i])
                        for i in range(len(toks)))
        yield pd.DataFrame(rows, columns=["url", "sent_id", "word_id",
                                          "word", "tag", "head"])


def learned_decode(corpus: DataFrame) -> DataFrame:
    """(url, pattern_id) -> per-word (url, sent_id, word_id, word, tag,
    head) via the learned tagger+parser in ONE narrow Arrow pass — the
    same zero-shuffle physical shape as triples_narrow."""
    return corpus.select("url", "pattern_id").mapInPandas(
        _decode_batches, schema=SCHEMA)
