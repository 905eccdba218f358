"""Evaluation harnesses for the north-rule metrics.

* ``triple_pr`` — set-level precision/recall of extracted (subj, pred, obj)
  triples against reference triples (the BASELINE.json headline:
  P/R >= 0.95).
* ``tokenization_f1`` — token / sentence / MWT F1 with the reference's
  combination formula: harmonic mean weighted [1, 1, .01]
  (/root/reference/stanza/models/tokenization/utils.py:580-620; the
  harmonic weights at :616-620).

Both are driver-side set computations over collected keys (evaluation
corpora are fixture-scale; the *pipelines* they evaluate are distributed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _f1(p: float, r: float) -> float:
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def _prf(pred: set, gold: set):
    tp = len(pred & gold)
    p = tp / len(pred) if pred else 0.0
    r = tp / len(gold) if gold else 0.0
    return p, r, _f1(p, r)


def triple_pr(pred_df: DataFrame, gold_df: DataFrame,
              keys=("url", "sent_id", "subj", "pred", "obj")) -> dict:
    """Set-level P/R/F1 of predicted triples vs reference triples."""
    pred = {tuple(r[k] for k in keys) for r in pred_df.select(*keys).collect()}
    gold = {tuple(r[k] for k in keys) for r in gold_df.select(*keys).collect()}
    p, r, f = _prf(pred, gold)
    return {"precision": round(p, 6), "recall": round(r, 6),
            "f1": round(f, 6), "n_pred": len(pred), "n_gold": len(gold)}


def tokenization_f1(pred_words: DataFrame, gold_words: DataFrame) -> dict:
    """Token / sentence / MWT F1 + the reference's weighted harmonic mean.

    Tokens keyed by (url, start_char, end_char); sentences by
    (url, sent_start, sent_end); MWT expansions by
    (url, start_char, end_char, text).  Weights [1, 1, .01] per
    tokenization/utils.py:616-620:
        score = sum(w) / sum(w_i / f1_i)
    """
    def keyset(df, cols):
        return {tuple(r[c] for c in cols) for r in df.select(*cols).collect()}

    tok_p = keyset(pred_words.filter("NOT is_mwt"),
                   ["url", "start_char", "end_char"])
    tok_g = keyset(gold_words.filter("NOT is_mwt"),
                   ["url", "start_char", "end_char"])
    sent_p = keyset(pred_words, ["url", "sent_start", "sent_end"])
    sent_g = keyset(gold_words, ["url", "sent_start", "sent_end"])
    mwt_p = keyset(pred_words.filter("is_mwt"),
                   ["url", "start_char", "end_char", "text"])
    mwt_g = keyset(gold_words.filter("is_mwt"),
                   ["url", "start_char", "end_char", "text"])

    _, _, tok_f1 = _prf(tok_p, tok_g)
    _, _, sent_f1 = _prf(sent_p, sent_g)
    if not mwt_p and not mwt_g:
        mwt_f1 = 1.0  # vacuous: no MWTs anywhere
    else:
        _, _, mwt_f1 = _prf(mwt_p, mwt_g)

    weights = [1.0, 1.0, 0.01]
    f1s = [tok_f1, sent_f1, mwt_f1]
    if any(f == 0 for f in f1s):
        combined = 0.0
    else:
        combined = sum(weights) / sum(w / f for w, f in zip(weights, f1s))
    return {"token_f1": round(tok_f1, 6), "sentence_f1": round(sent_f1, 6),
            "mwt_f1": round(mwt_f1, 6), "combined": round(combined, 6)}
