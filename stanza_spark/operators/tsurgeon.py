"""Tsurgeon-analog constituency-tree rewriting — declarative edit rules
over the bracketed ``tree`` column, completing the reference's
server-side rewrite trio (Semgrex->DepPattern, Ssurgeon->SsurgeonRule,
Tsurgeon->this).

The reference runs CoreNLP Tregex/Tsurgeon in a Java subprocess
(/root/reference/stanza/server/tsurgeon.py — e.g. its doctest prunes an
empty ``-NONE-`` subtree and excises a unary chain).  Here a rule is
DATA over a bounded Tregex subset and application is a pure function on
the tree string, run as one narrow mapInPandas pass (trees are
sentence-local; nothing shuffles):

* ``match_label``             — node label to match (``NP``, ``PP``, a
                                leaf XPOS …).
* ``child_label``             — if set, the node must have a direct
                                child with this label (Tregex ``A < B``).
* ``action='relabel'``        — set the node's label to ``new_label``.
* ``action='prune'``          — delete the matched subtree entirely
                                (Tsurgeon ``prune``).
* ``action='excise'``         — splice the node out, promoting its
                                children into the parent (Tsurgeon
                                ``excise node node``).

Rules apply IN ORDER; each rule makes one bottom-up pass — children are
rewritten before their parent is tested, so nested matches CASCADE
within the pass (excising an inner ``VP < VBN`` promotes the VBN into
the outer VP, which then matches and excises too — CoreNLP Tsurgeon
likewise re-applies each operation until fixpoint).  Unsupported
Tregex/Tsurgeon constructs are simply not expressible here — there is
no textual parser to mis-accept them.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator


@dataclass(frozen=True)
class TsurgeonRule:
    match_label: str
    child_label: str | None = None
    action: str = "relabel"          # 'relabel' | 'prune' | 'excise'
    new_label: str | None = None

    def __post_init__(self):
        if self.action not in ("relabel", "prune", "excise"):
            raise ValueError(f"tsurgeon: unknown action {self.action!r}")
        if self.action == "relabel" and not self.new_label:
            raise ValueError("tsurgeon: relabel requires new_label")


# -- s-expression codec ------------------------------------------------------

def parse_tree(s: str):
    """'(ROOT (S (NP (NNP Obama)) …))' -> nested [label, child…] lists
    (leaf tokens stay plain strings).  Raises on malformed input."""
    tokens = s.replace("(", " ( ").replace(")", " ) ").split()
    pos = 0

    def node():
        nonlocal pos
        if tokens[pos] != "(":
            raise ValueError(f"tsurgeon: expected '(' at {pos}")
        pos += 1
        label = tokens[pos]
        pos += 1
        kids = []
        while tokens[pos] != ")":
            kids.append(node() if tokens[pos] == "(" else tokens[pos])
            if not isinstance(kids[-1], list):
                pos += 1
        pos += 1
        return [label] + kids

    out = node()
    if pos != len(tokens):
        raise ValueError("tsurgeon: trailing content after tree")
    return out


def render_tree(t) -> str:
    if isinstance(t, str):
        return t
    return "(" + " ".join([t[0]] + [render_tree(k) for k in t[1:]]) + ")"


# -- rewriting ---------------------------------------------------------------

def _matches(node, rule: TsurgeonRule) -> bool:
    if node[0] != rule.match_label:
        return False
    if rule.child_label is not None:
        return any(isinstance(k, list) and k[0] == rule.child_label
                   for k in node[1:])
    return True


def _apply(node, rule: TsurgeonRule) -> list:
    """Returns the list of nodes replacing ``node`` in its parent."""
    if isinstance(node, str):
        return [node]
    kids = []
    for k in node[1:]:
        kids.extend(_apply(k, rule))
    node = [node[0]] + kids
    if _matches(node, rule):
        if rule.action == "relabel":
            node[0] = rule.new_label
        elif rule.action == "prune":
            return []
        else:                                    # excise: splice children
            return kids
    return [node]


def rewrite_tree(tree: str, rules: list[TsurgeonRule]) -> str:
    t = parse_tree(tree)
    for rule in rules:
        out = _apply(t, rule)
        if not out:
            return ""                            # whole tree pruned
        if len(out) > 1:
            # root excised with several children: re-wrap (a tree string
            # must stay single-rooted)
            out = [["ROOT"] + out]
        t = out[0]
    return render_tree(t)


def apply_tsurgeon(trees_df, rules: list[TsurgeonRule]):
    """(url, sent_id, tree) -> same schema with every rule applied —
    one narrow Arrow pass, no shuffle (trees are sentence-local)."""
    import pandas as pd

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["tree"] = [rewrite_tree(t, rules) for t in pdf["tree"]]
            yield pdf

    return trees_df.select("url", "sent_id", "tree").mapInPandas(
        batches, schema="url string, sent_id int, tree string")
