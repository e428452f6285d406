"""Pure-Python reference oracle for rank-identity verification.

Defines the CANONICAL semantics the Spark engine must reproduce
exactly (north rule: identical top-k docIDs AND BM25 scores):

* tokenization: ``bobo_spark.tokenizer.tokenize`` (shared function)
* BM25 k1=1.2 b=0.75, idf = ln(1 + (N - df + .5)/(df + .5))
* accumulation: float64, per doc, terms in ascending lexicographic
  order (duplicate query terms collapse to one)
* tiebreak: (-score, doc_id)
* facet counts: over the full hit set; with expandSelection, a facet
  field's own selection is excluded from its counts (Bobo multi-select,
  search/BoboSearcher.java:102-156)

This is the stand-in for the reference engine's scorer on the
reference query set (the reference delegates scoring to Lucene; our
contract pins BM25 as SURVEY.md §2.3 specifies).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .bm25 import B, K1
from .tokenizer import tokenize


class OracleIndex:
    def __init__(self, docs):
        """docs: iterable of dicts with doc_id, text, and optional
        lang / ts_bucket facet values."""
        self.postings: dict[str, list[tuple[int, int]]] = defaultdict(list)
        self.doclen: dict[int, int] = {}
        self.facet: dict[str, dict[int, str]] = {"lang": {}, "ts_bucket": {}}
        rows = sorted(docs, key=lambda d: d["doc_id"])
        for d in rows:
            toks = tokenize(d["text"])
            self.doclen[d["doc_id"]] = len(toks)
            for t, tf in sorted(Counter(toks).items()):
                self.postings[t].append((d["doc_id"], tf))
            for f in ("lang", "ts_bucket"):
                if f in d and d[f] is not None:
                    self.facet[f][d["doc_id"]] = d[f]
        self.n_docs = len(rows)
        self.avgdl = sum(self.doclen.values()) / max(1, self.n_docs)

    def idf(self, term: str) -> float:
        df = len(self.postings.get(term, ()))
        return math.log(1.0 + (self.n_docs - df + 0.5) / (df + 0.5))

    def search(
        self,
        query: str | list[str],
        mode: str = "and",
        k: int = 10,
        offset: int = 0,
        facets: tuple[str, ...] = (),
        selections: dict | None = None,
        ts_range: tuple[str, str] | None = None,
        expand_selection: bool = True,
    ):
        qtokens = tokenize(query) if isinstance(query, str) else [
            t for q in query for t in tokenize(q)
        ]
        terms = sorted(set(qtokens))
        selections = dict(selections or {})
        if ts_range is not None:
            lo, hi = ts_range
            vals = sorted({v for v in self.facet["ts_bucket"].values() if lo <= v <= hi})
            selections["ts_bucket"] = sorted(
                set(vals) & set(selections["ts_bucket"])
            ) if "ts_bucket" in selections else vals

        if mode == "and":
            lists = []
            for t in terms:
                if t not in self.postings:
                    return {"hits": [], "num_hits": 0, "facets": {f: {} for f in facets}}
                lists.append({d for d, _ in self.postings[t]})
            cand = set.intersection(*lists) if lists else set()
        else:
            cand = set()
            for t in terms:
                cand |= {d for d, _ in self.postings.get(t, ())}

        scores = {d: 0.0 for d in sorted(cand)}
        for t in terms:  # ascending lexicographic — the pinned order
            i = self.idf(t)
            for d, tf in self.postings.get(t, ()):
                if d in scores:
                    dl = self.doclen[d]
                    scores[d] += i * (tf * (K1 + 1.0)) / (
                        tf + K1 * (1.0 - B + B * dl / self.avgdl)
                    )

        def passes(d, skip_field=None):
            for f, vals in selections.items():
                if f == skip_field:
                    continue
                if self.facet[f].get(d) not in set(vals):
                    return False
            return True

        hit_docs = [d for d in scores if passes(d)]
        facet_counts = {}
        for f in facets:
            skip = f if expand_selection else None
            counts = Counter(
                self.facet[f].get(d) for d in scores if passes(d, skip_field=skip)
            )
            counts.pop(None, None)
            facet_counts[f] = dict(counts)

        ranked = sorted(hit_docs, key=lambda d: (-scores[d], d))
        page = ranked[offset:offset + k]
        return {
            "hits": [(d, scores[d]) for d in page],
            "num_hits": len(hit_docs),
            "facets": facet_counts,
        }


def reference_queryset(vocab: list[str], n_conj=50, n_disj=50, n_lang=20, n_ts=20):
    """The fixed reference query set (FIXTURES.md Fixture B): seeded
    head/tail term mixes. Deterministic — no RNG state, index-hashed."""
    import numpy as np

    def pick(i, lo, hi):
        # deterministic pseudo-random rank in [lo, hi)
        x = (i * 2654435761 + 0x9E3779B9) & 0xFFFFFFFF
        x ^= x >> 16
        x = (x * 0x45D9F3B) & 0xFFFFFFFF
        x ^= x >> 16
        return lo + x % (hi - lo)

    head = lambda i: vocab[pick(i, 0, 50)]
    tail = lambda i: vocab[pick(i, 200, min(5000, len(vocab)))]
    queries = []
    for i in range(n_conj):
        nt = 2 + i % 3
        terms = [head(i * 7 + j) if j == 0 else tail(i * 13 + j) for j in range(nt)]
        queries.append({"query": terms, "mode": "and"})
    for i in range(n_disj):
        nt = 2 + i % 3
        terms = [head(i * 11 + j) if j % 2 == 0 else tail(i * 17 + j) for j in range(nt)]
        queries.append({"query": terms, "mode": "or"})
    langs = ["en", "de", "fr", "es", "pt", "it", "nl"]
    for i in range(n_lang):
        queries.append(
            {
                "query": [head(i * 3), tail(i * 5 + 1)],
                "mode": "or",
                "selections": {"lang": [langs[i % len(langs)]]},
            }
        )
    for i in range(n_ts):
        lo = f"2024-0{1 + i % 4}-01"
        hi = f"2024-0{2 + i % 4}-15"
        queries.append(
            {"query": [head(i * 19), tail(i * 23 + 2)], "mode": "or", "ts_range": (lo, hi)}
        )
    return queries
