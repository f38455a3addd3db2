"""Naive pure-Python reference engine — the golden oracle.

The reference validates copies by re-scanning the source and comparing
documents byte-for-byte (jobs/validationjob.go:38-51, esdiff/esdiff.go:80-100).
Our analog: a deliberately simple dict-of-lists inverted index + exhaustive
BM25 scorer. The Spark engine must be rank-identical on doc urls and match
scores to atol 1e-6 on the reference query set (BASELINE.json north_rule).

BM25 constants are frozen: k1=1.2, b=0.75, Lucene-style idf
``ln(1 + (N - df + 0.5) / (df + 0.5))``. Ties break by (score desc, url asc)
so results are deterministic and independent of internal docid assignment.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from .analyzer import tokenize

K1 = 1.2
B = 0.75


def idf(n_docs: int, df: int) -> float:
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_term(tf: float, dl: float, avgdl: float, idf_val: float) -> float:
    return idf_val * (tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class NaiveIndex:
    """Dict-of-lists index over (url → text); exhaustive BM25 scoring."""

    def __init__(self, docs: dict[str, str]):
        # docs: url -> text (already deduped, last-write-wins upstream)
        self.urls = sorted(docs)
        self.dl = {}
        self.postings: dict[str, dict[str, int]] = defaultdict(dict)
        total = 0
        for url in self.urls:
            toks = tokenize(docs[url])
            self.dl[url] = len(toks)
            total += len(toks)
            for t, c in Counter(toks).items():
                self.postings[t][url] = c
        self.n_docs = len(self.urls)
        self.avgdl = (total / self.n_docs) if self.n_docs else 0.0

    def search(self, query_text: str, k: int) -> list[tuple[str, float]]:
        """Exhaustive disjunctive BM25 top-k → [(url, score)]."""
        terms = tokenize(query_text)
        if not terms or self.avgdl == 0:
            return []
        scores: dict[str, float] = defaultdict(float)
        # Duplicate query terms contribute once per occurrence (standard
        # bag-of-words query semantics).
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(self.n_docs, len(plist))
            for url, tf in plist.items():
                scores[url] += bm25_term(tf, self.dl[url], self.avgdl, w)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]


def oracle_topk(docs: dict[str, str], queries: list[dict]) -> list[dict]:
    """FIXTURES.md §3 ``oracle_topk`` rows for a query set."""
    ix = NaiveIndex(docs)
    rows = []
    for q in queries:
        for rank, (url, score) in enumerate(ix.search(q["query_text"], q["k"]), 1):
            rows.append(
                {
                    "query_id": q["query_id"],
                    "rank": rank,
                    "doc_url": url,
                    "score": score,
                }
            )
    return rows
