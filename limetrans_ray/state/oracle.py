"""Single-process pure-Python oracle engine.

The reference runs every transformation test against two engines
(METAFIX and METAMORPH) and requires them to agree
(reference main/src/test/java/hbz/limetrans/AbstractTransformationTest.java:17-28);
its query semantics are pinned by index-then-query assertions
(ElasticsearchQueryTest.java:315-354). Our analogue: this oracle builds
the inverted index with plain dicts in one process, scores BM25 with
scalar float64 math, and the distributed Ray engine must be
**rank-identical and score-equal** to it (tests/test_index_query.py).

Shared contract with the distributed engine (imported, not duplicated):
``tokenize_index`` / ``analyze_query`` from functions/analyzer.py and
``idf`` / ``impact_scalar`` from state/bm25.py. Accumulation iterates
distinct query terms in ascending order — the canonical summation order.
"""

from __future__ import annotations

from collections import Counter

from ..functions.analyzer import analyze_query, tokenize_index
from .bm25 import idf, impact_scalar


class OracleEngine:
    """In-memory single-process index + exhaustive BM25 scorer."""

    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = {}
        self.doclen: dict[int, int] = {}
        self.avgdl: float = 0.0

    def add(self, doc_id: int, text: str) -> None:
        terms = tokenize_index(text)
        self.doclen[doc_id] = len(terms)
        for term, tf in Counter(terms).items():
            self.postings.setdefault(term, {})[doc_id] = tf

    def add_corpus(self, docs) -> "OracleEngine":
        """docs: iterable of (doc_id, text)."""
        for doc_id, text in docs:
            self.add(int(doc_id), text)
        self.finalize()
        return self

    def finalize(self) -> None:
        n = len(self.doclen)
        self.avgdl = (sum(self.doclen.values()) / n) if n else 1.0

    @property
    def n_docs(self) -> int:
        return len(self.doclen)

    def df(self, term: str) -> int:
        return len(self.postings.get(term, ()))

    def search(self, query: str, k: int = 10, mode: str = "and") -> list[tuple[int, float]]:
        """Top-k (doc_id, score), tie-break (score desc, doc_id asc).

        ``mode="and"``: every synonym group must match; ``"or"``: any.
        Scoring sums idf*impact over the distinct union of variant terms
        present in the doc, ascending term order.
        """
        groups = analyze_query(query)
        if not groups:
            return []
        group_docs = []
        for g in groups:
            docs: set[int] = set()
            for t in g:
                docs.update(self.postings.get(t, ()))
            group_docs.append(docs)
        if mode == "and":
            candidates = set.intersection(*group_docs) if group_docs else set()
        else:
            candidates = set.union(*group_docs)
        if not candidates:
            return []
        scores: dict[int, float] = {d: 0.0 for d in candidates}
        terms = sorted({t for g in groups for t in g})
        for t in terms:
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            for d, tf in plist.items():
                if d in scores:
                    scores[d] += w * impact_scalar(tf, self.doclen[d], self.avgdl)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
