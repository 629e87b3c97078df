"""Single-process pure-Python oracle engine.

The reference runs every transformation test against two engines
(METAFIX and METAMORPH) and requires them to agree
(reference main/src/test/java/hbz/limetrans/AbstractTransformationTest.java:17-28);
its query semantics are pinned by index-then-query assertions
(ElasticsearchQueryTest.java:315-354), including phrase cases. Our
analogue: this oracle builds the inverted index (with positions) in
plain dicts in one process, scores BM25 with scalar float64 math, and
the distributed Ray engine must be **rank-identical and score-equal**
to it (tests/test_index_query.py, tests/test_phrase.py).

Shared contract with the distributed engine (imported, not duplicated):
``tokenize_positions`` / ``parse_query`` from functions/analyzer.py and
``idf`` / ``impact_scalar`` from state/bm25.py. Accumulation iterates
distinct query terms in ascending order — the canonical summation
order. Phrase clauses filter candidates (consecutive raw positions);
scoring is the plain BM25 sum over all clauses' variant terms.
"""

from __future__ import annotations

from ..functions.analyzer import parse_query, tokenize_fields, tokenize_positions
from .bm25 import idf, impact_scalar


class OracleEngine:
    """In-memory single-process positional index + exhaustive BM25."""

    def __init__(self) -> None:
        self.postings: dict[str, dict[int, int]] = {}
        self.positions: dict[str, dict[int, list[int]]] = {}
        self.doclen: dict[int, int] = {}
        self.avgdl: float = 0.0
        self.field_analyzers: dict[str, str] = {}

    def add(self, doc_id: int, text: str) -> None:
        pos = tokenize_positions(text)
        self.doclen[doc_id] = sum(len(p) for p in pos.values())
        for term, plist in pos.items():
            self.postings.setdefault(term, {})[doc_id] = len(plist)
            self.positions.setdefault(term, {})[doc_id] = plist

    def add_fields(self, doc_id: int, specs) -> None:
        """Multi-field add — same (field, analyzer, text) specs and the
        same shared :func:`tokenize_fields` as the distributed engine's
        ``build_index_from_documents(fields=...)`` path."""
        for field, analyzer, _text in specs:
            if field:
                self.field_analyzers[field] = analyzer
        posmap, dl = tokenize_fields(specs)
        self.doclen[doc_id] = dl
        for term, plist in posmap.items():
            self.postings.setdefault(term, {})[doc_id] = len(plist)
            self.positions.setdefault(term, {})[doc_id] = plist

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

    # ------------------------------------------------------------- match

    def _term_clause_docs(self, variants) -> set[int]:
        docs: set[int] = set()
        for t in variants:
            docs.update(self.postings.get(t, ()))
        return docs

    def _phrase_clause_docs(self, slots) -> set[int]:
        """Docs containing the slot sequence at consecutive raw
        positions (any variant per slot)."""
        candidates = self._slot_docs(slots[0])
        for s in slots[1:]:
            candidates &= self._slot_docs(s)
        out = set()
        for d in candidates:
            anchors = self._slot_positions(slots[0], d)
            for i, s in enumerate(slots[1:], 1):
                pos_i = self._slot_positions(s, d)
                anchors = {p for p in anchors if p + i in pos_i}
                if not anchors:
                    break
            if anchors:
                out.add(d)
        return out

    def _expand_prefix(self, prefix: str, field) -> tuple[str, ...]:
        """Wildcard expansion over the oracle's own dictionary — same
        contract as the engine (lexicographically first
        MAX_PREFIX_EXPANSIONS terms under the qualified prefix)."""
        from ..functions.analyzer import MAX_PREFIX_EXPANSIONS, qualify

        p = qualify(field, prefix)
        hits = sorted(t for t in self.postings if t.startswith(p))
        return tuple(hits[:MAX_PREFIX_EXPANSIONS])

    def _slot_docs(self, variants) -> set[int]:
        return self._term_clause_docs(variants)

    def _slot_positions(self, variants, doc: int) -> set[int]:
        out: set[int] = set()
        for t in variants:
            out.update(self.positions.get(t, {}).get(doc, ()))
        return out

    def search(self, query: str, k: int = 10, mode: str = "and") -> list[tuple[int, float]]:
        """Top-k (doc_id, score), tie-break (score desc, doc_id asc).

        ``mode="and"``: every clause must match; ``"or"``: any clause.
        """
        clauses = parse_query(query, field_analyzers=self.field_analyzers or None)
        if not clauses:
            return []
        clauses = [
            (
                {"type": "term", "variants": self._expand_prefix(
                    c["prefix"], c.get("field"))}
                if c["type"] == "prefix"
                else c
            )
            for c in clauses
        ]
        clause_docs = [
            (
                self._phrase_clause_docs(c["slots"])
                | self._term_clause_docs(c.get("alt", ()))
            )
            if c["type"] == "phrase"
            else self._term_clause_docs(c["variants"])
            for c in clauses
        ]
        if mode == "and":
            candidates = set.intersection(*clause_docs)
        else:
            candidates = set.union(*clause_docs)
        if not candidates:
            return []
        scores: dict[int, float] = {d: 0.0 for d in candidates}
        all_terms = set()
        for c in clauses:
            if c["type"] == "phrase":
                groups = list(c["slots"])
                if c.get("alt"):
                    groups.append(c["alt"])
            else:
                groups = [c["variants"]]
            for g in groups:
                all_terms.update(g)
        for t in sorted(all_terms):
            plist = self.postings.get(t)
            if not plist:
                continue
            w = idf(len(plist), self.n_docs)
            for d, tf in plist.items():
                if d in scores:
                    scores[d] += w * impact_scalar(tf, self.doclen[d], self.avgdl)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return ranked[:k]
