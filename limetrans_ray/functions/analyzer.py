"""Deterministic analyzer chain shared verbatim by index and query paths.

This is the from-scratch analogue of the reference's Elasticsearch
analyzer (reference main/src/main/resources/elasticsearch/
hbztitle-settings-v8.json:124-197): ``hyphen_protect`` char filter →
standard tokenizer → hyphen multiplexing → lowercase → German+English
stop words (settings-v8.json:66-122) → ``icu_folding`` →
``word_delimiter_graph`` with ``catenate_all`` + ``preserve_original``.
The 103-case ``ElasticsearchQueryTest`` matrix (reference
main/src/test/java/hbz/limetrans/ElasticsearchQueryTest.java:168-298)
pins the observable behavior we keep:

- a hyphenated/apostrophized token emits *multiple index terms*: its
  split parts plus the catenated form (``e-payment`` → ``e``,
  ``payment``, ``epayment``), so any written variant of a compound
  matches any queried variant;
- unicode/ASCII folding (``über`` → ``uber``, ``ß`` → ``ss``);
- German + English stop words removed.

The chain ends in German2-style snowball stemming (functions/stemmer.py)
before the final unique filter, mirroring the reference's order
(keyword_repeat means the unstemmed folded variants are indexed too —
ours keeps them as earlier members of the variant tuple). Stemming is on
by default (``stem=None`` → :data:`STEM_DEFAULT`); pass ``stem=False``
for the unstemmed profile.

Semantics contract (used by index build, query parsing, BM25 and the
oracle engine — all import *these* functions):

- ``tokenize_index(text)`` → flat list of terms with multiplicity;
  a document's term frequency is the count of each term in that list and
  its length is the document length ``dl`` used by BM25.
- ``analyze_query(text)`` → list of *synonym groups* (one per raw
  token); a group's variants are OR'd, groups are AND'd/OR'd per query
  mode; scoring sums BM25 over the distinct union of variant terms in
  ascending term order (the canonical float summation order).

Any change here bumps ``limetrans_ray.ANALYZER_VERSION``.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

from .stemmer import german2_stem

# Default analyzer profile: stem (the reference stems by default —
# hbztitle-settings-v8.json German2). See ANALYZER_VERSION.
STEM_DEFAULT = True

TOKEN_PATTERN = r"[^\W_]+(?:['’‐-][^\W_]+)*"
_TOKEN_RE = re.compile(TOKEN_PATTERN, re.UNICODE)
_DELIM_RE = re.compile(r"['’‐-]+")

# Single-char fold map applied after NFKD-decompose + combining-mark strip
# (the icu_folding analogue for characters NFKD does not decompose).
_FOLD_MAP = str.maketrans(
    {
        "ß": "ss",
        "æ": "ae",
        "œ": "oe",
        "ø": "o",
        "đ": "d",
        "ð": "d",
        "þ": "th",
        "ł": "l",
        "ı": "i",
    }
)

# Stop-word lists in the spirit of the reference's German+English lists
# (hbztitle-settings-v8.json:66-122); stored raw, applied post-fold.
_STOPWORDS_RAW = (
    # English
    "a an and are as at be but by for from has he in is it its of on or "
    "that the to was were will with "
    # German
    "der die das und oder ein eine einer eines einem einen ist sind war "
    "mit von zu im den dem des auf für als auch bei nach über aus dass "
    # French (webtext corpus includes fr rows)
    "le la les un une et ou est dans pour par sur au aux du ce cette"
).split()


def fold(token: str) -> str:
    """Casefold + ICU-folding-style diacritic removal. Frozen."""
    s = token.casefold().translate(_FOLD_MAP)
    s = unicodedata.normalize("NFKD", s)
    s = "".join(c for c in s if not unicodedata.combining(c))
    return unicodedata.normalize("NFC", s)


STOPWORDS = frozenset(fold(w) for w in _STOPWORDS_RAW)

# Per-process memo of raw token → tuple of emitted variants. Web-scale
# token streams are zipfian, so this turns the per-token analyzer cost
# into a dict hit for almost every occurrence. Bounded to keep worker
# heaps sane on adversarial vocabularies.
_VARIANT_CACHE: dict[str, tuple[str, ...]] = {}
_VARIANT_CACHE_MAX = 1_000_000


def token_variants(
    raw: str, *, stop: bool = True, stem: bool | None = None
) -> tuple[str, ...]:
    """Index/query terms emitted for one raw token (word_delimiter_graph
    with catenate_all analogue): split parts + catenated form, folded,
    stop-word filtered, then each surviving variant's German2 stem
    appended (the keyword_repeat → stemmer → unique chain: unstemmed
    AND stemmed forms index together), ordered-unique.

    Stop filtering happens BEFORE stemming (the reference's filter
    order); a stem that happens to equal a stop word is kept."""
    if stem is None:
        stem = STEM_DEFAULT
    cached = _VARIANT_CACHE.get(raw) if (stop and stem == STEM_DEFAULT) else None
    if cached is not None:
        return cached
    base = fold(raw)
    parts = [p for p in _DELIM_RE.split(base) if p]
    if len(parts) <= 1:
        seen: dict[str, None] = dict.fromkeys(parts)
    else:
        seen = dict.fromkeys(parts)
        seen["".join(parts)] = None
    if stop:
        seen = {v: None for v in seen if v not in STOPWORDS}
    if stem:
        for v in list(seen):
            seen[german2_stem(v)] = None
    variants = tuple(seen)
    if stop and stem == STEM_DEFAULT and len(_VARIANT_CACHE) < _VARIANT_CACHE_MAX:
        _VARIANT_CACHE[raw] = variants
    return variants


def tokenize_index(
    text: str, *, stop: bool = True, stem: bool | None = None
) -> list[str]:
    """Flat term stream for indexing (terms repeat with occurrences)."""
    text = unicodedata.normalize("NFC", text)
    out: list[str] = []
    for raw in _TOKEN_RE.findall(text):
        out.extend(token_variants(raw, stop=stop, stem=stem))
    return out


def tokenize_positions(
    text: str, *, stop: bool = True, stem: bool | None = None
) -> dict[str, list[int]]:
    """Per-term raw-token positions: every variant of raw token #p is
    "at" position p (the word_delimiter_graph convention — original,
    parts and catenated forms share the source position). ``tf`` =
    number of positions; Σ tf over terms = the same doclen as
    :func:`tokenize_index`."""
    text = unicodedata.normalize("NFC", text)
    out: dict[str, list[int]] = {}
    for p, raw in enumerate(_TOKEN_RE.findall(text)):
        for v in token_variants(raw, stop=stop, stem=stem):
            out.setdefault(v, []).append(p)
    return out


class BatchTokenizer:
    """Batched, per-actor-stateful tokenizer for the heavy index pass.

    Semantically IDENTICAL to calling :func:`tokenize_positions` per row
    and sorting the items (tests pin the parity); the difference is the
    execution shape: the per-token analyzer chain is memoized as
    ``raw token → (packed variant-id bytes, count)`` against a growing
    per-actor term vocabulary, so each token occurrence costs one dict
    hit + two list appends, and ALL per-document grouping/sorting
    (term-ascending cells, ascending positions, tf counts, doclens)
    happens in a handful of numpy/Arrow batch ops — no per-variant
    Python dict/setdefault work in the hot loop. This is the
    state-loaded-once actor-pool pattern of SURVEY.md §2.5 applied to
    the tokenizer itself.

    Returns Arrow list columns ready for the fwd/ schema.
    """

    _RAW_MEMO_MAX = 1_000_000
    # Vocab bound: the memo vocabulary is pure cache (per-batch output
    # remaps ids to strings, so dropping ALL state between batches is
    # semantics-free). On adversarial ever-fresh vocabularies the reset
    # caps worker heap where an unbounded _vid/_vocab would grow forever.
    _VOCAB_MAX = 4_000_000

    def __init__(self, *, stop: bool = True, stem: bool | None = None):
        self.stop = stop
        self.stem = STEM_DEFAULT if stem is None else stem
        self._reset()

    def _reset(self) -> None:
        self._vocab: list[str] = []           # variant id → term string
        self._vid: dict[str, int] = {}        # term string → variant id
        self._raw: dict[str, tuple[bytes, int]] = {}  # raw → (ids bytes, k)

    def _ids_for_raw(self, raw: str) -> tuple[bytes, int]:
        got = self._raw.get(raw)
        if got is None:
            variants = token_variants(raw, stop=self.stop, stem=self.stem)
            ids = np.empty(len(variants), dtype=np.int64)
            for i, v in enumerate(variants):
                j = self._vid.get(v)
                if j is None:
                    j = self._vid[v] = len(self._vocab)
                    self._vocab.append(v)
                ids[i] = j
            got = (ids.tobytes(), len(variants))
            if len(self._raw) < self._RAW_MEMO_MAX:
                self._raw[raw] = got
        return got

    def tokenize_texts(self, texts: list[str]):
        """texts → (terms list<string>, tfs list<int32>,
        pos list<list<int32>>, doclens int64 array) — one entry per
        input text, terms lexicographically ascending per doc, positions
        ascending per term."""
        import pyarrow as pa

        if len(self._vocab) > self._VOCAB_MAX:
            self._reset()
        import pyarrow.compute as pc

        n_docs = len(texts)
        n_raws = np.empty(n_docs, dtype=np.int64)
        all_raws: list[str] = []
        # per-doc C-level regex + one list extend per doc; all
        # per-OCCURRENCE work below is Arrow/numpy — the former Python
        # loop paid a dict get + two appends for every one of the
        # millions of occurrences in a batch, then fromiter/join over
        # millions of small Python objects
        findall = _TOKEN_RE.findall
        is_norm = unicodedata.is_normalized
        norm = unicodedata.normalize
        extend = all_raws.extend
        for di, text in enumerate(texts):
            t = text or ""
            if not is_norm("NFC", t):
                t = norm("NFC", t)
            raws = findall(t)
            n_raws[di] = len(raws)
            extend(raws)

        total_raws = len(all_raws)
        if total_raws:
            # occurrences → distinct raws in C (zipfian streams make the
            # dictionary tiny relative to the stream)
            denc = pc.dictionary_encode(pa.array(all_raws, pa.string()))
            codes = denc.indices.to_numpy().astype(np.int64)
            memo_get = self._raw.get
            miss = self._ids_for_raw
            dflat_parts: list[bytes] = []
            ndistinct = len(denc.dictionary)
            dcounts = np.empty(ndistinct, dtype=np.int64)
            # analyzer chain runs once per DISTINCT raw (memoized across
            # batches) — the only remaining Python loop
            for i, raw in enumerate(denc.dictionary.to_pylist()):
                got = memo_get(raw)
                if got is None:
                    got = miss(raw)
                dflat_parts.append(got[0])
                dcounts[i] = got[1]
            dflat = np.frombuffer(b"".join(dflat_parts), dtype=np.int64)
            dstarts = np.zeros(ndistinct + 1, dtype=np.int64)
            np.cumsum(dcounts, out=dstarts[1:])
            # expand each occurrence's variant-id run with one gather
            counts = dcounts[codes]
            out_offs = np.zeros(total_raws + 1, dtype=np.int64)
            np.cumsum(counts, out=out_offs[1:])
            total = int(out_offs[-1])
            shift = dstarts[:-1][codes] - out_offs[:-1]
            idx = np.arange(total, dtype=np.int64)
            idx += np.repeat(shift, counts)
            flat_ids = dflat[idx]
        else:
            counts = np.zeros(0, dtype=np.int64)
            flat_ids = np.zeros(0, dtype=np.int64)
        # per-doc totals of emitted variants = doclen (Σ tf) per doc
        raw_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_raws)
        doclens = np.bincount(raw_doc, weights=counts, minlength=n_docs).astype(
            np.int64
        )
        if len(flat_ids) == 0:
            empty_terms = pa.ListArray.from_arrays(
                np.zeros(n_docs + 1, dtype=np.int32), pa.array([], pa.string())
            )
            empty_tfs = pa.ListArray.from_arrays(
                np.zeros(n_docs + 1, dtype=np.int32), pa.array([], pa.int32())
            )
            inner = pa.ListArray.from_arrays(
                np.zeros(1, dtype=np.int32), pa.array([], pa.int32())
            )
            empty_pos = pa.ListArray.from_arrays(
                np.zeros(n_docs + 1, dtype=np.int32), inner
            )
            return empty_terms, empty_tfs, empty_pos, doclens

        # per-occurrence doc index and raw position, expanded per variant
        raw_starts = np.zeros(n_docs, dtype=np.int64)
        np.cumsum(n_raws[:-1], out=raw_starts[1:])
        raw_pos = np.arange(total_raws, dtype=np.int64) - np.repeat(raw_starts, n_raws)
        occ_doc = np.repeat(raw_doc, counts)
        occ_pos = np.repeat(raw_pos, counts)

        # lexicographic rank of each variant id used in THIS batch
        used = np.unique(flat_ids)
        used_strs = np.array([self._vocab[i] for i in used])
        sorder = np.argsort(used_strs, kind="stable")
        rank_of_used = np.empty(len(used), dtype=np.int64)
        rank_of_used[sorder] = np.arange(len(used), dtype=np.int64)
        rank = rank_of_used[np.searchsorted(used, flat_ids)]

        # stable sort by (doc, term rank); input is doc-major with
        # ascending positions, so positions stay ascending per cell
        key = occ_doc * len(used) + rank
        order = np.argsort(key, kind="stable")
        key_s = key[order]
        pos_s = occ_pos[order].astype(np.int32)

        cstarts = np.flatnonzero(np.concatenate([[True], key_s[1:] != key_s[:-1]]))
        cends = np.append(cstarts[1:], len(key_s))
        tfs = (cends - cstarts).astype(np.int32)
        cell_doc = key_s[cstarts] // len(used)
        cell_rank = key_s[cstarts] % len(used)
        cell_terms = pa.array(used_strs[sorder][cell_rank])

        cells_per_doc = np.bincount(cell_doc, minlength=n_docs)
        outer_offsets = np.zeros(n_docs + 1, dtype=np.int32)
        np.cumsum(cells_per_doc, out=outer_offsets[1:])

        terms_col = pa.ListArray.from_arrays(pa.array(outer_offsets, pa.int32()), cell_terms)
        tfs_col = pa.ListArray.from_arrays(
            pa.array(outer_offsets, pa.int32()), pa.array(tfs, pa.int32())
        )
        inner_offsets = np.concatenate([cstarts, [len(key_s)]]).astype(np.int32)
        pos_inner = pa.ListArray.from_arrays(
            pa.array(inner_offsets, pa.int32()), pa.array(pos_s, pa.int32())
        )
        pos_col = pa.ListArray.from_arrays(pa.array(outer_offsets, pa.int32()), pos_inner)
        return terms_col, tfs_col, pos_col, doclens


_PHRASE_RE = re.compile(r'"([^"]*)"')

# ---------------------------------------------------------------- fields
#
# Field-scoped search (the reference's multi-field mapping: source
# fields project into typed search fields with per-field analyzers and
# queries may target one — hbztitle-mapping-v8.json:27-88, e.g.
# ``dc.title``, keyword fields ``collection``/``bib.identifierAuthority``
# with the ``keyword_normalized`` normalizer, settings-v8.json:180-189).
# A field-scoped term is the plain term prefixed with "<field>\x1f" —
# the whole posting/merge/scoring machinery then works unchanged, and
# text fields additionally index UNqualified terms (the catch-all
# ``cql.allIndexes`` analogue), so unscoped queries search everything.

FIELD_SEP = "\x1f"
FIELD_GAP = 100  # position gap between fields (no cross-field phrases)

_KEYWORD_STRIP_RE = re.compile(r"[^0-9a-z]+")


def qualify(field: str | None, term: str) -> str:
    return term if not field else f"{field}{FIELD_SEP}{term}"


def keyword_normalize(value: str) -> str:
    """The ``keyword_normalized`` analyzer analogue: fold + strip
    non-alphanumerics to spaces + squeeze whitespace; the whole value is
    ONE index term (unanalyzed keyword field)."""
    return " ".join(_KEYWORD_STRIP_RE.sub(" ", fold(value)).split())


_OCN_RE = re.compile(r"^[^0-9]*0*")


def ocn_normalize(value: str) -> str:
    """The reference's ``ocn_normalizer`` (strip leading non-digits,
    then leading zeros; rest of the value verbatim — reference
    hbztitle-settings-v8.json:56-60, pattern ``^[^0-9]*0*`` → ``""``).
    Used by ``keyword_ocn`` fields, e.g. ``(OCoLC)0043381`` → ``43381``."""
    return _OCN_RE.sub("", value, count=1)


def tokenize_fields(
    specs, *, stop: bool = True, stem: bool | None = None
) -> tuple[dict[str, list[int]], int]:
    """Positions for a multi-field document.

    ``specs``: iterable of ``(field_name, analyzer, text)`` with
    analyzer:

    - ``"text"`` — full chain; emits qualified + catch-all terms;
    - ``"text_unstemmed"`` — the reference's per-field analyzer override
      (``bib.namePersonal`` maps the ``unstemmed`` analyzer while the
      catch-all stems, hbztitle-mapping-v8.json:33-37): the
      field-QUALIFIED terms come from the unstemmed chain (person names
      are not stem-conflated when searched field-scoped), while the
      catch-all still indexes the full stemmed chain;
    - ``"keyword"`` — one ``keyword_normalize`` term, qualified only
      (keyword fields stay out of the catch-all, like un-copy_to'd ES
      keywords);
    - ``"keyword_ocn"`` — one ``ocn_normalize`` term, qualified only
      (the reference's ``ocn`` normalizer, settings-v8.json:56-60).

    Returns ``(term → ascending positions, doclen)`` where doclen counts
    only the catch-all text tokens (the document-length semantic BM25
    normalizes by)."""
    out: dict[str, list[int]] = {}
    base = 0
    doclen = 0
    for field, analyzer, text in specs:
        if analyzer in ("keyword", "keyword_ocn"):
            kw = (
                keyword_normalize(text or "")
                if analyzer == "keyword"
                else ocn_normalize(text or "")
            )
            if kw:
                out.setdefault(qualify(field, kw), []).append(base)
                base += 1 + FIELD_GAP
            continue
        if analyzer not in ("text", "text_unstemmed"):
            raise ValueError(f"unknown field analyzer {analyzer!r}")
        pos = tokenize_positions(text or "", stop=stop, stem=stem)
        width = 0
        for term, plist in pos.items():
            shifted = [p + base for p in plist]
            out.setdefault(term, []).extend(shifted)  # catch-all
            if field and analyzer == "text":
                out.setdefault(qualify(field, term), []).extend(shifted)
            doclen += len(plist)
            if plist:
                width = max(width, plist[-1] + 1)
        if field and analyzer == "text_unstemmed":
            for term, plist in tokenize_positions(
                text or "", stop=stop, stem=False
            ).items():
                out.setdefault(qualify(field, term), []).extend(
                    [p + base for p in plist]
                )
                if plist:
                    width = max(width, plist[-1] + 1)
        base += width + FIELD_GAP
    for plist in out.values():
        plist.sort()
    return out, doclen


# the unquoted alternative stops at a quote so adjacent phrases
# ('web"drei zinnen"') still parse as phrases
_CLAUSE_RE = re.compile(
    r'(?:(?P<field>[A-Za-z][A-Za-z0-9_]*):)?(?P<body>"[^"]*"|[^"\s]+)'
)


def parse_query(
    text: str,
    *,
    stop: bool = True,
    stem: bool | None = None,
    field_analyzers: dict[str, str] | None = None,
) -> list[dict]:
    """Full query parse: quoted segments become phrase clauses, the rest
    term clauses; a ``field:`` prefix (``title:holzbau``,
    ``source:"a b"``) scopes the clause to that field (its variants are
    field-qualified — unscoped clauses hit the catch-all terms). Returns
    a list of clauses, each ``{"type": "term", "variants": tuple}`` or
    ``{"type": "phrase", "slots": [tuple, ...], "alt": tuple}`` (one
    variant group per consecutive phrase position). Clauses AND together
    in "and" mode.

    A FIELD-scoped quoted body additionally carries ``alt`` — the
    keyword-normalized whole value, field-qualified: the clause matches
    if the phrase matches in a text field OR the exact keyword term
    matches (``source:"library a"``). The parser does not know field
    types, so both sides are emitted; whichever side has postings
    decides (the other's terms simply have df 0).

    Scoring semantics (shared engine/oracle contract): phrases only
    FILTER — BM25 still sums over the distinct variant terms of all
    clauses (a deliberate divergence from ES phrase-frequency scoring,
    identical in both engines).

    ``field_analyzers`` (field name → analyzer) is the per-field SEARCH
    analyzer map (the ES search_analyzer analogue, recorded by the index
    build): a clause scoped to a ``text_unstemmed`` field analyzes its
    body without stemming, so query-side stems never leak into an
    unstemmed field's postings (reference hbztitle-mapping-v8.json:33-37).
    """
    text = unicodedata.normalize("NFC", text)
    clauses: list[dict] = []
    for m in _CLAUSE_RE.finditer(text):
        field = m.group("field")
        body = m.group("body")
        quoted = body.startswith('"')
        if quoted:
            body = body.strip('"')
        if not quoted:
            body, wilds = _extract_wildcards(body)
            for w in wilds:
                p = fold(w)
                if p:
                    clauses.append(
                        {"type": "prefix", "prefix": p, "field": field}
                    )
        clause_stem = stem
        if field and field_analyzers and field_analyzers.get(field) == "text_unstemmed":
            clause_stem = False
        slots = analyze_query(body, stop=stop, stem=clause_stem)
        if field:
            slots = [tuple(qualify(field, v) for v in g) for g in slots]
        alt: tuple[str, ...] = ()
        if field and quoted:
            kw = keyword_normalize(body)
            if kw:
                alt = (qualify(field, kw),)
        if field and field_analyzers and field_analyzers.get(field) == "keyword_ocn":
            # ocn-normalized alternative — ONLY for fields the index
            # declared keyword_ocn: a bare digit-led variant emitted
            # into a text field would collide with real tokenized terms
            # (e.g. title:mp3 → title\x1f3) and even bypass phrase
            # filtering via the alt union
            oc = ocn_normalize(body)
            if oc and oc != body:
                alt = alt + (qualify(field, oc),)
        if len(slots) == 1:
            variants = slots[0] + tuple(v for v in alt if v not in slots[0])
            clauses.append({"type": "term", "variants": variants})
        elif slots:
            if quoted:
                clauses.append({"type": "phrase", "slots": slots, "alt": alt})
            else:
                clauses.extend({"type": "term", "variants": g} for g in slots)
        elif alt:
            clauses.append({"type": "term", "variants": alt})
    return clauses


# a trailing-star token = prefix (wildcard) clause — the
# simple_query_string analyze_wildcard analogue the reference's query
# tests exercise (ElasticsearchQueryTest.java:315-354). The prefix is
# FOLDED but not tokenized/stemmed (stemming a prefix would mangle it;
# hyphenated prefixes match nothing against multiplexed variants —
# documented contract, not a bug).
_WILDCARD_RE = re.compile(r'([^\s"*]+)\*')

# shared engine/oracle expansion cap: a wildcard expands to the
# lexicographically FIRST N dictionary terms under the prefix
MAX_PREFIX_EXPANSIONS = 64


def _extract_wildcards(body: str) -> tuple[str, list[str]]:
    """Strip trailing-star tokens out of an unquoted clause body;
    returns (body without them, raw wildcard stems in query order)."""
    wilds = [m.group(1) for m in _WILDCARD_RE.finditer(body)]
    if wilds:
        body = _WILDCARD_RE.sub(" ", body)
    return body, wilds


def analyze_query(
    text: str, *, stop: bool = True, stem: bool | None = None
) -> list[tuple[str, ...]]:
    """Query analysis → list of synonym groups (one per raw token).

    Tokens that fold entirely to stop words produce no group (they do
    not constrain AND matching), mirroring query-side stop filtering.
    """
    text = unicodedata.normalize("NFC", text)
    groups: list[tuple[str, ...]] = []
    for raw in _TOKEN_RE.findall(text):
        variants = token_variants(raw, stop=stop, stem=stem)
        if variants:
            groups.append(variants)
    return groups


_SIMPLE_SPLIT_RE = re.compile(r"[^0-9a-z]+")


def simple_terms(text: str) -> list[str]:
    """Simplified whitespace/alnum tokenizer, lowercased — deliberately
    expressible in ANSI SQL (``string_split_regex(lower(text),
    '[^0-9a-z]+')``) so relational oracle queries can mirror it exactly.
    Not used by the index path (which uses :func:`tokenize_index`)."""
    return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]


def tokenize_fields_simple(specs) -> tuple[dict[str, list[int]], int]:
    """Multi-field positions under the ``simple`` analyzer profile —
    the SQL-mirrorable twin of :func:`tokenize_fields` (reference
    multi-field mapping, hbztitle-mapping-v8.json:27-88, with the
    deliberately ANSI-expressible tokenizer so a DuckDB oracle can
    mirror fielded search exactly).

    ``specs``: iterable of ``(field_name, analyzer, text)`` with
    analyzer ``"text"`` (catch-all + field-qualified
    :func:`simple_terms` at shared positions), ``"keyword"`` (one
    :func:`keyword_normalize` term, qualified only) or
    ``"keyword_ocn"`` (one :func:`ocn_normalize` term, qualified only).

    Returns ``(term → ascending positions, doclen)``; doclen counts
    only catch-all text tokens (the BM25 document-length semantic,
    same as :func:`tokenize_fields`)."""
    out: dict[str, list[int]] = {}
    base = 0
    doclen = 0
    for field, analyzer, text in specs:
        if analyzer in ("keyword", "keyword_ocn"):
            kw = (
                keyword_normalize(text or "")
                if analyzer == "keyword"
                else ocn_normalize(text or "")
            )
            if kw:
                out.setdefault(qualify(field, kw), []).append(base)
                base += 1 + FIELD_GAP
            continue
        if analyzer != "text":
            raise ValueError(
                f"unsupported simple-profile field analyzer {analyzer!r}"
            )
        toks = simple_terms(text or "")
        for p, t in enumerate(toks):
            out.setdefault(t, []).append(p + base)  # catch-all
            if field:
                out.setdefault(qualify(field, t), []).append(p + base)
        doclen += len(toks)
        base += len(toks) + FIELD_GAP
    for plist in out.values():
        plist.sort()
    return out, doclen


def parse_simple_query(
    text: str, *, field_analyzers: dict[str, str] | None = None
) -> list[dict]:
    """Simple-profile query parse — the SQL-mirrorable analogue of
    :func:`parse_query`. Quoted segments become phrase clauses whose
    slots are single-variant :func:`simple_terms` tokens; a ``field:``
    prefix scopes a clause ONLY when the index declared that field
    (``field_analyzers``) — an undeclared prefix stays literal text, so
    a plain simple index tokenizes ``body:x`` exactly as
    ``simple_terms`` would (``body``, ``x``). A clause scoped to a
    keyword field matches the :func:`keyword_normalize`'d (or
    :func:`ocn_normalize`'d) whole value.

    Scoring contract is shared with :func:`parse_query`: phrases only
    FILTER; BM25 sums over the distinct terms of all clauses."""
    text = unicodedata.normalize("NFC", text)
    clauses: list[dict] = []
    for m in _CLAUSE_RE.finditer(text):
        field = m.group("field")
        body = m.group("body")
        quoted = body.startswith('"')
        if quoted:
            body = body.strip('"')
        if field and not (field_analyzers and field in field_analyzers):
            # undeclared field prefix: the prefix is literal text (its
            # own term clauses — simple_terms splits the colon away,
            # matching the field-free profile's historical
            # tokenization) while the body keeps its own semantics, so
            # a quoted body still phrase-filters
            clauses.extend(
                {"type": "term", "variants": (t,)} for t in simple_terms(field)
            )
            field = None
        if field and field_analyzers[field] in ("keyword", "keyword_ocn"):
            kw = (
                keyword_normalize(body)
                if field_analyzers[field] == "keyword"
                else ocn_normalize(body)
            )
            if kw:
                clauses.append({"type": "term", "variants": (qualify(field, kw),)})
            continue
        if not quoted:
            body, wilds = _extract_wildcards(body)
            for w in wilds:
                toks = simple_terms(w)
                # pre-hyphen pieces are ordinary terms; the LAST piece
                # is the prefix (the analyzed-wildcard convention)
                for t in toks[:-1]:
                    clauses.append(
                        {"type": "term", "variants": (qualify(field, t),)}
                    )
                if toks:
                    clauses.append(
                        {"type": "prefix", "prefix": toks[-1], "field": field}
                    )
        slots = [(qualify(field, t),) for t in simple_terms(body)]
        if len(slots) == 1:
            clauses.append({"type": "term", "variants": slots[0]})
        elif slots:
            if quoted:
                clauses.append({"type": "phrase", "slots": slots, "alt": ()})
            else:
                clauses.extend({"type": "term", "variants": g} for g in slots)
    return clauses
