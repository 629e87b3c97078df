"""URL canonicalization — the cross-document dedup key.

The reference dedups implicitly via the Elasticsearch ``_id`` computed
from record content (``RecordIdChanger`` + ``idKey``, reference
main/src/main/java/hbz/limetrans/Limetrans.java:572-584); its scalar
normalizer exemplar is ``standard_number`` (ISBN/ISSN checksum +
normalization, main/.../function/StandardNumber.java:56-309). Our
webtext analogue canonicalizes the page URL; two raw urls with the same
canonical form are duplicates and exact-dedup keeps one.

The rules are intentionally a short chain of regular expressions so the
*same* chain can be mirrored exactly in the DuckDB oracle SQL
(``regexp_replace`` steps, see ``__ray_entry__.oracle_sql``):

1. strip the fragment (``#...``);
2. strip a tracking-only query string (``?utm...`` to end);
3. strip trailing slashes;
4. lowercase scheme+host (up to the first ``/`` after ``://``).
"""

from __future__ import annotations

import re

import numpy as np

# Kept as data so oracle SQL / docs can cite the exact patterns.
FRAGMENT_PATTERN = r"#.*$"
UTM_QUERY_PATTERN = r"\?utm[^#]*$"
TRAILING_SLASH_PATTERN = r"/+$"

_FRAGMENT_RE = re.compile(FRAGMENT_PATTERN, re.S)
_UTM_RE = re.compile(UTM_QUERY_PATTERN, re.S)
_TRAIL_RE = re.compile(TRAILING_SLASH_PATTERN)
_SCHEME_HOST_RE = re.compile(r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)")


def canonical_url(url: str) -> str:
    """Return the canonical (dedup-key) form of ``url``. Frozen."""
    s = _FRAGMENT_RE.sub("", url)
    s = _UTM_RE.sub("", s)
    s = _TRAIL_RE.sub("", s)
    m = _SCHEME_HOST_RE.match(s)
    if m:
        s = m.group(1).lower() + s[m.end():]
    return s


def canonical_url_batch(urls) -> "list[str]":
    """Vectorized :func:`canonical_url` over an Arrow string array —
    the KeyStage hot path (the scalar form costs ~4 µs/url in Python
    regex; Arrow/RE2 kernels run the same chain an order of magnitude
    faster). Byte-identical to the scalar function: the two edge
    families where RE2 semantics could diverge fall back to the scalar
    path per row —

    * a value ending in ``\\n`` (Python ``$`` in ``/+$`` also matches
      *before* a final newline; RE2's ``$`` is end-of-text only);
    * a non-ASCII scheme+host (``str.lower`` vs ``utf8_lower`` corner
      cases in full-width case mapping).

    Property-tested against the scalar chain (tests/test_urlnorm.py).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    arr = pa.chunked_array([urls]) if not isinstance(
        urls, (pa.Array, pa.ChunkedArray)
    ) else urls
    s = pc.replace_substring_regex(arr, pattern="(?s)" + FRAGMENT_PATTERN,
                                   replacement="")
    s = pc.replace_substring_regex(s, pattern="(?s)" + UTM_QUERY_PATTERN,
                                   replacement="")
    # The trailing-slash step is where Python-`$` (also matches before a
    # final newline) and RE2-`$` (end-of-text only) diverge, so the
    # fallback mask must test THIS value — fragment/utm stripping can
    # expose a trailing newline the raw url did not end with.
    pre_trail = s
    s = pc.replace_substring_regex(s, pattern=TRAILING_SLASH_PATTERN,
                                   replacement="")
    g = pc.extract_regex(
        s, pattern=r"(?s)^(?P<sh>[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*)(?P<rest>.*)$"
    )
    sh = pc.struct_field(g, "sh")
    rest = pc.struct_field(g, "rest")
    joined = pc.binary_join_element_wise(pc.utf8_lower(sh), rest, "")
    out = pc.if_else(pc.is_valid(sh), joined, s)
    exact = pc.and_(
        pc.invert(pc.match_substring_regex(pre_trail, "(?s)\n$")),
        pc.if_else(pc.is_valid(sh), pc.string_is_ascii(sh), pa.scalar(True)),
    )
    result = out.to_pylist()
    if not pc.all(exact).as_py():
        if isinstance(exact, pa.ChunkedArray):
            exact = exact.combine_chunks()
        raw = arr.to_pylist()
        for i in np.flatnonzero(~exact.to_numpy(zero_copy_only=False)):
            result[i] = canonical_url(raw[i])
    return result
