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
