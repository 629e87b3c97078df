"""Frozen HTML → text extraction (the byte-identical per-row invariant).

The reference normalizes every literal value to Unicode NFC on the way in
(``StreamUnicodeNormalizer``, reference core/src/main/java/hbz/limetrans/util/
FileQueue.java:131,182-184); our analogue is a *frozen pure function*
``extract_text(html_bytes) -> str`` whose output must be byte-identical
between the distributed pipeline and the single-process oracle for every
url (BASELINE.json correctness gate).

The extraction rules are deliberately simple and fully deterministic:

1. decode UTF-8 with ``errors="replace"``;
2. drop ``<script>``/``<style>`` elements and HTML comments;
3. replace every remaining tag with a single space;
4. decode a fixed set of named entities plus decimal/hex numeric ones;
5. collapse all whitespace runs to single spaces and strip;
6. Unicode NFC normalize (the StreamUnicodeNormalizer analogue).

Any change to these rules must bump ``limetrans_ray.ANALYZER_VERSION``
(the version is recorded in every index build's ``stats.json``).
"""

from __future__ import annotations

import re
import unicodedata

_SCRIPT_RE = re.compile(r"<script\b[^>]*>.*?</script\s*>", re.S | re.I)
_STYLE_RE = re.compile(r"<style\b[^>]*>.*?</style\s*>", re.S | re.I)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_TAG_RE = re.compile(r"<[^>]*>")
_WS_RE = re.compile(r"\s+")
_ENT_RE = re.compile(r"&(#x[0-9a-fA-F]+|#[0-9]+|[a-zA-Z]+);")

_NAMED_ENTITIES = {
    "amp": "&",
    "lt": "<",
    "gt": ">",
    "quot": '"',
    "apos": "'",
    "nbsp": " ",
    "auml": "ä",
    "ouml": "ö",
    "uuml": "ü",
    "Auml": "Ä",
    "Ouml": "Ö",
    "Uuml": "Ü",
    "szlig": "ß",
    "eacute": "é",
    "egrave": "è",
    "agrave": "à",
    "ccedil": "ç",
    "mdash": "—",
    "ndash": "–",
    "hellip": "…",
    "copy": "©",
}


def _entity(m: re.Match) -> str:
    body = m.group(1)
    if body.startswith("#x") or body.startswith("#X"):
        try:
            return chr(int(body[2:], 16))
        except (ValueError, OverflowError):
            return m.group(0)
    if body.startswith("#"):
        try:
            return chr(int(body[1:]))
        except (ValueError, OverflowError):
            return m.group(0)
    return _NAMED_ENTITIES.get(body, m.group(0))


def extract_text(html: bytes | str) -> str:
    """Extract visible text from an HTML payload. Frozen; see module doc."""
    s = html.decode("utf-8", "replace") if isinstance(html, (bytes, bytearray)) else html
    s = _SCRIPT_RE.sub(" ", s)
    s = _STYLE_RE.sub(" ", s)
    s = _COMMENT_RE.sub(" ", s)
    s = _TAG_RE.sub(" ", s)
    s = _ENT_RE.sub(_entity, s)
    s = _WS_RE.sub(" ", s).strip()
    return unicodedata.normalize("NFC", s)
