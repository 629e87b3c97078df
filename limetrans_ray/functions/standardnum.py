"""Standard-number normalization: ISBN / ISSN / ZDB.

From-scratch re-implementation of the semantics of the reference's
``standard_number`` fix function (reference main/src/main/java/hbz/
limetrans/function/StandardNumber.java:56-309) — the survey's
"normalizer with a broadcast side table" exemplar (SURVEY.md §2.4):

- extract the first number-looking substring from a value (regex),
- checksum-validate (ISBN-10 mod-11 weighted / ISBN-13 EAN mod-10 /
  ISSN and ZDB mod-11 families — all public algorithms),
- emit a PREFERRED normalized form plus VARIANT spellings
  (hyphenated, and for ISBNs the 10↔13 conversion pair),
  mirroring the reference's ``preferred<TYPE>`` / ``variant<TYPE>[]``
  field contract.

ISBN hyphenation is driven by a prefix-range table exactly like the
reference's RangeMessage lookup (TreeMap lowerEntry → insert hyphens at
prefix/group/publisher boundaries). The built-in ``DEFAULT_ISBN_RANGES``
is a deliberately SMALL subset of the public ISBN agency ranges
(well-known splits for the major English/German/French groups);
:func:`load_isbn_ranges` accepts the full public range-message CSV
(rows ``prefix,group,begin,end``) for production use. A number outside
the loaded ranges simply gets no hyphenated variant — the same
degradation as the reference on a lowerEntry miss.
"""

from __future__ import annotations

import bisect
import re

_ISBN_RE = re.compile(r"\b(?:\d-?){9}(?:(?:\d-?){3}\d|[\dxX])\b")
_ISSN_RE = re.compile(r"\b(\d{4})-?(\d{3})([\dxX])\b")
_ZDB_RE = re.compile(r"\b(\d{2,10})-?([\dxX])\b")


# ---------------------------------------------------------------- checksums

def _char_val(c: str) -> int:
    return 10 if c in "xX" else ord(c) - ord("0")


def isbn10_is_valid(n: str) -> bool:
    if len(n) != 10 or not n[:9].isdigit() or n[9] not in "0123456789xX":
        return False
    s = sum((10 - i) * int(n[i]) for i in range(9)) + _char_val(n[9])
    return s % 11 == 0


def isbn13_is_valid(n: str) -> bool:
    if len(n) != 13 or not n.isdigit():
        return False
    s = sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(n))
    return s % 10 == 0


def isbn_is_valid(n: str) -> bool:
    return isbn10_is_valid(n) if len(n) == 10 else isbn13_is_valid(n)


def isbn10_to13(n: str) -> str:
    body = "978" + n[:9]
    check = (10 - sum(int(d) * (1 if i % 2 == 0 else 3) for i, d in enumerate(body)) % 10) % 10
    return body + str(check)


def isbn13_to10(n: str) -> str | None:
    if not n.startswith("978"):
        return None
    body = n[3:12]
    s = sum((10 - i) * int(body[i]) for i in range(9))
    check = (11 - s % 11) % 11
    return body + ("X" if check == 10 else str(check))


def _weighted_mod11(number: str) -> int:
    """Σ digit_i × (len+1−i) — the shared ISSN/ZDB checksum base
    (reference AbstractType.isValid)."""
    base = len(number) + 1
    return sum((base - i) * int(number[i]) for i in range(len(number)))


# --------------------------------------------------------------- ISBN ranges

# (prefix, group, begin, end): publisher code `p` of ISBN
# prefix-group-p… is hyphenated at len(begin) digits when
# begin <= p-prefix <= end. Subset of the public agency table —
# enough for the canonical English(0/1)/French(2)/German(3) splits.
DEFAULT_ISBN_RANGES: list[tuple[str, str, str, str]] = [
    ("978", "0", "00", "19"),
    ("978", "0", "200", "699"),
    ("978", "0", "7000", "8499"),
    ("978", "0", "85000", "89999"),
    ("978", "0", "900000", "949999"),
    ("978", "0", "9500000", "9999999"),
    ("978", "1", "00", "09"),
    ("978", "1", "100", "399"),
    ("978", "1", "4000", "5499"),
    ("978", "1", "55000", "86979"),
    ("978", "1", "869800", "998999"),
    ("978", "1", "9990000", "9999999"),
    ("978", "2", "00", "19"),
    ("978", "2", "200", "349"),
    ("978", "2", "35000", "39999"),
    ("978", "2", "400", "699"),
    ("978", "2", "7000", "8399"),
    ("978", "2", "84000", "89999"),
    ("978", "2", "900000", "949999"),
    ("978", "3", "00", "02"),
    ("978", "3", "030", "033"),
    ("978", "3", "0340", "0369"),
    ("978", "3", "03700", "03999"),
    ("978", "3", "04", "19"),
    ("978", "3", "200", "699"),
    ("978", "3", "7000", "8499"),
    ("978", "3", "85000", "89999"),
    ("978", "3", "900000", "949999"),
    # Italian (88) and Spanish (84) groups — exercised by the
    # reference's alma fixtures (88-7592-… Milan publishers)
    ("978", "88", "00", "19"),
    ("978", "88", "200", "599"),
    ("978", "88", "6000", "8499"),
    ("978", "88", "85000", "89999"),
    ("978", "88", "900000", "909999"),
    ("978", "84", "00", "13"),
    ("978", "84", "140", "149"),
    ("978", "84", "15000", "19999"),
    ("978", "84", "200", "699"),
    ("978", "84", "7000", "8499"),
    ("978", "84", "85000", "89999"),
    ("978", "84", "9000", "9199"),
    ("978", "84", "920000", "923999"),
    ("978", "84", "92400", "92999"),
    ("978", "84", "930000", "949999"),
    ("978", "84", "95000", "96999"),
    ("978", "84", "9700", "9999"),
]


class IsbnRangeTable:
    """Sorted begin-key table with lowerEntry lookup (the reference's
    TreeMap RANGE_MAP, re-expressed with bisect)."""

    def __init__(self, rows: list[tuple[str, str, str, str]]):
        entries = []
        for prefix, group, begin, end in rows:
            g = prefix + group
            b = g + begin
            entries.append(
                (b, g + end, len(prefix), len(g), len(b))
            )
        entries.sort()
        self._begins = [e[0] for e in entries]
        self._entries = entries

    def hyphenate13(self, n: str) -> str | None:
        i = bisect.bisect_left(self._begins, n) - 1  # lowerEntry
        if i < 0:
            return None
        _b, end, p_off, g_off, b_off = self._entries[i]
        if end < n[: len(end)]:
            return None
        return "-".join(
            [n[:p_off], n[p_off:g_off], n[g_off:b_off], n[b_off:12], n[12:]]
        )

    def hyphenate10(self, n: str | None) -> str | None:
        if n is None:
            return None
        h = self.hyphenate13("978" + n)
        return h[4:] if h is not None else None


_DEFAULT_TABLE = IsbnRangeTable(DEFAULT_ISBN_RANGES)


def load_isbn_ranges(csv_path: str) -> IsbnRangeTable:
    """Load a full public range-message CSV (``prefix,group,begin,end``
    per line) — the production-scale side table."""
    rows = []
    with open(csv_path) as fh:
        for line in fh:
            line = line.strip()
            if line:
                p, g, b, e = line.split(",")[:4]
                rows.append((p, g, b, e))
    return IsbnRangeTable(rows)


# ---------------------------------------------------------------- normalize

def standard_number(
    value: str, number_type: str, *, ranges: IsbnRangeTable | None = None
) -> dict | None:
    """Normalize the first ``number_type`` occurrence in ``value``.

    Returns ``{"preferred": str, "variants": [str, ...]}`` (variants
    exclude nulls and the raw input, like the reference's put()), or
    None when nothing valid is found."""
    t = number_type.upper()
    table = ranges or _DEFAULT_TABLE
    if t == "ISBN":
        m = _ISBN_RE.search(value)
        if not m:
            return None
        n = m.group().replace("-", "")
        if not isbn_is_valid(n):
            return None
        if len(n) == 10:
            alt = isbn10_to13(n)
            variants = [table.hyphenate13(alt), n, table.hyphenate10(n)]
            preferred = alt
        else:
            alt = isbn13_to10(n)
            variants = [table.hyphenate13(n), alt, table.hyphenate10(alt)]
            preferred = n
        variants = [v for v in dict.fromkeys(variants) if v is not None and v != value]
        return {"preferred": preferred, "variants": variants}
    if t == "ISSN":
        m = _ISSN_RE.search(value)
        if not m:
            return None
        number = m.group(1) + m.group(2)
        check = m.group(3).upper()
        if (_weighted_mod11(number) + _char_val(check)) % 11 != 0:
            return None
        preferred = number + check
        variant = f"{m.group(1)}-{m.group(2)}{check}"
        return {
            "preferred": preferred,
            "variants": [v for v in [variant] if v != value],
        }
    if t == "ZDB":
        m = _ZDB_RE.search(value)
        if not m:
            return None
        number, check = m.group(1), m.group(2).upper()
        if _weighted_mod11(number) % 11 != _char_val(check):
            return None
        preferred = number + check
        variant = f"{number}-{check}"
        return {
            "preferred": preferred,
            "variants": [v for v in [variant] if v != value],
        }
    raise ValueError(f"unknown standard number type {number_type!r}")


def normalize_zdb(value: str) -> str | None:
    """The reference's static ``normalizeZDB`` entry point."""
    out = standard_number(value, "ZDB")
    return out["preferred"] if out else None
