"""German2-style snowball stemmer (pure Python, deterministic).

The reference's analyzer chain ends in German2 snowball stemming before
the final ``unique`` filter (reference main/src/main/resources/
elasticsearch/hbztitle-settings-v8.json:124-197, ``"language":
"German2"``), exercised by the stem-matching cases of
``ElasticsearchQueryTest`` (reference main/src/test/java/hbz/limetrans/
ElasticsearchQueryTest.java:168-298). This module implements the
published Snowball German algorithm with the documented German2 prelude
variant (ae/oe/ue treated as alternative spellings of ä/ö/ü —
snowballstem.org's public algorithm description), from scratch.

Contract notes:

- The stemmer runs AFTER our fold step (mirroring the reference where
  ``icu_folding`` precedes the stemmer), so its input is usually
  folded ASCII — which is exactly the case German2's ae/oe/ue prelude
  was designed for ("haeuser" and "häuser" both stem to "haus").
- Where the terse Snowball source leaves precedence ambiguous (u/y
  protection vs. ue→ü at the same position) we protect first, like the
  base German algorithm; the chain is self-consistent between index and
  query paths, which is what rank-identity requires.
- Pure function of its input; any change bumps ANALYZER_VERSION.
"""

from __future__ import annotations

_VOWELS = frozenset("aeiouyäöü")
_S_ENDING = frozenset("bdfghklmnrt")
_ST_ENDING = frozenset("bdfghklmnt")


def _prelude(word: str) -> str:
    """ß→ss; protect u/y between vowels (uppercase); German2: map
    ae→ä, oe→ö, ue→ü (the latter not after q)."""
    word = word.replace("ß", "ss")
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        c = word[i]
        if (
            c in ("u", "y")
            and 0 < i < n - 1
            and word[i - 1] in _VOWELS
            and word[i + 1] in _VOWELS
        ):
            out.append(c.upper())
            i += 1
            continue
        if i + 1 < n and word[i + 1] == "e":
            if c == "a":
                out.append("ä")
                i += 2
                continue
            if c == "o":
                out.append("ö")
                i += 2
                continue
            if c == "u" and (i == 0 or word[i - 1] != "q"):
                out.append("ü")
                i += 2
                continue
        out.append(c)
        i += 1
    return "".join(out)


def _regions(word: str) -> tuple[int, int]:
    """(R1, R2) start offsets per the Snowball definition; R1 is moved
    to at least position 3 (the German adjustment)."""

    def after_first_nonvowel_after_vowel(start: int) -> int:
        # NOTE: protected 'U'/'Y' (uppercased by the prelude) must count
        # as CONSONANTS here — that is the point of the protection — so
        # membership is checked case-sensitively against the lowercase
        # vowel set ('neue' → 'neUe' → R1=3 → stems to 'neu')
        i = start
        n = len(word)
        while i < n and word[i] not in _VOWELS:
            i += 1
        while i < n and word[i] in _VOWELS:
            i += 1
        return min(i + 1, n) if i < n else n

    r1 = after_first_nonvowel_after_vowel(0)
    r2 = after_first_nonvowel_after_vowel(r1)
    return max(r1, 3), r2


def german2_stem(word: str) -> str:
    """Stem one (already lowercased/folded) token. Prelude and postlude
    always run (ß→ss, umlaut strip) — R1 ≥ 3 already makes every
    suffix step a no-op on short words."""
    w = _prelude(word)
    r1, r2 = _regions(w)

    def in_r1(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r1

    def in_r2(suffix_len: int) -> bool:
        return len(w) - suffix_len >= r2

    # ---- step 1: em / ern / er | e / en / es (+niss fix) | s
    if w.endswith("ern") and in_r1(3):
        w = w[:-3]
    elif w.endswith(("em", "er")) and in_r1(2):
        w = w[:-2]
    elif w.endswith(("en", "es")) and in_r1(2):
        w = w[:-2]
        if w.endswith("niss"):
            w = w[:-1]
    elif w.endswith("e") and in_r1(1):
        w = w[:-1]
        if w.endswith("niss"):
            w = w[:-1]
    elif (
        w.endswith("s")
        and in_r1(1)
        and len(w) >= 2
        and w[-2].lower() in _S_ENDING
    ):
        w = w[:-1]

    # ---- step 2: est | en / er | st (st_ending preceded by ≥3 chars)
    if w.endswith("est") and in_r1(3):
        w = w[:-3]
    elif w.endswith(("en", "er")) and in_r1(2):
        w = w[:-2]
    elif (
        w.endswith("st")
        and in_r1(2)
        and len(w) >= 6
        and w[-3].lower() in _ST_ENDING
    ):
        w = w[:-2]

    # ---- step 3: d-suffixes
    if (w.endswith("end") or w.endswith("ung")) and in_r2(3):
        w = w[:-3]
        if w.endswith("ig") and in_r2(2) and (len(w) < 3 or w[-3] != "e"):
            w = w[:-2]
    elif w.endswith("isch") and in_r2(4) and (len(w) < 5 or w[-5] != "e"):
        w = w[:-4]
    elif (
        (w.endswith("ig") or w.endswith("ik"))
        and in_r2(2)
        and (len(w) < 3 or w[-3] != "e")
    ):
        w = w[:-2]
    elif (w.endswith("lich") or w.endswith("heit")) and in_r2(4):
        w = w[:-4]
        if (w.endswith("er") or w.endswith("en")) and in_r1(2):
            w = w[:-2]
    elif w.endswith("keit") and in_r2(4):
        w = w[:-4]
        if w.endswith("lich") and in_r2(4):
            w = w[:-4]
        elif w.endswith("ig") and in_r2(2):
            w = w[:-2]

    # ---- postlude: unprotect U/Y, strip umlauts
    return (
        w.replace("U", "u")
        .replace("Y", "y")
        .replace("ä", "a")
        .replace("ö", "o")
        .replace("ü", "u")
    )
