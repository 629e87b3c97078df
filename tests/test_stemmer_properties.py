"""Property tests for the German2 stemmer and analyzer invariants
(hypothesis — the randomized layer the reference's test suite lacks,
added per SURVEY §5 carry-over notes)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from limetrans_ray.functions.analyzer import (
    fold,
    token_variants,
    tokenize_index,
    tokenize_positions,
)
from limetrans_ray.functions.stemmer import german2_stem

words = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyzäöüß", min_size=1, max_size=24
)


@settings(max_examples=300, deadline=None)
@given(words)
def test_stem_deterministic_and_bounded(w):
    s1, s2 = german2_stem(w), german2_stem(w)
    assert s1 == s2
    # suffix stripping only ever operates at/after position 3 (R1 >= 3)
    assert len(s1) >= min(len(w.replace("ß", "ss")), 3) - 1 or len(s1) >= 3


@settings(max_examples=300, deadline=None)
@given(words)
def test_stem_output_is_foldable_ascii_ish(w):
    s = german2_stem(w)
    # postlude strips umlauts and unprotects U/Y
    assert all(c not in "äöüß" for c in s)
    assert s == s.lower()


@settings(max_examples=200, deadline=None)
@given(words)
def test_stem_idempotent_on_own_output_prefixes(w):
    # re-stemming an already-stemmed token never grows it
    s = german2_stem(w)
    assert len(german2_stem(s)) <= len(s)


text_strategy = st.text(
    alphabet="abcdefghij ä-' ", min_size=0, max_size=80
)


@settings(max_examples=200, deadline=None)
@given(text_strategy)
def test_tokenize_positions_consistent_with_index(t):
    """Σ tf over tokenize_positions == len(tokenize_index) (the doclen
    contract) and every variant list is sorted ascending."""
    pos = tokenize_positions(t)
    flat = tokenize_index(t)
    assert sum(len(p) for p in pos.values()) == len(flat)
    for plist in pos.values():
        assert plist == sorted(plist)


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet="abcdefgäöüß'-", min_size=1, max_size=20))
def test_token_variants_unique_and_folded(raw):
    vs = token_variants(raw)
    assert len(vs) == len(set(vs))
    for v in vs:
        assert v == fold(v) or v == german2_stem(v)
