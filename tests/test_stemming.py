"""German2 stemming conformance — the analyzer-chain layer the
reference pins with its 103-case ElasticsearchQueryTest matrix
(reference main/src/test/java/hbz/limetrans/ElasticsearchQueryTest.java:
168-298; analyzer chain hbztitle-settings-v8.json:124-197 ends in
German2 snowball stemming before ``unique``).

Three layers: unit stems (the StandardNumberTest analogue), analyzer
variant emission, and index-then-query matches on the distributed
engine vs the oracle (stem recall: an inflected query matches the base
form and vice versa)."""

import pytest

from limetrans_ray.functions.analyzer import analyze_query, token_variants
from limetrans_ray.functions.stemmer import german2_stem
from limetrans_ray.state.oracle import OracleEngine


STEM_CASES = [
    # umlaut plural families converge (incl. German2 ae/oe/ue spellings)
    ("häuser", "haus"), ("haeuser", "haus"), ("hauser", "haus"),
    ("bäume", "baum"), ("baeume", "baum"),
    ("bücher", "buch"), ("buecher", "buch"),
    # -e / -en / -er / -es / -em endings
    ("zinnen", "zinn"), ("zinne", "zinn"),
    ("gebiete", "gebiet"), ("gebieten", "gebiet"), ("gebiet", "gebiet"),
    ("berge", "berg"), ("bergen", "berg"),
    # derivational suffixes (R2-gated)
    ("zahlungen", "zahlung"),
    ("wissenschaftlich", "wissenschaft"),
    ("freundliches", "freundlich"),
    # short words / non-German words pass through
    ("web", "web"), ("atlas", "atlas"), ("payment", "payment"),
    ("holzbau", "holzbau"),
    # ß folding inside the stemmer
    ("straße", "strass"), ("strasse", "strass"),
]


@pytest.mark.parametrize("word,stem", STEM_CASES)
def test_unit_stems(word, stem):
    assert german2_stem(word) == stem


def test_stemmer_is_idempotent_enough():
    # stem(stem(w)) == stem(w) for the case vocabulary (terms in the
    # index are stable under re-analysis)
    for w, _s in STEM_CASES:
        s = german2_stem(w)
        assert german2_stem(s) == s or len(german2_stem(s)) < len(s)


def test_variants_include_unstemmed_and_stemmed():
    assert token_variants("häusern") == ("hausern", "haus")
    assert token_variants("zinnen") == ("zinnen", "zinn")
    # already-base forms emit one variant only
    assert token_variants("holzbau") == ("holzbau",)


def test_query_groups_match_across_inflection():
    # the synonym group of an inflected query contains the stem, so it
    # OR-matches any other inflection's postings
    g1 = analyze_query("häuser")[0]
    g2 = analyze_query("haeusern")[0]
    assert set(g1) & set(g2)  # shared stem "haus"


# ---- index-then-query matrix (ElasticsearchQueryTest style) ----------

DOCS = [
    (0, "die häuser am markt"),
    (1, "das alte haus"),
    (2, "haeuser und gaerten"),
    (3, "zinnen der burg"),
    (4, "die zinne"),
    (5, "payment systems"),
    (6, "der holzbau-atlas"),
    (7, "wissenschaftliche zahlungen"),
]

QUERY_MATRIX = [
    # query → expected matching doc ids (AND mode)
    ("haus", {0, 1, 2}),
    ("häuser", {0, 1, 2}),
    ("haeuser", {0, 1, 2}),
    ("zinne", {3, 4}),
    ("zinnen", {3, 4}),
    ("zahlung", {7}),
    ("wissenschaft", {7}),
    ("payment", {5}),
    ("xylophon", set()),
]


@pytest.fixture(scope="module")
def stem_oracle():
    return OracleEngine().add_corpus(DOCS)


@pytest.mark.parametrize("query,expected", QUERY_MATRIX)
def test_oracle_stem_matrix(stem_oracle, query, expected):
    got = {d for d, _ in stem_oracle.search(query, k=20)}
    assert got == expected, query


def test_engine_matches_oracle_on_stem_corpus(ray_session, tmp_path, stem_oracle):
    import pyarrow as pa
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, _ in DOCS], pa.int64()),
                "text": pa.array([t for _, t in DOCS], pa.string()),
            }
        )
    )
    root = str(tmp_path / "idx")
    build_index_from_documents(ds, root)
    eng = SearchEngine(root)
    for query, _expected in QUERY_MATRIX:
        got = eng.search(query, 20)
        want = stem_oracle.search(query, 20)
        assert [d for d, _ in got] == [d for d, _ in want], query
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-12), query
