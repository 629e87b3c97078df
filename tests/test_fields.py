"""Field-scoped indexing/search conformance — the reference's
multi-field mapping (typed search fields with per-field analyzers,
``copy_to`` catch-all, keyword fields with ``keyword_normalized`` —
reference main/src/main/resources/elasticsearch/
hbztitle-mapping-v8.json:27-88, hbztitle-settings-v8.json:180-189).

Contract under test: ``field:term`` queries hit only that field's
postings; unscoped queries hit the catch-all; keyword fields match on
the normalized whole value; phrases never cross a field boundary; the
distributed engine is rank/score-identical to the oracle."""

import pyarrow as pa
import pytest

from limetrans_ray.functions.analyzer import (
    FIELD_SEP,
    keyword_normalize,
    parse_query,
    qualify,
    tokenize_fields,
)
from limetrans_ray.state.oracle import OracleEngine

DOCS = [
    # (doc_id, title, body, source)
    (0, "der holzbau-atlas", "ein buch über häuser aus holz", "Library-A"),
    (1, "moderne architektur", "der holzbau-atlas wird oft zitiert", "library a"),
    (2, "payment systems", "e-payment for the modern web", "WebCrawl"),
    (3, "zinnen der dolomiten", "berge und täler", "WebCrawl"),
]
SPECS = lambda t, b, s: [  # noqa: E731
    ("title", "text", t),
    ("body", "text", b),
    ("source", "keyword", s),
]


@pytest.fixture(scope="module")
def field_oracle():
    eng = OracleEngine()
    for d, t, b, s in DOCS:
        eng.add_fields(d, SPECS(t, b, s))
    eng.finalize()
    return eng


class TestParsing:
    def test_field_clause_qualified(self):
        out = parse_query("title:holzbau")
        assert out == [
            {"type": "term", "variants": (f"title{FIELD_SEP}holzbau",)}
        ]

    def test_mixed_scoped_and_unscoped(self):
        out = parse_query("title:holzbau atlas")
        assert out[0]["variants"] == (qualify("title", "holzbau"),)
        assert out[1]["variants"] == ("atlas",)

    def test_field_phrase(self):
        out = parse_query('body:"drei zinnen"')
        assert out[0]["type"] == "phrase"
        assert out[0]["slots"][0] == (qualify("body", "drei"),)

    def test_colon_degrades_without_field_grammar(self):
        # "time:" with no body after the colon is not a field clause
        out = parse_query("time: 10")
        assert [c["variants"][0] for c in out] == ["time", "10"]
        assert all(FIELD_SEP not in v for c in out for v in c["variants"])

    def test_keyword_normalize(self):
        assert keyword_normalize("  Library—A  ") == "library a"
        assert keyword_normalize("WebCrawl") == "webcrawl"


class TestTokenizeFields:
    def test_catch_all_and_qualified(self):
        posmap, dl = tokenize_fields(SPECS(*DOCS[0][1:]))
        assert "holzbau" in posmap                      # catch-all
        assert qualify("title", "holzbau") in posmap    # scoped
        assert qualify("source", "library a") in posmap # keyword
        assert "library" not in posmap                  # keywords stay scoped
        # doclen counts text tokens only (variants included), not keywords
        assert dl == sum(
            len(p) for t, p in posmap.items() if FIELD_SEP not in t
        )

    def test_field_gap_blocks_cross_field_phrases(self):
        posmap, _dl = tokenize_fields(
            [("a", "text", "alpha beta"), ("b", "text", "gamma delta")]
        )
        # beta's position and gamma's position are not consecutive
        assert posmap["gamma"][0] - posmap["beta"][0] > 1


class TestOracleSemantics:
    def test_scoped_vs_unscoped(self, field_oracle):
        # holzbau appears in doc0's title and doc1's body
        assert {d for d, _ in field_oracle.search("holzbau", 10)} == {0, 1}
        assert {d for d, _ in field_oracle.search("title:holzbau", 10)} == {0}
        assert {d for d, _ in field_oracle.search("body:holzbau", 10)} == {1}

    def test_keyword_field(self, field_oracle):
        # both source spellings normalize to "library a"; src terms are
        # scoped-only so unscoped "webcrawl" finds nothing
        assert {d for d, _ in field_oracle.search("source:webcrawl", 10)} == {2, 3}
        assert field_oracle.search("webcrawl", 10) == []

    def test_stem_inside_field(self, field_oracle):
        # häuser in doc0 body stems to haus; scoped query matches
        assert 0 in {d for d, _ in field_oracle.search("body:haus", 10)}
        assert {d for d, _ in field_oracle.search("title:haus", 10)} == set()

    def test_phrase_within_field(self, field_oracle):
        assert {d for d, _ in field_oracle.search('body:"holzbau-atlas wird"', 10)} == {1}

    def test_and_across_fields(self, field_oracle):
        got = {d for d, _ in field_oracle.search("title:payment source:webcrawl", 10)}
        assert got == {2}


def test_engine_matches_oracle_fielded(ray_session, tmp_path, field_oracle):
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, *_ in DOCS], pa.int64()),
                "title": pa.array([t for _, t, _b, _s in DOCS], pa.string()),
                "body": pa.array([b for _, _t, b, _s in DOCS], pa.string()),
                "source": pa.array([s for *_, s in DOCS], pa.string()),
            }
        )
    )
    root = str(tmp_path / "idx")
    build_index_from_documents(
        ds,
        root,
        fields=[("title", "title", "text"), ("body", "body", "text"),
                ("source", "source", "keyword")],
    )
    eng = SearchEngine(root)
    queries = [
        "holzbau", "title:holzbau", "body:holzbau", "source:webcrawl",
        "body:haus", 'body:"holzbau-atlas wird"', "title:payment source:webcrawl",
        "zinnen", "title:zinnen berge",
    ]
    for q in queries:
        got = eng.search(q, 10)
        want = field_oracle.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-12), q


def test_keyword_field_quoted_value(field_oracle):
    """A field-scoped QUOTED multi-word value matches the keyword
    field's exact normalized term (the 'alt' side of a phrase clause):
    source:"library a" finds both spellings."""
    got = {d for d, _ in field_oracle.search('source:"library a"', 10)}
    assert got == {0, 1}
    # and a quoted phrase on a TEXT field still phrase-matches
    got = {d for d, _ in field_oracle.search('body:"holzbau-atlas wird"', 10)}
    assert got == {1}


def test_engine_keyword_quoted_and_lazy_range(ray_session, tmp_path, field_oracle):
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, *_ in DOCS], pa.int64()),
                "title": pa.array([t for _, t, _b, _s in DOCS], pa.string()),
                "body": pa.array([b for _, _t, b, _s in DOCS], pa.string()),
                "source": pa.array([s for *_, s in DOCS], pa.string()),
            }
        )
    )
    root = str(tmp_path / "idx")
    build_index_from_documents(
        ds, root,
        fields=[("title", "title", "text"), ("body", "body", "text"),
                ("source", "source", "keyword")],
    )
    eng = SearchEngine(root)
    got = eng.search('source:"library a"', 10)
    want = field_oracle.search('source:"library a"', 10)
    assert [d for d, _ in got] == [d for d, _ in want]

    # lazy (preload=False) + bucket_range must equal the preloaded shard
    import json, os

    from limetrans_ray.state.manifest import build_dir, current_build

    stats = json.load(
        open(os.path.join(build_dir(root, current_build(root)), "stats.json"))
    )
    w = stats["bucket_width"]
    n_buckets = stats["max_doc"] // w + 1
    rng = (0, max(1, n_buckets))
    eager = SearchEngine(root, preload=True, bucket_range=rng)
    lazy = SearchEngine(root, preload=False, bucket_range=rng)
    for q in ["holzbau", "title:holzbau", "body:haus"]:
        assert lazy.search(q, 10) == eager.search(q, 10), q


# ---------------------------------------------------------------- profiles
#
# Per-field analyzer overrides (reference: bib.namePersonal maps the
# ``unstemmed`` analyzer while cql.allIndexes stems —
# hbztitle-mapping-v8.json:33-37; the ``ocn`` keyword normalizer strips
# leading non-digits/zeros — settings-v8.json:56-60).

PDOCS = [
    # (doc_id, name [unstemmed text], body [text], ocn [keyword_ocn])
    (0, "Anna Häuser", "bücher über häuser", "(OCoLC)0043381"),
    (1, "Karl Hauser", "moderne architektur", "ocm00012345"),
    (2, "Maria Haus", "häuser und gärten", "67890"),
]
PSPECS = lambda n, b, o: [  # noqa: E731
    ("name", "text_unstemmed", n),
    ("body", "text", b),
    ("ocn", "keyword_ocn", o),
]


@pytest.fixture(scope="module")
def profile_oracle():
    eng = OracleEngine()
    for d, n, b, o in PDOCS:
        eng.add_fields(d, PSPECS(n, b, o))
    eng.finalize()
    return eng


class TestFieldProfiles:
    def test_ocn_normalize(self):
        from limetrans_ray.functions.analyzer import ocn_normalize

        assert ocn_normalize("(OCoLC)0043381") == "43381"
        assert ocn_normalize("ocm00012345") == "12345"
        assert ocn_normalize("67890") == "67890"
        assert ocn_normalize("000") == ""

    def test_unstemmed_field_terms(self):
        posmap, _dl = tokenize_fields(PSPECS(*PDOCS[0][1:]))
        # scoped name field: unstemmed folded form, NOT the stem
        assert qualify("name", "hauser") in posmap
        assert qualify("name", "haus") not in posmap
        # catch-all still stems (haus from häuser)
        assert "haus" in posmap and "hauser" in posmap

    def test_unstemmed_search_not_stem_conflated(self, profile_oracle):
        # "Maria Haus" is the only name whose unstemmed form is "haus";
        # a stemmed field would conflate Häuser/Hauser/Haus
        assert {d for d, _ in profile_oracle.search("name:haus", 10)} == {2}
        assert {d for d, _ in profile_oracle.search("name:hauser", 10)} == {0, 1}
        # catch-all stems: unscoped "haus" hits häuser docs too
        assert {d for d, _ in profile_oracle.search("haus", 10)} == {0, 1, 2}

    def test_ocn_field_matches_normalized(self, profile_oracle):
        assert {d for d, _ in profile_oracle.search("ocn:43381", 10)} == {0}
        # query carrying the raw junk/zero prefix matches via the ocn alt
        assert {d for d, _ in profile_oracle.search("ocn:0043381", 10)} == {0}
        assert {d for d, _ in profile_oracle.search("ocn:00012345", 10)} == {1}
        assert {d for d, _ in profile_oracle.search("ocn:67890", 10)} == {2}


def test_engine_matches_oracle_profiles(ray_session, tmp_path, profile_oracle):
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d for d, *_ in PDOCS], pa.int64()),
                "name": pa.array([n for _, n, _b, _o in PDOCS], pa.string()),
                "body": pa.array([b for _, _n, b, _o in PDOCS], pa.string()),
                "ocn": pa.array([o for *_, o in PDOCS], pa.string()),
            }
        )
    )
    root = str(tmp_path / "idx")
    build_index_from_documents(
        ds, root,
        fields=[("name", "name", "text_unstemmed"), ("body", "body", "text"),
                ("ocn", "ocn", "keyword_ocn")],
    )
    eng = SearchEngine(root)
    for q in ["name:haus", "name:hauser", "haus", "ocn:43381", "ocn:0043381",
              "ocn:00012345", "name:hauser body:architektur"]:
        got = eng.search(q, 10)
        want = profile_oracle.search(q, 10)
        assert [d for d, _ in got] == [d for d, _ in want], q
        for (_, a), (_, b) in zip(got, want):
            assert a == pytest.approx(b, rel=1e-12), q


def test_ocn_alt_gated_to_keyword_ocn_fields():
    """The ocn-normalized alternative is only emitted for declared
    keyword_ocn fields — a text field scoped query like title:mp3 must
    NOT grow a bare 'title\\x1f3' variant (it would match any doc whose
    title contains the token 3, and even bypass phrase filtering)."""
    text_map = {"title": "text"}
    out = parse_query("title:mp3", field_analyzers=text_map)
    assert qualify("title", "3") not in out[0]["variants"]
    out = parse_query("title:mp3")  # no map at all → no ocn alt either
    assert qualify("title", "3") not in out[0]["variants"]
    ocn_map = {"ocn": "keyword_ocn"}
    out = parse_query("ocn:0043381", field_analyzers=ocn_map)
    assert qualify("ocn", "43381") in out[0]["variants"]
    # phrase alt path: quoted body on a text field gains no ocn alt
    out = parse_query('title:"volume 10"', field_analyzers=text_map)
    assert qualify("title", "10") not in out[0].get("alt", ())
