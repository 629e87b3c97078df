"""Simple-profile phrase + fielded search conformance.

The ``simple`` analyzer profile exists so the ENTIRE index-then-query
round trip is ANSI-SQL-mirrorable (the reference's index-then-query
conformance discipline — ElasticsearchQueryTest.java:315-354 — carried
into the driver's DuckDB gate). These tests pin the query-parse and
field-tokenize contracts with HAND-WRITTEN expectations (parity tests
cannot catch a bug shared by engine and mirror), and the engine's
phrase/fielded behavior on a tiny real index build.
"""

import pyarrow as pa
import pytest

from limetrans_ray.functions.analyzer import (
    FIELD_SEP,
    parse_simple_query,
    qualify,
    tokenize_fields_simple,
)

FA = {"body": "text", "lang": "keyword", "ocn": "keyword_ocn"}


class TestParseSimpleQuery:
    def test_plain_terms(self):
        assert parse_simple_query("Spark JOIN") == [
            {"type": "term", "variants": ("spark",)},
            {"type": "term", "variants": ("join",)},
        ]

    def test_phrase_plus_term(self):
        assert parse_simple_query('"slow fast" table') == [
            {
                "type": "phrase",
                "slots": [("slow",), ("fast",)],
                "alt": (),
            },
            {"type": "term", "variants": ("table",)},
        ]

    def test_single_token_phrase_degrades_to_term(self):
        assert parse_simple_query('"spark"') == [
            {"type": "term", "variants": ("spark",)}
        ]

    def test_undeclared_field_prefix_is_literal_text(self):
        # no field map: body:x tokenizes like the historical simple
        # profile (colon splits) — NOT as a scoped clause
        assert parse_simple_query("body:x") == [
            {"type": "term", "variants": ("body",)},
            {"type": "term", "variants": ("x",)},
        ]
        # declared map but unknown field name: same literal treatment
        assert parse_simple_query("other:x", field_analyzers=FA) == [
            {"type": "term", "variants": ("other",)},
            {"type": "term", "variants": ("x",)},
        ]

    def test_undeclared_field_prefix_keeps_quoted_body_as_phrase(self):
        # the prefix becomes literal term clauses, but a quoted body
        # keeps phrase semantics instead of degrading to bare terms
        assert parse_simple_query('other:"slow fast"', field_analyzers=FA) == [
            {"type": "term", "variants": ("other",)},
            {"type": "phrase", "slots": [("slow",), ("fast",)], "alt": ()},
        ]

    def test_text_field_scoped_term_and_phrase(self):
        assert parse_simple_query("body:Spark", field_analyzers=FA) == [
            {"type": "term", "variants": (qualify("body", "spark"),)}
        ]
        assert parse_simple_query('body:"query join"', field_analyzers=FA) == [
            {
                "type": "phrase",
                "slots": [
                    (qualify("body", "query"),),
                    (qualify("body", "join"),),
                ],
                "alt": (),
            }
        ]

    def test_keyword_field_matches_normalized_whole_value(self):
        assert parse_simple_query("lang:EN", field_analyzers=FA) == [
            {"type": "term", "variants": (f"lang{FIELD_SEP}en",)}
        ]
        # multi-token keyword value: ONE normalized term, not a phrase
        assert parse_simple_query('lang:"Library-A"', field_analyzers=FA) == [
            {"type": "term", "variants": (f"lang{FIELD_SEP}library a",)}
        ]

    def test_keyword_ocn_field(self):
        assert parse_simple_query("ocn:(OCoLC)0043381", field_analyzers=FA) == [
            {"type": "term", "variants": (f"ocn{FIELD_SEP}43381",)}
        ]

    def test_empty_keyword_value_drops_clause(self):
        assert parse_simple_query('lang:"---"', field_analyzers=FA) == []


class TestTokenizeFieldsSimple:
    def test_hand_expectations(self):
        out, doclen = tokenize_fields_simple(
            [
                ("body", "text", "a b a"),
                ("lang", "keyword", "EN"),
                ("source", "keyword", "Src-3"),
            ]
        )
        # body tokens: catch-all + qualified at shared raw positions
        assert out["a"] == [0, 2] and out["b"] == [1]
        assert out[qualify("body", "a")] == [0, 2]
        assert out[qualify("body", "b")] == [1]
        # keyword fields: one normalized qualified term each, after the
        # body's width + FIELD_GAP; no catch-all entry
        assert out[qualify("lang", "en")] == [103]
        assert out[qualify("source", "src 3")] == [204]
        assert "en" not in out and "src 3" not in out
        # doclen counts catch-all text tokens only
        assert doclen == 3

    def test_empty_keyword_skipped(self):
        out, doclen = tokenize_fields_simple(
            [("body", "text", "x"), ("lang", "keyword", "--")]
        )
        assert set(out) == {"x", qualify("body", "x")}
        assert doclen == 1

    def test_unknown_field_analyzer_raises(self):
        with pytest.raises(ValueError):
            tokenize_fields_simple([("body", "text_unstemmed", "x")])


DOCS = pa.table(
    {
        "doc_id": [0, 1, 2, 3],
        "text": [
            "alpha beta gamma",
            "beta alpha gamma",
            "alpha beta beta gamma",
            "gamma delta",
        ],
        "lang": ["en", "de", "en", "en"],
        "source": ["src1", "src1", "src2", "src2"],
    }
)


@pytest.fixture(scope="module")
def simple_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    root = str(tmp_path_factory.mktemp("simpleidx"))
    build_index_from_documents(
        rd.from_arrow(DOCS.select(["doc_id", "text"])), root, analyzer="simple"
    )
    return SearchEngine(root)


@pytest.fixture(scope="module")
def fielded_simple_index(ray_session, tmp_path_factory):
    import ray.data as rd

    from limetrans_ray.pipelines.build_index import build_index_from_documents
    from limetrans_ray.pipelines.search import SearchEngine

    root = str(tmp_path_factory.mktemp("fsimpleidx"))
    build_index_from_documents(
        rd.from_arrow(DOCS),
        root,
        analyzer="simple",
        fields=[
            ("body", "text", "text"),
            ("lang", "lang", "keyword"),
            ("source", "source", "keyword"),
        ],
    )
    return SearchEngine(root)


class TestSimplePhraseEngine:
    def test_phrase_filters_to_contiguous(self, simple_index):
        # docs 0 and 2 contain "alpha beta" contiguously; doc 1 has both
        # words in the other order
        ids = {d for d, _s in simple_index.search('"alpha beta"', 10)}
        assert ids == {0, 2}

    def test_phrase_and_term(self, simple_index):
        # phrase + AND term prune to docs with both
        ids = {d for d, _s in simple_index.search('"beta gamma" alpha', 10)}
        assert ids == {0, 2}

    def test_quoted_single_token_scores_like_term(self, simple_index):
        assert simple_index.search('"gamma"', 10) == simple_index.search(
            "gamma", 10
        )

    def test_phrase_score_equals_unquoted_and_when_contiguous_everywhere(
        self, simple_index
    ):
        # "gamma delta" is contiguous in its only doc, so the phrase
        # query's score must equal the plain AND query's (phrases only
        # FILTER; BM25 sums the same distinct terms)
        assert simple_index.search('"gamma delta"', 10) == \
            simple_index.search("gamma delta", 10)


class TestFieldedSimpleEngine:
    def test_keyword_field_scopes(self, fielded_simple_index):
        ids = {d for d, _s in fielded_simple_index.search("lang:en", 10)}
        assert ids == {0, 2, 3}
        ids = {d for d, _s in fielded_simple_index.search("source:src1", 10)}
        assert ids == {0, 1}

    def test_text_scoped_equals_catchall_when_single_text_field(
        self, fielded_simple_index
    ):
        # body is the only text field, so body:alpha and alpha rank and
        # score identically (same tf/df/dl)
        assert fielded_simple_index.search("body:alpha", 10) == \
            fielded_simple_index.search("alpha", 10)

    def test_mixed_text_and_keyword_and(self, fielded_simple_index):
        ids = {d for d, _s in fielded_simple_index.search("alpha lang:en", 10)}
        assert ids == {0, 2}

    def test_fielded_phrase(self, fielded_simple_index):
        ids = {
            d
            for d, _s in fielded_simple_index.search('body:"alpha beta"', 10)
        }
        assert ids == {0, 2}

    def test_keyword_value_never_leaks_to_catchall(self, fielded_simple_index):
        assert fielded_simple_index.search("src1", 10) == []
