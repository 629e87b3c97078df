"""Validation of the FULL-analyzer SQL oracle chain (__ray_entry__
``_full_toks_ctes``): the German2 snowball stemmer and the complete
tokenize→fold→variants→stop→stem chain re-implemented in DuckDB SQL
must agree token-for-token with the engine's Python chain — the
independence property the bm25_topk / bm25_phrase_topk /
fielded_search driver oracles rest on.

No Ray needed: pure DuckDB vs pure Python.
"""

import random

import duckdb
import pyarrow.parquet as pq
import pytest

import __ray_entry__ as entry_mod
from limetrans_ray.functions.analyzer import (
    STOPWORDS,
    _DELIM_RE,
    _TOKEN_RE,
    fold,
    tokenize_positions,
)
from limetrans_ray.functions.stemmer import german2_stem

SF = "/root/testdata/sf0.001"


def _sql_toks(con) -> dict:
    """doc_id → sorted [(0-based pos, term)] from the SQL chain."""
    q = (
        "WITH "
        + entry_mod._full_toks_ctes()
        + " SELECT doc_id, pos - 1, term FROM toks"
    )
    by: dict = {}
    for d, p, t in con.execute(q).fetchall():
        by.setdefault(d, []).append((p, t))
    return {d: sorted(v) for d, v in by.items()}


def _py_toks(text: str):
    return sorted(
        (p, term) for term, ps in tokenize_positions(text).items() for p in ps
    )


def _stem_via_sql(tokens):
    """Run ONLY the stem CTE chain over explicit tokens by substituting
    an inline fa_in source (the chain's vocabulary entry point)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE words(v VARCHAR)")
    con.executemany("INSERT INTO words VALUES (?)", [(t,) for t in tokens])
    ctes = entry_mod._full_toks_ctes()
    # reroute the vocabulary source from the corpus scan to the table
    ctes = ctes.replace(
        "fa_in AS (SELECT v AS tok, v AS w\n"
        "                  FROM (SELECT DISTINCT v FROM fa_pre)),",
        "fa_in AS (SELECT v AS tok, v AS w FROM words),",
    )
    # drop the CTEs ahead of fa_in (they scan `documents`)
    ctes = "fa_in" + ctes.split("fa_in", 1)[1]
    q = "WITH " + ctes + " SELECT tok, stem FROM fa_stem"
    return dict(con.execute(q).fetchall())


def test_stem_sql_matches_python_fuzz():
    """37k-token fuzz: corpus vocabulary + random umlaut/ß strings +
    suffix-loaded constructions, SQL stem == german2_stem on every one."""
    vocab = set()
    t = pq.read_table(f"{SF}/documents.parquet", columns=["text"])
    for txt in t.column("text").to_pylist():
        for raw in _TOKEN_RE.findall(txt):
            base = fold(raw)
            parts = [p for p in _DELIM_RE.split(base) if p]
            vocab.update(parts)
            if len(parts) > 1:
                vocab.add("".join(parts))
    rng = random.Random(42)
    alpha = "abcdefghijklmnopqrstuvwxyzäöüß"
    fuzz = {
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 14)))
        for _ in range(8000)
    }
    sufs = [
        "en", "er", "es", "e", "s", "ern", "em", "est", "st", "end",
        "ung", "ig", "ik", "isch", "lich", "heit", "keit", "niss",
        "nisse", "ae", "oe", "ue", "qu", "uey",
    ]
    fuzz |= {
        "".join(rng.choice(alpha) for _ in range(rng.randint(1, 8)))
        + rng.choice(sufs)
        + (rng.choice(sufs) if rng.random() < 0.5 else "")
        for _ in range(8000)
    }
    curated = (
        "laufen läuft haus häuser haeuser schönheit schoenheit "
        "freundlichkeit möglichkeit wissenschaftlich verständnis "
        "bedeutung neue neuen neues beziehungen geheimnisse erkenntnis "
        "aemter bücher gruen tür quere queue großes weißes bayerisches "
        "customer window stream table filter join batch query merge"
    ).split()
    words = sorted(vocab | fuzz | set(curated))
    sql = _stem_via_sql(words)
    bad = [w for w in words if sql.get(w) != german2_stem(w)]
    assert not bad, f"{len(bad)} stem mismatches, e.g. {bad[:5]}"


def test_full_chain_matches_tokenize_positions_corpus():
    """Whole-corpus parity at sf0.001: per document, the SQL chain's
    (position, term) multiset equals the Python analyzer's."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    sql_by_doc = _sql_toks(con)
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    for doc_id, text in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        assert sql_by_doc.get(doc_id, []) == _py_toks(text), f"doc {doc_id}"


@pytest.mark.parametrize(
    "text",
    [
        "Die HÄUSER häuser haeuser von Gestern-Heute sind schön",
        "l'été très-tôt qu'il naïve coöperate ştr œuvre Straße",
        "don't re-enter e-mail spark‐stream über ÜBER ueber",
        "a the und der 123 foo_bar x1 ‐‐ -- '' über-maß",
        "",
        "mixedCASE WoRdS with ÆØÅ øre đavid þorn łódź ıstanbul",
        "Schifffahrts-Gesellschaft qu'est-ce l'aliénation d'après",
    ],
)
def test_full_chain_matches_on_fuzz_docs(text):
    """Accent/ligature/hyphen/apostrophe fuzz documents: folding,
    word-delimiter variants, catenation and stopword filtering all
    agree between SQL and Python."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    got = _sql_toks(con).get(1, [])
    assert got == _py_toks(text)


def test_stopword_stem_interaction():
    """Stop filtering precedes stemming: a stem equal to a stop word is
    kept (the reference's filter order)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    # "eines" is a stopword (dropped); "eine" is a stopword; "dieses"
    # stems to "dies" and survives
    con.execute("INSERT INTO documents VALUES (1, 'eines dieses Wartung')")
    got = _sql_toks(con).get(1, [])
    assert got == _py_toks("eines dieses Wartung")
    terms = {t for _p, t in got}
    assert "eines" not in terms and "dieses" in terms
    assert "wartung" in terms  # and its stem
    assert STOPWORDS  # sanity: the shared constant is non-empty
