"""Unit tests for the pure per-value functions (extract, analyzer,
urlnorm, textstats) — the reference's per-operator test layer
(SURVEY.md §5.6: StandardNumberTest / ISBNTest analogues)."""

import unicodedata

import numpy as np
import pytest
from hypothesis import given
from hypothesis import strategies as st

from limetrans_ray.functions.analyzer import (
    STOPWORDS,
    analyze_query,
    fold,
    simple_terms,
    token_variants,
    tokenize_index,
)
from limetrans_ray.functions.extract import extract_text
from limetrans_ray.functions.textstats import (
    count_tokens_bpeish,
    detect_language,
    fingerprint64,
    hamming64,
    jaccard,
    minhash_params,
    minhash_signature,
    quality_features,
    simhash64,
    stable_hash64,
    word_shingles,
)
from limetrans_ray.functions.urlnorm import canonical_url


class TestExtract:
    def test_strips_script_style_comments_tags(self):
        html = (
            b"<html><head><title>T</title><style>b{}</style>"
            b"<script>var x='<p>no</p>';</script></head>"
            b"<body><p>Hello</p><!-- no --><div>World</div></body></html>"
        )
        assert extract_text(html) == "T Hello World"

    def test_entities(self):
        assert extract_text(b"<p>a &amp; b &lt;c&gt; &#252; &#x00FC; &nbsp;x</p>") == (
            "a & b <c> ü ü x"
        )

    def test_unknown_entity_preserved(self):
        assert extract_text(b"<p>&bogus; &#xzz;</p>") == "&bogus; &#xzz;"

    def test_nfc_normalization(self):
        # decomposed u + combining diaeresis → composed ü (the
        # StreamUnicodeNormalizer analogue, FileQueue.java:182-184)
        decomposed = "über".encode()
        out = extract_text(b"<p>" + decomposed + b"</p>")
        assert out == "über"
        assert unicodedata.is_normalized("NFC", out)

    def test_whitespace_collapse_and_bytes_vs_str(self):
        assert extract_text("  a \n\t b  ") == "a b"
        assert extract_text(b"  a \n\t b  ") == "a b"

    def test_invalid_utf8_replaced(self):
        assert extract_text(b"<p>ok \xff\xfe</p>").startswith("ok ")


class TestAnalyzer:
    def test_hyphen_variant_expansion(self):
        assert tokenize_index("e-payment") == ["e", "payment", "epayment"]
        # stemmed forms append after the unstemmed variants (the
        # keyword_repeat → German2 → unique chain order)
        assert tokenize_index("Drei-Zinnen-Gebiet") == [
            "drei", "zinnen", "gebiet", "dreizinnengebiet", "zinn"
        ]
        assert tokenize_index("Drei-Zinnen-Gebiet", stem=False) == [
            "drei", "zinnen", "gebiet", "dreizinnengebiet"
        ]

    def test_fold(self):
        assert fold("Über") == "uber"
        assert fold("STRAẞE") == "strasse"
        assert fold("œuvre") == "oeuvre"
        assert fold("Résumé") == "resume"

    def test_stopwords_removed(self):
        assert tokenize_index("der die das web") == ["web"]
        assert "the" in STOPWORDS and "und" in STOPWORDS

    def test_apostrophe_split(self):
        assert tokenize_index("l'amour") == ["l", "amour", "lamour"]

    def test_tf_semantics(self):
        # each variant counts once per raw occurrence
        terms = tokenize_index("payment payment e-payment")
        assert terms.count("payment") == 3 and terms.count("epayment") == 1

    def test_analyze_query_groups(self):
        groups = analyze_query("holzbau-atlas web")
        assert groups == [("holzbau", "atlas", "holzbauatlas"), ("web",)]
        # stop-word-only tokens yield no group
        assert analyze_query("der die und") == []

    def test_variants_dedup_within_token(self):
        assert token_variants("go-go") == ("go", "gogo")
        # stop-word parts are filtered, catenation survives
        assert token_variants("a-a") == ("aa",)

    def test_simple_terms_sql_mirror(self):
        assert simple_terms("Hello, World 42!") == ["hello", "world", "42"]


class TestUrlNorm:
    @pytest.mark.parametrize(
        "raw",
        [
            "https://Site0.example/a",
            "https://site0.example/a/",
            "https://site0.example/a//",
            "https://site0.example/a?utm_source=x&utm_medium=y",
            "https://site0.example/a#frag",
            "https://site0.example/a?utm_source=x#frag",
        ],
    )
    def test_variants_collapse(self, raw):
        assert canonical_url(raw) == "https://site0.example/a"

    def test_non_utm_query_kept(self):
        assert canonical_url("https://h.example/a?q=1") == "https://h.example/a?q=1"

    def test_path_case_preserved(self):
        assert canonical_url("https://H.example/Path") == "https://h.example/Path"

    def test_batch_parity_edge_cases(self):
        # the vectorized KeyStage path must be byte-identical to the
        # scalar chain, including its RE2-divergence fallbacks
        # (trailing-newline '$' semantics, non-ASCII host lowercase)
        import pyarrow as pa

        from limetrans_ray.functions.urlnorm import canonical_url_batch

        urls = [
            "http://Example.COM/Path/page?x=1#frag",
            "https://A.b/c//",
            "HTTP://X.Y/z?utm_source=a",
            "ftp://Host.Name",
            "no-scheme/path/",
            "http://h/p?utm_x=1#f",
            "http://h/p\n",          # Python '$' matches before final \n
            "http://h/p/\n",
            "http://hö.st/Päth",     # non-ASCII host → scalar fallback
            "http://h/a#b#c",
            "",
            "http://h//",
            "weird\nmiddle/x/",
            "https://UPPER.HOST/K?utm",
            "http://h/p?notutm=1",
            "https://İstanbul.example/İ",
        ]
        assert canonical_url_batch(pa.array(urls)) == [
            canonical_url(u) for u in urls
        ]

    @given(
        st.lists(
            st.lists(
                st.sampled_from(
                    list("abcXZ09:/?#.&=_-%\n\täö😀") + ["://", "?utm", "//"]
                ),
                max_size=12,
            ).map("".join),
            max_size=30,
        )
    )
    def test_batch_parity_property(self, urls):
        import pyarrow as pa

        from limetrans_ray.functions.urlnorm import canonical_url_batch

        assert canonical_url_batch(pa.array(urls, pa.string())) == [
            canonical_url(u) for u in urls
        ]


class TestTextStats:
    def test_stable_hash_is_stable(self):
        assert stable_hash64("abc") == stable_hash64("abc")
        assert stable_hash64("abc") != stable_hash64("abd")

    def test_langid(self):
        assert detect_language("the cat sat on the mat and it was happy") == "en"
        assert detect_language("der hund ist auf der straße und er ist froh") == "de"
        assert detect_language("le chat est dans la maison avec le chien") == "fr"
        assert detect_language("") == "und"
        assert detect_language("xyzzy plugh") == "und"

    def test_quality_features(self):
        f = quality_features("The quick brown fox jumps over the lazy dog near the river bank today")
        assert f["n_tokens"] == 14 and 0 < f["quality"] <= 1.0
        assert quality_features("")["quality"] == 0.0

    def test_token_count_bpeish(self):
        assert count_tokens_bpeish("Hello, world!") == 4  # hello , world !

    def test_fingerprint_order_sensitive(self):
        assert fingerprint64("a b c") != fingerprint64("c b a")
        assert fingerprint64("a b c") == fingerprint64("A  b C!")

    def test_minhash_estimates_jaccard(self):
        a = word_shingles("the quick brown fox jumps over the lazy dog " * 5)
        b = word_shingles("the quick brown fox leaps over the lazy cat " * 5)
        pa_, pb_ = minhash_params(256)
        sa, sb = minhash_signature(a, pa_, pb_), minhash_signature(b, pa_, pb_)
        est = (sa == sb).mean()
        true = jaccard(a, b)
        assert abs(est - true) < 0.2

    def test_identical_docs_identical_signatures(self):
        a = word_shingles("alpha beta gamma delta")
        pa_, pb_ = minhash_params(64)
        assert np.array_equal(
            minhash_signature(a, pa_, pb_), minhash_signature(a.copy(), pa_, pb_)
        )

    def test_simhash_near_for_similar(self):
        s1 = simhash64("the quick brown fox jumps over the lazy dog " * 10)
        s2 = simhash64("the quick brown fox jumps over the lazy cat " * 10)
        s3 = simhash64("completely different words entirely unrelated topic matter")
        assert hamming64(s1, s2) < hamming64(s1, s3)


class TestBatchTokenizer:
    """The batched index-path tokenizer must equal the per-row
    tokenize_positions contract exactly (same analyzer chain — any
    divergence would silently fork index vs oracle tokenization)."""

    CASES = [
        "Holzbau-Atlas für die moderne Straße, e-payment Épayement RÉSUMÉ über",
        "", "   ", "the the the and of", "drei Zinnen gebiet drei zinnen",
        "a-b-c d'été l'atelier xyz123 42 ß æ œ",
        "payment market web search engine " * 50,
        "wort " * 3 + "anders-wort nochmal-anders",
    ]

    def _rand_texts(self, n=120, seed=7):
        rng = np.random.default_rng(seed)
        vocab = ["spark", "query", "join", "Straße", "e-payment",
                 "holzbau-atlas", "über", "the", "der", "datenbank",
                 "ätsch", "naïve", "crème"]
        return [
            " ".join(rng.choice(vocab, size=rng.integers(0, 120)).tolist())
            for _ in range(n)
        ]

    def test_parity_with_tokenize_positions(self):
        from limetrans_ray.functions.analyzer import (
            BatchTokenizer,
            tokenize_positions,
        )

        texts = self.CASES + self._rand_texts()
        bt = BatchTokenizer()
        terms_col, tfs_col, pos_col, doclens = bt.tokenize_texts(texts)
        for i, t in enumerate(texts):
            items = sorted(tokenize_positions(t).items())
            assert terms_col[i].as_py() == [k for k, _ in items], i
            assert tfs_col[i].as_py() == [len(p) for _, p in items], i
            assert pos_col[i].as_py() == [p for _, p in items], i
            assert doclens[i] == sum(len(p) for _, p in items), i

    def test_batch_split_invariance(self):
        from limetrans_ray.functions.analyzer import BatchTokenizer

        texts = self.CASES + self._rand_texts()
        whole = BatchTokenizer().tokenize_texts(texts)
        bt = BatchTokenizer()
        h1 = bt.tokenize_texts(texts[:7])
        h2 = bt.tokenize_texts(texts[7:])
        assert h1[0].to_pylist() + h2[0].to_pylist() == whole[0].to_pylist()
        assert h1[2].to_pylist() + h2[2].to_pylist() == whole[2].to_pylist()

    def test_all_stopword_and_empty_batch(self):
        from limetrans_ray.functions.analyzer import BatchTokenizer

        bt = BatchTokenizer()
        terms_col, tfs_col, pos_col, doclens = bt.tokenize_texts(
            ["the and of", "", "der die das"]
        )
        assert terms_col.to_pylist() == [[], [], []]
        assert pos_col.to_pylist() == [[], [], []]
        assert doclens.tolist() == [0, 0, 0]
