"""Deterministic synthetic webtext generator (FIXTURES.md §1-2).

Produces the authoritative input shape from ``BASELINE.json.input_hint``:

    (url: string, warc_ts: timestamp[us], html: binary, text: string,
     lang: string)

mirroring the reference's tiny golden corpora strategy (the 10-record
``10.marc21`` / ``alma.xml.gz`` inputs under reference
main/src/test/resources/limetrans/input/) at three tiers: t1 smoke
(100 rows), t2 correctness (10k rows), bench (1M+ rows). Everything is
seeded (default 42), wall-clock-free and vectorized so the bench tier
generates in seconds.

Properties exercised downstream:

- ~``dupe_frac`` of rows are URL-variant duplicates of earlier rows
  (trailing slash / ``?utm_...`` / ``#fragment``) with identical HTML —
  the exact-dedup stage must collapse them (canonical_url key);
- for ~half the rows ``text`` is pre-supplied and equals
  ``extract_text(html)`` byte-for-byte (the per-url invariant); for the
  rest it is empty and the engine must populate it;
- ``lang`` is drawn from {de, en, fr, ""} — empty rows exercise the
  language-tagging stage;
- fixed "query family" documents (FIXTURES.md §2: e-payment,
  holzbau-atlas, drei-zinnen-gebiet, umlaut/fold rows) are embedded at
  known urls so analyzer/query conformance tests can address them.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.extract import extract_text

EPOCH_US = 1_577_836_800_000_000  # 2020-01-01T00:00:00Z in µs

_VOCAB = {
    "en": (
        "web page crawl index search engine data query token term document "
        "score rank text html link site host path server client cache fetch "
        "parse build merge shard block store read write stream batch filter "
        "sort group join count list map hash key value record field payment "
        "market report study analysis system model test result time year "
        "city music history science nature travel food sport news weather"
    ).split(),
    "de": (
        "seite netz suche daten wert haus baum stadt land wasser himmel "
        "buch titel werk verlag jahr zeit welt mensch leben arbeit schule "
        "straße brücke käse vogel wald berg fluss meer insel garten markt "
        "bericht studie system modell ergebnis musik geschichte natur reise "
        "essen sport nachricht wetter zahlung handel wissen sprache wort"
    ).split(),
    "fr": (
        "page réseau recherche données valeur maison arbre ville pays eau "
        "ciel livre titre œuvre année temps monde vie travail école rue "
        "pont fromage oiseau forêt montagne fleuve mer île jardin marché "
        "rapport étude système modèle résultat musique histoire nature "
        "voyage nourriture sport nouvelle météo paiement commerce savoir"
    ).split(),
}
_LANGS = np.array(["en", "de", "fr"])
_LANG_P = np.array([0.6, 0.25, 0.15])

# FIXTURES.md §2 query-family bodies, embedded at urls
# https://site0.example/family/<idx>
QUERY_FAMILY_TEXTS = [
    "e-payment systems for the modern web",
    "epayment systems for the modern web",
    "e payment systems for the modern web",
    "der holzbau-atlas",
    "der holzbauatlas",
    "der holzbau atlas",
    "holzbau",
    "atlas der baukunst",
    "foo holzbau-atlas bar",
    "das drei-zinnen-gebiet in den dolomiten",
    "das drei zinnen gebiet in den dolomiten",
    "das dreizinnengebiet in den dolomiten",
    "das drei-zinnen gebiet in den dolomiten",
    "das drei zinnen-gebiet in den dolomiten",
    "zinnen und berge",
    "über die straße zur schule",
    "uber die strasse zur schule",
    "résumé of the année",
    "payment market report with a rare xylophone term",
    "payment payment payment market",
]

_HTML_TMPL = (
    "<html><head><title>{title}</title>"
    "<style>body {{ margin: 0; }}</style>"
    "<script>var tracker = 'ignore-me-{i}';</script>"
    "</head><body>"
    "<nav><a href=\"/home\">Home</a> <a href=\"/about\">About</a></nav>"
    "<h1>{title}</h1><p>{body}</p>"
    "<!-- comment {i} --><footer>generated fixture</footer>"
    "</body></html>"
)


def family_url(idx: int) -> str:
    return f"https://site0.example/family/{idx}"


def generate_webtext_table(
    n_rows: int,
    seed: int = 42,
    *,
    dupe_frac: float = 0.08,
    n_hosts: int = 50,
    min_words: int = 20,
    max_words: int = 200,
    include_family: bool = True,
) -> pa.Table:
    """Build one deterministic webtext Arrow table of ``n_rows`` rows."""
    rng = np.random.default_rng(seed)
    lang_idx = rng.integers(0, 3, size=n_rows)
    lang_choice = _LANGS[
        np.searchsorted(np.cumsum(_LANG_P), rng.random(n_rows), side="right").clip(0, 2)
    ]
    del lang_idx
    n_words = rng.integers(min_words, max_words + 1, size=n_rows)
    # pre-draw all word indices in one shot, split per doc
    totals = int(n_words.sum())
    word_draws = rng.integers(0, 10_000, size=totals)
    bounds = np.cumsum(n_words)[:-1]
    per_doc = np.split(word_draws, bounds)

    lang_fill = rng.random(n_rows) < 0.12  # lang column left empty → tagging stage
    text_given = rng.random(n_rows) < 0.5
    dupe_of = np.full(n_rows, -1, dtype=np.int64)
    dupe_mask = (rng.random(n_rows) < dupe_frac) & (np.arange(n_rows) > 10)
    dupe_of[dupe_mask] = rng.integers(0, 10**9, size=int(dupe_mask.sum())) % np.flatnonzero(
        dupe_mask
    )
    dupe_kind = rng.integers(0, 3, size=n_rows)

    n_family = len(QUERY_FAMILY_TEXTS) if include_family and n_rows > 40 else 0

    urls: list[str] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    ts = EPOCH_US + (np.arange(n_rows, dtype=np.int64) * 1_000_003) % (86_400_000_000 * 365)

    for i in range(n_rows):
        if i < n_family:
            body = QUERY_FAMILY_TEXTS[i]
            url = family_url(i)
            lang = "de" if i >= 3 else "en"
            title = f"family {i}"
        elif dupe_of[i] >= 0:
            j = int(dupe_of[i])
            kind = int(dupe_kind[i])
            base_url = urls[j].split("#")[0].split("?")[0].rstrip("/")
            url = (
                base_url + "/"
                if kind == 0
                else base_url + "?utm_source=feed"
                if kind == 1
                else base_url + "#section-2"
            )
            urls.append(url)
            htmls.append(htmls[j])
            texts.append(texts[j])
            langs.append(langs[j])
            continue
        else:
            lang = str(lang_choice[i])
            vocab = _VOCAB[lang]
            words = [vocab[w % len(vocab)] for w in per_doc[i]]
            body = " ".join(words)
            title = " ".join(words[:3]) if words else "page"
            url = f"https://site{i % n_hosts}.example/{lang}/p{i // n_hosts}"
        html = _HTML_TMPL.format(title=title, body=body, i=i).encode("utf-8")
        urls.append(url)
        htmls.append(html)
        texts.append(extract_text(html) if text_given[i] or i < n_family else "")
        langs.append("" if lang_fill[i] and i >= n_family else lang)

    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(ts, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def write_webtext(
    out_dir: str,
    n_rows: int,
    n_files: int = 1,
    seed: int = 42,
    **kwargs,
) -> list[str]:
    """Write the tier as ``n_files`` parquet files (one deterministic
    sub-table per file, seeded ``seed + file_idx``; the family docs only
    in file 0). Returns the file paths. Skips generation if the files
    already exist (idempotent cache for bench runs)."""
    os.makedirs(out_dir, exist_ok=True)
    per = [n_rows // n_files + (1 if f < n_rows % n_files else 0) for f in range(n_files)]
    paths = [os.path.join(out_dir, f"webtext-{f:05d}.parquet") for f in range(n_files)]
    if all(os.path.exists(p) for p in paths) and os.path.exists(
        os.path.join(out_dir, "_COMPLETE")
    ):
        return paths
    host_base = 0
    for f, (path, n) in enumerate(zip(paths, per)):
        tbl = generate_webtext_table(
            n, seed=seed + f, include_family=(f == 0), **kwargs
        )
        # make urls unique across files by rewriting the host index space
        if f > 0:
            urls = tbl.column("url").to_pylist()
            urls = [u.replace("https://site", f"https://f{f}site", 1) for u in urls]
            tbl = tbl.set_column(0, "url", pa.array(urls, type=pa.string()))
        pq.write_table(tbl, path)
        host_base += n
    with open(os.path.join(out_dir, "_COMPLETE"), "w") as fh:
        fh.write(f"{n_rows} rows in {n_files} files, seed={seed}\n")
    return paths
