"""Settings-driven pipeline runner conformance (pipelines/run.py — the
reference Main analogue: FileQueue → decoder → fix → writer, reference
Main.java:33-105 / Limetrans.java:236-316)."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from limetrans_ray.pipelines.run import _nest_record, run_settings


class TestNestRecord:
    def test_scalars_lists_and_subfields(self):
        rows = [
            dict(record_id="r", field="title", subfield="", occurrence=0, value="x"),
            dict(record_id="r", field="lang", subfield="", occurrence=0, value="de"),
            dict(record_id="r", field="lang", subfield="", occurrence=1, value="en"),
            dict(record_id="r", field="person", subfield="name", occurrence=0, value="a"),
            dict(record_id="r", field="person", subfield="role", occurrence=0, value="aut"),
            dict(record_id="r", field="person", subfield="name", occurrence=1, value="b"),
        ]
        assert _nest_record(rows) == {
            "title": "x",
            "lang": ["de", "en"],
            "person": [{"name": "a", "role": "aut"}, {"name": "b"}],
        }

    def test_json_decode_roundtrip(self):
        # decoder conventions → nest inverse for representative shapes
        from limetrans_ray.functions.jsonrec import decode_json_records

        src = {"title": "x", "lang": ["de", "en"], "person": {"name": "a"}}
        rows = decode_json_records(json.dumps(src), id_prefix="r")
        assert _nest_record(rows) == src


@pytest.fixture()
def jsonl_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "a.jsonl").write_text(
        '{"id": 1, "lang": "de", "title": "Der Holzbau"}\n'
        '{"id": 2, "lang": "xx", "title": "Unknown"}\n'
    )
    (d / "b.jsonl").write_text('{"id": 3, "lang": "en", "title": "Payment"}\n')
    return str(d)


def _settings(jsonl_dir, out):
    return {
        "input": {
            "queue": {
                "path": jsonl_dir, "pattern": "*.jsonl",
                "processor": "JSONL", "sort_by": "name",
            }
        },
        "transformation": {
            "fix": [
                ["lookup", {"field": "lang",
                            "table": {"de": "German", "en": "English"},
                            "default": "Other"}],
                ["retain", {"fields": ["lang", "title"]}],
            ]
        },
        "output": out,
    }


def test_jsonl_pipeline_end_to_end(ray_session, tmp_path, jsonl_dir):
    out = str(tmp_path / "out.jsonl")
    summary = run_settings(_settings(jsonl_dir, {"jsonl": out}))
    assert summary["files"] == 2 and summary["records"] == 3
    recs = [json.loads(line) for line in open(out)]
    assert sorted((r["lang"], r["title"]) for r in recs) == [
        ("English", "Payment"), ("German", "Der Holzbau"), ("Other", "Unknown"),
    ]


def test_formeta_sink_round_trips(ray_session, tmp_path, jsonl_dir):
    from limetrans_ray.functions.formeta import decode_formeta

    out = str(tmp_path / "out.formeta")
    summary = run_settings(_settings(jsonl_dir, {"formeta": out}))
    assert summary["records"] == 3
    langs = set()
    for line in open(out):
        rows = decode_formeta(line.rstrip("\n"))
        langs.update(r["value"] for r in rows if r["field"] == "lang")
    assert langs == {"German", "English", "Other"}


def test_parquet_sink_keeps_flat_rows(ray_session, tmp_path, jsonl_dir):
    out = str(tmp_path / "rows")
    run_settings(_settings(jsonl_dir, {"parquet": out}))
    tbl = pq.read_table(out)
    assert set(tbl.column_names) >= {"record_id", "field", "value"}
    assert tbl.num_rows == 6  # 3 records × (lang, title)


def test_parquet_index_output(ray_session, tmp_path):
    from limetrans_ray.pipelines.search import SearchEngine

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1], "text": ["alpha beta", "beta gamma"]}),
        str(d / "docs.parquet"),
    )
    root = str(tmp_path / "idx")
    summary = run_settings(
        {
            "input": {"queue": {"path": str(d), "pattern": "*.parquet",
                                "processor": "PARQUET"}},
            "output": {"index": {"root": root, "analyzer": "simple"}},
        }
    )
    assert summary["n_docs"] == 2
    assert {d_ for d_, _ in SearchEngine(root).search("beta", 10)} == {0, 1}


def test_index_output_postings_codec_option(ray_session, tmp_path):
    """The settings surface carries build options (postings-codec) to
    IndexBuildConfig, and unknown options raise instead of being
    silently dropped."""
    import json as _json

    from limetrans_ray.pipelines.search import SearchEngine
    from limetrans_ray.state.manifest import build_dir, current_build

    d = tmp_path / "docs"
    d.mkdir()
    pq.write_table(
        pa.table({"doc_id": [0, 1, 2],
                  "text": ["alpha beta", "beta gamma", "beta beta alpha"]}),
        str(d / "docs.parquet"),
    )
    root = str(tmp_path / "idx")
    settings = {
        "input": {"queue": {"path": str(d), "pattern": "*.parquet",
                            "processor": "PARQUET"}},
        "output": {"index": {"root": root, "analyzer": "simple",
                             "postings-codec": "for"}},
    }
    summary = run_settings(settings)
    assert summary["n_docs"] == 3
    import pathlib

    stats = _json.loads(
        (pathlib.Path(build_dir(root, current_build(root))) / "stats.json")
        .read_text()
    )
    assert stats["postings_codec"] == "for"
    hits = SearchEngine(root).search("beta", 10)
    assert [d_ for d_, _ in hits][0] == 2  # tf=2 ranks first

    bad = {**settings, "output": {"index": {"root": root, "nope": 1}}}
    with pytest.raises(ValueError, match="unknown index options"):
        run_settings(bad)


def test_settings_file_with_vars_and_validation(ray_session, tmp_path, jsonl_dir):
    cfg = tmp_path / "settings.json"
    cfg.write_text(json.dumps(
        _settings(jsonl_dir, {"jsonl": "${outdir}/records.jsonl"})
    ))
    out_dir = tmp_path / "o"
    out_dir.mkdir()
    summary = run_settings(str(cfg), variables={"outdir": str(out_dir)})
    assert summary["records"] == 3

    with pytest.raises(ValueError, match="exactly one"):
        run_settings(_settings(jsonl_dir, {}))
    with pytest.raises(ValueError, match="no files"):
        bad = _settings(jsonl_dir, {"jsonl": "x"})
        bad["input"]["queue"]["pattern"] = "*.nope"
        run_settings(bad)
    with pytest.raises(ValueError, match="record processors"):
        cols = _settings(jsonl_dir, {"parquet": str(tmp_path / "p")})
        cols["input"]["queue"]["pattern"] = "*.jsonl"
        cols["input"]["queue"]["processor"] = "PARQUET"
        run_settings(cols)


def test_fix_file_transformation(ray_session, tmp_path, jsonl_dir):
    """A Metafix .fix text file as the transformation — compiled by
    fixparser into the same RecordOps program the inline form uses."""
    fix_path = tmp_path / "prog.fix"
    fix_path.write_text(
        'put_map("langs", "de": "German", "en": "English")\n'
        'lookup("lang", "langs", default: "$[fallback]")\n'
        'retain("lang", "title")\n'
    )
    out = str(tmp_path / "out_fix.jsonl")
    settings = _settings(jsonl_dir, {"jsonl": out})
    settings["transformation"] = {
        "fix-file": str(fix_path), "vars": {"fallback": "Other"}
    }
    summary = run_settings(settings)
    assert summary["records"] == 3
    recs = [json.loads(line) for line in open(out)]
    assert sorted((r["lang"], r["title"]) for r in recs) == [
        ("English", "Payment"), ("German", "Der Holzbau"), ("Other", "Unknown"),
    ]


def test_metamorph_xml_transformation(ray_session, tmp_path, jsonl_dir):
    """A Metamorph .xml rule file as the transformation — the engine
    selection the reference keys on the rules file's extension
    (Limetrans.java:155-189): same settings surface, morphparser loads
    it onto the same RecordOps program."""
    xml_path = tmp_path / "prog.xml"
    xml_path.write_text(
        """<?xml version="1.0" encoding="UTF-8"?>
        <metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
          <map name="langs">
            <entry name="de" value="German"/>
            <entry name="en" value="English"/>
          </map>
          <rules>
            <data source="lang">
              <lookup in="langs" default="Other"/>
            </data>
            <data source="title"/>
          </rules>
        </metamorph>"""
    )
    out = str(tmp_path / "out_xml.jsonl")
    settings = _settings(jsonl_dir, {"jsonl": out})
    settings["transformation"] = {"fix-file": str(xml_path)}
    summary = run_settings(settings)
    assert summary["records"] == 3
    recs = [json.loads(line) for line in open(out)]
    assert sorted((r["lang"], r["title"]) for r in recs) == [
        ("English", "Payment"), ("German", "Der Holzbau"), ("Other", "Unknown"),
    ]


def test_fix_and_fix_file_mutually_exclusive(ray_session, tmp_path, jsonl_dir):
    settings = _settings(jsonl_dir, {"jsonl": str(tmp_path / "x.jsonl")})
    settings["transformation"]["fix-file"] = str(tmp_path / "nope.fix")
    with pytest.raises(ValueError, match="fix OR fix-file"):
        run_settings(settings)


def test_run_settings_morph_collector_program(ray_session, tmp_path, jsonl_dir):
    """A COLLECTOR Metamorph program (entity + combine) through the
    settings runner: the .xml routes to the morph_stream event machine
    and the jsonl sink carries its entity output."""
    import json

    xml_path = tmp_path / "collect.xml"
    xml_path.write_text(
        """<?xml version="1.0" encoding="UTF-8"?>
        <metamorph xmlns="http://www.culturegraph.org/metamorph" version="1">
          <rules>
            <entity name="Doc" flushWith="record">
              <data source="title" name="title"/>
              <combine name="tag" value="${l}:${t}">
                <data source="lang" name="l"/>
                <data source="title" name="t"/>
              </combine>
            </entity>
          </rules>
        </metamorph>"""
    )
    out = str(tmp_path / "out_collect.jsonl")
    settings = _settings(jsonl_dir, {"jsonl": out})
    settings["transformation"] = {"fix-file": str(xml_path)}
    summary = run_settings(settings)
    assert summary["records"] == 3
    recs = [json.loads(line) for line in open(out)]
    docs = sorted(r["Doc"]["tag"] for r in recs if "Doc" in r)
    assert docs == ["de:Der Holzbau", "en:Payment", "xx:Unknown"]
