"""Filter CLI end-to-end (subprocess, the reference's CliTest analogue)
and settings placeholder/merge/env semantics (Settings.java tests)."""

import json
import subprocess
import sys

import pytest

from limetrans_ray.state.settings import (
    ENV_PROFILES,
    deep_merge,
    expand_placeholders,
    load_settings,
)


class TestSettings:
    def test_deep_merge(self):
        base = {"a": 1, "b": {"x": 1, "y": 2}, "c": [1]}
        over = {"b": {"y": 3, "z": 4}, "c": [2], "d": 5}
        assert deep_merge(base, over) == {
            "a": 1, "b": {"x": 1, "y": 3, "z": 4}, "c": [2], "d": 5,
        }

    def test_expand_placeholders(self):
        obj = {"path": "${root}/data", "nested": ["${root}", {"k": "v-${env}"}], "n": 7}
        out = expand_placeholders(obj, {"root": "/tmp/x", "env": "dev"})
        assert out == {"path": "/tmp/x/data", "nested": ["/tmp/x", {"k": "v-dev"}], "n": 7}

    def test_unresolved_placeholder_fails(self):
        with pytest.raises(KeyError, match="nope"):
            expand_placeholders({"p": "${nope}"}, {})

    def test_load_settings_env_and_vars(self, tmp_path):
        cfg = tmp_path / "cfg.json"
        cfg.write_text(json.dumps({
            "vars": {"isil": "DE-605"},
            "index": {"root": "/tmp/${isil}/index", "retain": 9},
            "ray": {"num_cpus": 4},
        }))
        s = load_settings(str(cfg), env="dev", overrides={"index": {"root": "/o/${isil}"}})
        assert s["index"]["root"] == "/o/DE-605"
        assert s["index"]["retain"] == ENV_PROFILES["dev"]["index"]["retain"]
        assert s["ray"]["num_cpus"] == 32

    def test_unknown_env(self, tmp_path):
        cfg = tmp_path / "c.json"
        cfg.write_text("{}")
        with pytest.raises(ValueError, match="unknown env"):
            load_settings(str(cfg), env="staging")


class TestFilterCli:
    @pytest.fixture(scope="class")
    def doc_parquet(self, tmp_path_factory):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("cli")
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(6), pa.int64()),
                    "lang": ["en", "de", "en", "", "fr", "en"],
                    "text": ["alpha beta", "beta", "gamma", "alpha", "delta", "beta gamma"],
                }
            ),
            str(d / "docs.parquet"),
        )
        return str(d / "docs.parquet")

    def _run(self, doc_parquet, *args):
        import os

        proc = subprocess.run(
            [sys.executable, "-m", "limetrans_ray.filter_cli", doc_parquet, *args],
            capture_output=True, text=True, timeout=480,
            env={**os.environ, "RAY_GRAFT_CPUS": "4"},
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        return [json.loads(line) for line in proc.stdout.splitlines() if line.strip()]

    def test_equals_filter(self, doc_parquet):
        recs = self._run(doc_parquet, "-f", "lang=en")
        assert sorted(r["doc_id"] for r in recs) == [0, 2, 5]

    def test_regex_and_all(self, doc_parquet):
        recs = self._run(doc_parquet, "-f", "lang=en", "-f", "text=~beta")
        assert sorted(r["doc_id"] for r in recs) == [0, 5]

    def test_none_op_and_exists(self, doc_parquet):
        recs = self._run(doc_parquet, "--op", "none", "-f", "@lang")
        assert [r["doc_id"] for r in recs] == [3]
