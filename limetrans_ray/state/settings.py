"""Pipeline settings: JSON with ``${placeholder}`` expansion, deep
merge and environment profiles.

The analogue of the reference's configuration surface (reference
core/src/main/java/hbz/limetrans/util/Settings.java:20,226-313 —
placeholder expansion + deep merge; main/src/main/java/hbz/limetrans/
Main.java:33-105 — ``Env.prod/dev/local`` profiles rewriting
cluster/host settings). Our profiles rewrite Ray/pipeline knobs
instead (cpu counts, index root, retention).
"""

from __future__ import annotations

import json
import re
from typing import Any

_PLACEHOLDER_RE = re.compile(r"\$\{([^}]+)\}")

ENV_PROFILES: dict[str, dict[str, Any]] = {
    "local": {"ray": {"num_cpus": 8}, "index": {"retain": 1}},
    "dev": {"ray": {"num_cpus": 32}, "index": {"retain": 2}},
    "prod": {"ray": {"num_cpus": None}, "index": {"retain": 2}},  # None → all
}


def deep_merge(base: dict, override: dict) -> dict:
    """Recursive dict merge; ``override`` wins, nested dicts merge
    (Settings.java:226-247 semantics)."""
    out = dict(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = deep_merge(out[k], v)
        else:
            out[k] = v
    return out


def expand_placeholders(obj: Any, variables: dict[str, Any]) -> Any:
    """Expand ``${var}`` in every string value (Settings.java:296-313).
    Unknown placeholders raise KeyError (fail-fast, like the reference's
    unresolved-placeholder error)."""

    def expand_str(s: str) -> str:
        def sub(m: re.Match) -> str:
            key = m.group(1)
            if key not in variables:
                raise KeyError(f"unresolved settings placeholder: ${{{key}}}")
            return str(variables[key])

        return _PLACEHOLDER_RE.sub(sub, s)

    if isinstance(obj, str):
        return expand_str(obj)
    if isinstance(obj, dict):
        return {k: expand_placeholders(v, variables) for k, v in obj.items()}
    if isinstance(obj, list):
        return [expand_placeholders(v, variables) for v in obj]
    return obj


def load_settings(
    path: str,
    *,
    env: str | None = None,
    variables: dict[str, Any] | None = None,
    overrides: dict | None = None,
) -> dict:
    """Load a settings JSON, apply the env profile, expand placeholders
    from ``variables`` (plus any top-level ``"vars"`` block in the
    file), then apply explicit ``overrides`` (deepest-wins order:
    file < env profile < overrides)."""
    with open(path) as fh:
        settings = json.load(fh)
    if env is not None:
        if env not in ENV_PROFILES:
            raise ValueError(f"unknown env profile {env!r} (have {sorted(ENV_PROFILES)})")
        settings = deep_merge(settings, ENV_PROFILES[env])
    if overrides:
        settings = deep_merge(settings, overrides)
    merged_vars = dict(settings.get("vars", {}))
    if variables:
        merged_vars.update(variables)
    return expand_placeholders(settings, merged_vars)
