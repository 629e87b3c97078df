"""Metamorph XML rule loader — the reference's SECOND transformation
engine, onto the same RecordOps vocabulary as the fix parser.

The reference runs every transformation under BOTH engines (engine
selection Limetrans.java:155-189; MetamorphTransformationTest vs
MetafixTransformationTest over the same goldens). This module loads the
``<metamorph>`` rule subset those test configs exercise (reference
main/src/test/resources/limetrans/rules/{noop,nonull,elasticsearch}.xml
plus the macro/map machinery of transformation/macros.xml):

- ``<vars>`` + ``$[var]`` substitution, ``<xi:include>`` resolution
- ``<map name><entry name value/></map>`` + ``<lookup in>``
- ``<macro name>`` definitions + ``<call-macro name ...>`` (attributes
  become scoped vars, like the reference's Metamorph macros)
- ``<rules>`` with ``<data source [name]>`` rules carrying the value
  transforms ``<trim/> <case to/> <constant value/> <replace pattern
  with/> <regexp match [format]/> <equals string/> <not-equals string/>
  <compose prefix postfix/> <switch-name-value/> <lookup in/>``
- ``<if>`` guards with ``<equals/not-equals/regexp>`` conditions on a
  ``<data source>`` (quantifier wrappers ``<all/any/none>`` map to the
  any_/all_/none_ predicate families)

Semantics notes (Metamorph is a WHITELIST engine — only data matched
by a rule reaches the output, unlike Metafix's in-place record
mutation):

- the compiled program ends in a ``retain`` over the rules' output
  names; a ``<data source="*">`` rule keeps every field (no retain)
- ``<regexp>`` uses ``Matcher.find`` semantics: non-matching values are
  dropped from the stream, matching values become the match itself (or
  the ``format`` with ``${n}`` group substitution) — the regexp_match
  record op
- a ``<data>`` rule without ``name`` emits under the literal's own
  name; combined with a wildcard ``source`` other than ``"*"`` that
  would need per-row renaming the flat-row compile cannot express, so
  it raises :class:`MorphCompileError` (documented subset boundary).
  ``<entity>`` grouping (concat/combine/flushWith stream aggregation)
  is likewise out of subset and raises.

KNOWN DEVIATION: Metamorph's ``<data>`` rules fire per literal in
STREAM order and can interleave; the compiled form applies rules in
document order over whole records (the RecordOps partitioning
contract), which is observationally identical for the per-field
transform subset above.
"""

from __future__ import annotations

import os
import xml.etree.ElementTree as ET

from .fixparser import _java_regex_to_python, _java_replacement_to_python

__all__ = ["MorphCompileError", "compile_morph", "load_morph"]

_NS = "{http://www.culturegraph.org/metamorph}"
_XI = "{http://www.w3.org/2001/XInclude}"


class MorphCompileError(Exception):
    pass


def _tag(el) -> str:
    """Local tag name without namespace."""
    t = el.tag
    return t.split("}", 1)[1] if "}" in t else t


class _MorphCompiler:
    def __init__(self, *, vars=None, base_dir=None, maps=None,
                 missing_maps="error"):
        self.missing_maps = missing_maps
        self.vars = dict(vars or {})
        self.base_dir = base_dir
        self.maps: dict[str, dict] = dict(maps or {})
        self.macros: dict[str, ET.Element] = {}
        self.ops: list = []
        self.out_fields: list[str] = []
        self.keep_all = False
        self.rule_els: list = []   # rules gathered across includes
        self.shapes: dict = {"array_fields": set(), "array_subs": set()}

    # -- var substitution ($[name], the reference's Metamorph syntax)
    def _sub(self, s: str | None) -> str | None:
        if s is None:
            return None
        out, i = [], 0
        while True:
            j = s.find("$[", i)
            if j < 0:
                out.append(s[i:])
                return "".join(out)
            k = s.find("]", j)
            if k < 0:
                raise MorphCompileError(f"unterminated $[ in {s!r}")
            name = s[j + 2:k]
            if name not in self.vars:
                raise MorphCompileError(f"undefined morph var $[{name}]")
            out.append(s[i:j])
            out.append(str(self.vars[name]))
            i = k + 1

    # -- document walk ------------------------------------------------
    def compile(self, root: ET.Element) -> list:
        if _tag(root) != "metamorph":
            raise MorphCompileError(f"root element is {_tag(root)!r}")
        self._walk_children(root)
        from .morphstream import (
            compile_stream_rules,
            has_collectors,
            spec_shapes,
        )

        if has_collectors(self.rule_els, _tag, self.macros):
            # collector programs run as ONE per-record event machine
            # (functions/morphstream.py) — Metamorph's own execution
            # model; the vectorized path below stays the fast path for
            # plain data-rule programs
            spec = compile_stream_rules(self, self.rule_els)
            for k, v in spec_shapes(spec).items():
                self.shapes[k].update(v)
            return [("morph_stream", {"spec": spec})]
        for rule in self.rule_els:
            self._compile_rule(rule)
        if not self.keep_all:
            self.ops.append(
                ("retain", {"fields": list(dict.fromkeys(self.out_fields)),
                            "prefix": True})
            )
        return self.ops

    def _walk_children(self, el) -> None:
        for child in el:
            t = _tag(child)
            if t == "vars":
                for v in child:
                    if _tag(v) == "var":
                        self.vars.setdefault(
                            v.get("name"), v.get("value", "")
                        )
            elif t == "include":  # xi:include
                self._include(child.get("href"))
            elif t == "map":
                name = child.get("name")
                self.maps[name] = {
                    e.get("name"): e.get("value", "")
                    for e in child if _tag(e) == "entry"
                }
            elif t == "macro":
                self.macros[child.get("name")] = child
            elif t in ("macros", "maps", "metamorph"):
                self._walk_children(child)
            elif t == "rules":
                self.rule_els.extend(list(child))
            else:
                raise MorphCompileError(f"unsupported top-level <{t}>")

    def _include(self, href: str) -> None:
        if self.base_dir is None:
            raise MorphCompileError("xi:include needs a base directory")
        path = os.path.normpath(os.path.join(self.base_dir, href))
        tree = ET.parse(path)
        old = self.base_dir
        self.base_dir = os.path.dirname(path)
        try:
            root = tree.getroot()
            t = _tag(root)
            # an included document's ROOT may itself be a <map> or a
            # <rules> block (transformation/maps/*.xml, common/*.xml)
            # — XInclude splices the element where the include sits
            if t == "map":
                self.maps[root.get("name")] = {
                    e.get("name"): e.get("value", "")
                    for e in root if _tag(e) == "entry"
                }
            elif t == "rules":
                self.rule_els.extend(list(root))
            else:
                self._walk_children(root)
        finally:
            self.base_dir = old

    # -- rules ----------------------------------------------------------
    def _compile_rule(self, rule, ops_out=None) -> None:
        ops_out = self.ops if ops_out is None else ops_out
        t = _tag(rule)
        if t == "data":
            self._compile_data(rule, ops_out)
        elif t == "call-macro":
            name = rule.get("name")
            if name not in self.macros:
                raise MorphCompileError(f"unknown macro {name!r}")
            saved = self.vars
            # ALL attributes become macro vars — including "name"
            # (macros.xml personName uses $[name] as the literal name)
            self.vars = {
                **self.vars,
                **{k: self._sub(v) for k, v in rule.attrib.items()},
            }
            try:
                for inner in self.macros[name]:
                    self._compile_rule(inner, ops_out)
            finally:
                self.vars = saved
        elif t == "entity":
            raise MorphCompileError(
                "<entity> stream grouping is outside the supported "
                "Metamorph subset (see module docstring)"
            )
        else:
            raise MorphCompileError(f"unsupported rule <{t}>")

    def _split_source(self, source: str) -> tuple[str, str | None]:
        """Metamorph source path → (field, subfield): a trailing
        single-char dotted component is a MARC subfield code, matching
        the fix parser's selector convention."""
        if "." in source:
            head, _, last = source.rpartition(".")
            if len(last) == 1:
                return head, last
        return source, None

    def _compile_data(self, data, ops_out) -> None:
        source = self._sub(data.get("source"))
        if not source:
            raise MorphCompileError("<data> needs a source")
        name = self._sub(data.get("name"))
        field, sub = self._split_source(source)
        guards: list[tuple] = []
        transforms: list[ET.Element] = []
        for child in data:
            if _tag(child) == "if":
                guards.append(self._compile_cond(child))
            else:
                transforms.append(child)

        inner: list = []
        if source == "*":
            if name:
                raise MorphCompileError(
                    '<data source="*"> cannot rename (per-row names)'
                )
            self.keep_all = True
            target, target_sub = "*", None
        elif name:
            kw = {"src": field, "dst": name, "dst_sub": None}
            if sub is not None:
                kw["src_sub"] = sub
            inner.append(("copy_field", kw))
            target, target_sub = name, None
        else:
            if "?" in field or "*" in field or (sub and "?" in sub):
                raise MorphCompileError(
                    f"wildcard source {source!r} without name= needs "
                    "per-row renaming (outside the subset)"
                )
            target, target_sub = field, sub
        self.out_fields.append(target if target != "*" else "*")

        def tkw(extra=None):
            kw = {"field": target}
            if target_sub is not None:
                kw["subfield"] = target_sub
            kw.update(extra or {})
            return kw

        for tr in transforms:
            tt = _tag(tr)
            if tt == "trim":
                inner.append(("trim", tkw()))
            elif tt == "case":
                to = tr.get("to", "upper")
                inner.append(
                    ("upcase" if to == "upper" else "downcase", tkw())
                )
            elif tt == "constant":
                inner.append(
                    ("replace_all", tkw({
                        "pattern": r"[\s\S]*",
                        "replacement": self._sub(tr.get("value", "")),
                    }))
                )
            elif tt == "replace":
                inner.append(
                    ("replace_all", tkw({
                        "pattern": _java_regex_to_python(
                            self._sub(tr.get("pattern"))
                        ),
                        "replacement": _java_replacement_to_python(
                            self._sub(tr.get("with", ""))
                        ),
                    }))
                )
            elif tt == "regexp":
                kw = tkw({
                    "pattern": _java_regex_to_python(
                        self._sub(tr.get("match"))
                    )
                })
                if tr.get("format") is not None:
                    kw["format"] = self._sub(tr.get("format"))
                inner.append(("regexp_match", kw))
            elif tt == "equals":
                inner.append(
                    ("filter_values", tkw({
                        "pattern": _anchored(self._sub(tr.get("string"))),
                    }))
                )
            elif tt == "not-equals":
                inner.append(
                    ("filter_values", tkw({
                        "pattern": _anchored(self._sub(tr.get("string"))),
                        "invert": True,
                    }))
                )
            elif tt == "compose":
                if tr.get("prefix"):
                    inner.append(
                        ("prepend", tkw({"value": self._sub(tr.get("prefix"))}))
                    )
                if tr.get("postfix"):
                    inner.append(
                        ("append", tkw({"value": self._sub(tr.get("postfix"))}))
                    )
            elif tt == "switch-name-value":
                inner.append(("switch_name_value", tkw()))
            elif tt == "substring":
                # SubstringFunction: Java value.substring(start, end),
                # end exclusive; end absent/0 → to end of string
                start = int(self._sub(tr.get("start", "0")))
                end = int(self._sub(tr.get("end", "0")))
                kw = tkw({"start": start})
                if end > 0:
                    kw["length"] = end - start
                inner.append(("substring", kw))
            elif tt == "occurrence":
                only = self._sub(tr.get("only", "1"))
                if not only.isdigit():
                    raise MorphCompileError(
                        f"<occurrence only={only!r}> — only plain Nth "
                        "occurrence is supported"
                    )
                kw = tkw({"n": int(only)})
                if tr.get("sameEntity") == "true":
                    kw["same_entity"] = True
                inner.append(("take_occurrence", kw))
            elif tt == "unique":
                inner.append(("unique_values", tkw()))
            elif tt == "split":
                inner.append(
                    ("split_field", tkw({
                        "pattern": _java_regex_to_python(
                            self._sub(tr.get("delimiter"))
                        ),
                    }))
                )
            elif tt == "lookup":
                mname = self._sub(tr.get("in"))
                if mname not in self.maps:
                    if self.missing_maps == "empty":
                        self.maps[mname] = {}
                    else:
                        raise MorphCompileError(
                            f"unknown morph map {mname!r}"
                        )
                kw = tkw({"table": dict(self.maps[mname])})
                dflt = tr.get("default")
                if dflt is not None:
                    kw["default"] = self._sub(dflt)
                else:
                    # Metamorph Lookup without default drops misses
                    kw["delete"] = True
                inner.append(("lookup", kw))
            else:
                raise MorphCompileError(f"unsupported transform <{tt}>")

        for pred in reversed(guards):
            inner = [("if", {"pred": pred, "ops": inner})]
        ops_out.extend(inner)

    # -- <if> conditions ------------------------------------------------
    def _compile_cond(self, if_el) -> tuple:
        kids = list(if_el)
        if len(kids) != 1:
            raise MorphCompileError("<if> needs exactly one condition")
        return self._cond(kids[0], quant="any")

    def _cond(self, el, quant: str) -> tuple:
        t = _tag(el)
        if t in ("all", "any", "none"):
            kids = [k for k in el if _tag(k) == "data"]
            if len(kids) != 1:
                raise MorphCompileError(
                    f"<{t}> supports exactly one <data> condition"
                )
            return self._cond(kids[0], quant=t)
        if t != "data":
            raise MorphCompileError(f"unsupported condition <{t}>")
        source = self._sub(el.get("source"))
        field, sub = self._split_source(source)
        kw: dict = {"field": field}
        if sub is not None:
            kw["subfield"] = sub
        tests = list(el)
        if not tests:
            return ("exists", kw)
        if len(tests) != 1:
            raise MorphCompileError("condition <data> takes one test")
        tt = _tag(tests[0])
        if tt == "equals":
            kw["value"] = self._sub(tests[0].get("string"))
            return (f"{quant}_equal", kw)
        if tt == "not-equals":
            kw["value"] = self._sub(tests[0].get("string"))
            return ("not", {"pred": (f"{quant}_equal", kw)})
        if tt == "regexp":
            # Metamorph condition regexp uses find(); the predicate
            # families use Java matches() — wrap for find semantics
            kw["pattern"] = (
                ".*"
                + _java_regex_to_python(self._sub(tests[0].get("match")))
                + ".*"
            )
            return (f"{quant}_match", kw)
        raise MorphCompileError(f"unsupported condition test <{tt}>")


def _anchored(s: str) -> str:
    """Exact-equality pattern for the contains-matching filter op."""
    import re as _re

    return r"\A" + _re.escape(s) + r"\Z"




def compile_morph(
    text: str,
    *,
    vars: dict[str, str] | None = None,
    base_dir: str | None = None,
    maps: dict[str, dict] | None = None,
    shapes: dict | None = None,
    missing_maps: str = "error",
) -> list[tuple[str, dict]]:
    """Metamorph XML text → RecordOps op-list (ready for
    :class:`~limetrans_ray.functions.recordops.RecordOps`). Pass a dict
    as ``shapes`` to collect []-declared array hints for the JSON sink
    (mirrors fixparser.compile_fix)."""
    comp = _MorphCompiler(vars=vars, base_dir=base_dir, maps=maps,
                          missing_maps=missing_maps)
    ops = comp.compile(ET.fromstring(text))
    if shapes is not None:
        for k, v in comp.shapes.items():
            shapes.setdefault(k, set()).update(v)
    return ops


def load_morph(path: str, **kwargs) -> list[tuple[str, dict]]:
    """Compile a ``.xml`` Metamorph rule file (base_dir defaults to the
    file's directory for ``xi:include`` resolution)."""
    kwargs.setdefault("base_dir", os.path.dirname(os.path.abspath(path)))
    with open(path, encoding="utf-8") as fh:
        return compile_morph(fh.read(), **kwargs)
