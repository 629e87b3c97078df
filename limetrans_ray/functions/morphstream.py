"""Metamorph COLLECTOR engine: an event-stream interpreter for rule
programs the vectorized morph compile cannot express.

The reference's production Metamorph programs (transformation/
DE-2382.xml etc. via common/facets.xml, fields-1.xml, fields-2.xml)
are built on the collector family — ``<entity>`` grouping with
``flushWith``/``sameEntity`` scopes, ``<combine>`` value templates,
``<choose>`` priority selection, ``<concat>``, and the boolean
collectors ``<all>/<any>/<none>`` — plus the feedback loop: a rule
emitting a literal named ``@x`` re-injects it into the stream for
later rules to receive. That is inherently a per-record EVENT MACHINE
(Metamorph's own execution model), not a per-field vectorized
transform, so programs containing collectors compile to ONE
``("morph_stream", {"spec": ...})`` record op interpreted here; plain
data-rule programs keep the vectorized fast path
(functions/morphparser.py — engine selection stays cheap for the
common case).

Stream model per record (mirroring the reference's MARC decoders):

- each flat row becomes a literal ``(path, value)`` where ``path`` is
  ``field`` or ``field.subfield``; rows sharing (field, occurrence)
  form one SOURCE ENTITY — an entity-end event fires after its last
  literal (``sameEntity`` scopes reset there)
- record-end flushes ``flushWith="record"`` collectors
- emitted literals whose name starts with ``@`` feed back into the
  dispatcher in emission order (Metamorph variables)

Output: nested (name → value) pairs flattened onto the flat-row model:
scalars/lists of scalars → subfield-less rows, entity dicts → one
occurrence per flush with subfield rows; ``[]``-marked names register
array-shape hints (consumed by run._nest_record like the fix path).

Supported value transforms (per-value flavors of the vectorized ones):
trim, case, constant, replace, regexp, equals, not-equals, compose,
substring, lookup, split, unique, occurrence, switch-name-value, and
``<java class="hbz.limetrans.function.ZDB"/>`` (routed to the engine's
ZDB normalizer, functions/standardnum.py). Unknown ``<java>`` classes
raise at compile.
"""

from __future__ import annotations

import re
from typing import Any

__all__ = ["compile_stream_rules", "MorphStream", "flatten_outputs"]


# --------------------------------------------------------- spec compiler

_COLLECTOR_TAGS = {"entity", "combine", "choose", "concat",
                   "all", "any", "none"}


def has_collectors(rules_el, tag_fn, macros) -> bool:
    """True if any rule (transitively through call-macro) uses a
    collector tag."""
    for child in rules_el:
        t = tag_fn(child)
        if t in _COLLECTOR_TAGS:
            return True
        if t == "call-macro":
            m = macros.get(child.get("name"))
            if m is not None and has_collectors(m, tag_fn, macros):
                return True
        if t in ("data", "if"):
            continue
    return False


def compile_stream_rules(comp, rules) -> dict:
    """ET rule elements → stream spec (plain dicts, broadcastable).
    ``comp`` is the _MorphCompiler (for _sub, maps, macros, tag)."""
    c = _SpecBuilder(comp)
    children = [c.rule(r) for r in rules]
    return {
        "children": [x for x in children if x is not None],
        "maps": {k: dict(v) for k, v in comp.maps.items()},
    }


class _SpecBuilder:
    def __init__(self, comp):
        self.comp = comp

    def _tag(self, el):
        t = el.tag
        return t.split("}", 1)[1] if "}" in t else t

    def _sub(self, s):
        return self.comp._sub(s)

    def rule(self, el) -> dict | None:
        t = self._tag(el)
        if t == "data":
            return self.data(el)
        if t == "entity":
            return self.entity(el)
        if t == "combine":
            return self.combine(el)
        if t == "choose":
            return self.choose(el)
        if t == "concat":
            return self.concat(el)
        if t in ("all", "any", "none"):
            return self.boolean(el)
        if t == "call-macro":
            return self.call_macro(el)
        if t == "if":
            # stray <if> at rule position: treat as a guard-only no-op
            raise _err(f"<if> is not a rule (inside <{t}>)")
        raise _err(f"unsupported rule <{t}> in stream mode")

    def call_macro(self, el) -> dict | None:
        name = el.get("name")
        macro = self.comp.macros.get(name)
        if macro is None:
            raise _err(f"unknown macro {name!r}")
        saved = self.comp.vars
        # ALL attributes become macro vars — including "name": the
        # reference's macros use $[name] as the output literal name
        # (macros.xml:10-13 personName), so the macro-selector attr
        # doubles as a parameter
        self.comp.vars = {
            **saved,
            **{k: self._sub(v) for k, v in el.attrib.items()},
        }
        try:
            rules = [self.rule(inner) for inner in macro]
            rules = [r for r in rules if r is not None]
        finally:
            self.comp.vars = saved
        if len(rules) == 1:
            return rules[0]
        return {"kind": "group", "children": rules}

    def _common(self, el, kind) -> dict:
        spec: dict = {"kind": kind, "children": [], "cond": None}
        name = self._sub(el.get("name"))
        if name is not None:
            spec["name"] = name
        fw = self._sub(el.get("flushWith"))
        if fw is not None:
            spec["flush"] = fw
        if el.get("sameEntity") == "true":
            spec["same"] = True
        if el.get("reset") == "true":
            spec["reset"] = True
        for child in el:
            ct = self._tag(child)
            if ct == "if":
                kids = list(child)
                if len(kids) != 1:
                    raise _err("<if> needs exactly one condition child")
                spec["cond"] = self.condition(kids[0])
            elif ct == "call-macro":
                sub = self.call_macro(child)
                if sub is not None:
                    if sub.get("kind") == "group":
                        spec["children"].extend(sub["children"])
                    else:
                        spec["children"].append(sub)
            else:
                sub = self.rule(child)
                if sub is not None:
                    spec["children"].append(sub)
        return spec

    def condition(self, el) -> dict:
        t = self._tag(el)
        if t in ("all", "any", "none"):
            spec = self._common(el, "bool")
            spec["mode"] = t
            return spec
        if t == "data":
            return {"kind": "bool", "mode": "any", "children": [self.data(el)],
                    "cond": None}
        raise _err(f"unsupported condition <{t}>")

    def entity(self, el) -> dict:
        return self._common(el, "entity")

    def combine(self, el) -> dict:
        spec = self._common(el, "combine")
        spec["value"] = self._sub(el.get("value", ""))
        return spec

    def choose(self, el) -> dict:
        return self._common(el, "choose")

    def concat(self, el) -> dict:
        spec = self._common(el, "concat")
        spec["delim"] = self._sub(el.get("delimiter", ""))
        return spec

    def boolean(self, el) -> dict:
        spec = self._common(el, "bool")
        spec["mode"] = self._tag(el)
        spec["value"] = self._sub(el.get("value"))
        return spec

    def data(self, el) -> dict:
        from .fixparser import (
            _java_regex_to_python,
            _java_replacement_to_python,
        )

        source = self._sub(el.get("source"))
        if not source:
            raise _err("<data> needs a source")
        spec: dict = {
            "kind": "data",
            "source": source,
            "name": self._sub(el.get("name")),
            "tf": [],
            "cond": None,
        }
        for tr in el:
            tt = self._tag(tr)
            if tt == "if":
                kids = list(tr)
                if len(kids) != 1:
                    raise _err("<if> needs exactly one condition child")
                spec["cond"] = self.condition(kids[0])
                continue
            if tt == "trim":
                spec["tf"].append(("trim", {}))
            elif tt == "case":
                spec["tf"].append(("case", {"to": tr.get("to", "upper")}))
            elif tt == "constant":
                spec["tf"].append(
                    ("constant", {"value": self._sub(tr.get("value", ""))})
                )
            elif tt == "replace":
                spec["tf"].append(("replace", {
                    "pattern": _java_regex_to_python(
                        self._sub(tr.get("pattern"))),
                    "with": _java_replacement_to_python(
                        self._sub(tr.get("with", ""))),
                }))
            elif tt == "regexp":
                spec["tf"].append(("regexp", {
                    "match": _java_regex_to_python(
                        self._sub(tr.get("match"))),
                    "format": self._sub(tr.get("format")),
                }))
            elif tt == "equals":
                spec["tf"].append(
                    ("equals", {"string": self._sub(tr.get("string"))}))
            elif tt == "not-equals":
                spec["tf"].append(
                    ("not-equals", {"string": self._sub(tr.get("string"))}))
            elif tt == "compose":
                spec["tf"].append(("compose", {
                    "prefix": self._sub(tr.get("prefix", "")),
                    "postfix": self._sub(tr.get("postfix", "")),
                }))
            elif tt == "substring":
                spec["tf"].append(("substring", {
                    "start": int(self._sub(tr.get("start", "0"))),
                    "end": int(self._sub(tr.get("end", "0"))),
                }))
            elif tt == "lookup":
                mname = self._sub(tr.get("in"))
                if mname not in self.comp.maps:
                    if getattr(self.comp, "missing_maps", "error") \
                            == "empty":
                        self.comp.maps[mname] = {}
                    else:
                        raise _err(f"unknown morph map {mname!r}")
                spec["tf"].append(("lookup", {
                    "map": mname,
                    "default": self._sub(tr.get("default")),
                }))
            elif tt == "split":
                spec["tf"].append(("split", {
                    "delimiter": _java_regex_to_python(
                        self._sub(tr.get("delimiter"))),
                }))
            elif tt == "unique":
                spec["tf"].append(("unique", {}))
            elif tt == "occurrence":
                only = self._sub(tr.get("only", "1"))
                if not only.isdigit():
                    raise _err(f"<occurrence only={only!r}> unsupported")
                spec["tf"].append(("occurrence", {
                    "n": int(only),
                    "same": tr.get("sameEntity") == "true",
                }))
            elif tt == "switch-name-value":
                spec["tf"].append(("switch-name-value", {}))
            elif tt == "java":
                cls = tr.get("class", "")
                if cls.rsplit(".", 1)[-1] != "ZDB":
                    raise _err(f"unsupported <java class={cls!r}>")
                spec["tf"].append(("zdb", {}))
            else:
                raise _err(f"unsupported transform <{tt}> in stream mode")
        return spec


class MorphStreamError(Exception):
    pass


def _err(msg):
    return MorphStreamError(msg)


# ----------------------------------------------------------- interpreter

def _sel_rx(sel: str) -> re.Pattern:
    """Metamorph source/flushWith selector → compiled regex over
    literal paths. ``?`` = any char, ``[...]`` char class, ``|``
    alternation, ``*`` = any tail. A selector without a subfield part
    also matches any literal inside the named entity (prefix match)."""
    alts = []
    for alt in sel.split("|"):
        pat = []
        i = 0
        while i < len(alt):
            ch = alt[i]
            if ch == "?":
                pat.append(".")
            elif ch == "*":
                pat.append(".*")
            elif ch == "[":
                j = alt.find("]", i)
                if j < 0:
                    pat.append(re.escape(ch))
                else:
                    pat.append(alt[i:j + 1])
                    i = j
            else:
                pat.append(re.escape(ch))
            i += 1
        body = "".join(pat)
        # a field-only selector also receives the entity's literals
        alts.append(f"(?:{body})(?:\\..*)?")
    return re.compile("^(?:" + "|".join(alts) + ")$")


def _NULL_SINK(name, value):
    pass


class _Ctx:
    """Per-record interpreter context."""

    __slots__ = ("outputs", "feedback", "entity_no", "maps")

    def __init__(self, maps):
        self.outputs: list[tuple[str, Any]] = []
        self.feedback: list[tuple[str, str]] = []
        self.entity_no = 0
        self.maps = maps


class _Node:
    def __init__(self, spec: dict, maps: dict):
        self.spec = spec
        self.kind = spec["kind"]
        self.name = spec.get("name")
        self.maps = maps
        self.cond = (
            _Node(spec["cond"], maps) if spec.get("cond") else None
        )
        self.children = [
            _Node(c, maps) for c in spec.get("children", ())
        ]
        flush = spec.get("flush")
        # "record" may be ONE ALTERNATIVE of a flushWith selector
        # ("880??.a|record", DE-2382.xml title concat)
        alts = flush.split("|") if flush else []
        self.flush_record = "record" in alts
        path_alts = [a for a in alts if a != "record"]
        self.flush_rx = _sel_rx("|".join(path_alts)) if path_alts else None
        self.same = bool(spec.get("same"))
        self.reset_on_emit = bool(spec.get("reset"))
        if self.kind == "data":
            self.src_rx = _sel_rx(spec["source"])
            self.tf = spec["tf"]
        if self.kind == "combine":
            self.parts = re.findall(r"\$\{([^}]*)\}", spec.get("value", ""))
        # static dispatch filter: every source regex in this subtree
        # (children + condition) — a literal whose path matches none
        # of them can skip the whole subtree
        self._src_rxs: list = []
        self._flush_rxs: list = []
        if self.kind == "data":
            self._src_rxs.append(self.src_rx)
        if self.flush_rx is not None:
            self._flush_rxs.append(self.flush_rx)
        self._has_same = self.same or (
            self.kind == "data"
            and any(t == "occurrence" and k.get("same")
                    for t, k in self.tf)
        )
        for ch in self.children:
            self._src_rxs.extend(ch._src_rxs)
            self._flush_rxs.extend(ch._flush_rxs)
            self._has_same = self._has_same or ch._has_same
        if self.cond is not None:
            self._src_rxs.extend(self.cond._src_rxs)
            self._flush_rxs.extend(self.cond._flush_rxs)
            self._has_same = self._has_same or self.cond._has_same
        self._take_memo: dict[str, bool] = {}
        self._ee_sensitive = bool(self._has_same or self._flush_rxs) \
            or self.kind == "combine" \
            or any(getattr(ch, "_ee_sensitive", False)
                   for ch in self.children) \
            or (self.cond is not None and self.cond._ee_sensitive)
        self.reset_record()

    def might_take(self, path: str) -> bool:
        t = self._take_memo.get(path)
        if t is None:
            t = any(rx.match(path) for rx in self._src_rxs)
            self._take_memo[path] = t
        return t

    # -- state ---------------------------------------------------------
    def reset_record(self):
        self.collected: list[tuple[str, Any]] = []
        self.values: dict[str, Any] = {}
        self.hit = False
        self.child_hits = [False] * len(self.children)
        self.seen: set = set()          # unique
        self.occ_count = 0              # occurrence (record scope)
        self.choice = None              # choose winner (idx, name, value)
        self.fired = False              # bool any/all one-shot latch
        self.emitted = False
        if self.cond is not None:
            self.cond.reset_record()
        for ch in self.children:
            ch.reset_record()

    def reset_scope(self):
        """sameEntity window reset (source-entity end) — nested bool
        children share the window."""
        self.collected = []
        self.values = {}
        self.hit = False
        self.choice = None
        self.fired = False
        self.child_hits = [False] * len(self.children)
        for ch in self.children:
            if ch.kind == "bool":
                ch.reset_scope()

    # -- receiving -----------------------------------------------------
    def receive(self, path: str, value: str, ctx: _Ctx, sink) -> bool:
        """Feed one literal. ``sink(name, value)`` receives emissions
        from this node. Returns True if consumed by this subtree."""
        took = False
        if self.kind == "data":
            if self.src_rx.match(path):
                for v in self._transform(path, value, ctx):
                    if self.cond is not None and not self.cond.ok():
                        continue
                    sink(self.name if self.name is not None else path, v)
                took = True
            return took

        if self.cond is not None and self.cond.might_take(path):
            self.cond.receive(path, value, ctx, _NULL_SINK)
        for i, ch in enumerate(self.children):
            if not ch.might_take(path):
                continue
            if ch.receive(path, value, ctx, self._child_sink(i, ctx)):
                took = True
        # <any>/<all> fire the moment they become satisfied
        if self.kind == "bool" and not self.fired \
                and self.spec.get("mode", "any") != "none" and self.ok():
            self.fired = True
            sink(self.name or "", self.spec.get("value", ""))
        # a completion-driven combine emits the MOMENT its parts are
        # complete AND its condition holds — including when the
        # deciding input is a condition literal arriving after the
        # trigger (facets.xml Landkarte-before-Bild emission order on a
        # single 006 field depends on this firing per literal)
        self._combine_complete(ctx, sink)
        return took

    def _child_sink(self, i, ctx):
        def _sink(name, value):
            self.child_hits[i] = True
            self.hit = True
            self.on_child_emit(i, name, value, ctx)
        return _sink

    def on_child_emit(self, i, name, value, ctx: _Ctx):
        if self.kind in ("entity", "concat", "bool"):
            self.collected.append((name, value))
        elif self.kind == "combine":
            self.values[name] = value
        elif self.kind == "choose":
            # children are priority-ordered; lowest index wins, and
            # within one child the LAST received value overwrites
            # (fields-2.xml:5 TypeMedia over repeated @facet_format)
            if self.choice is None or i <= self.choice[0]:
                self.choice = (i, name, value)

    # -- conditions ------------------------------------------------------
    def ok(self) -> bool:
        """Evaluate this node as a CONDITION (bool collector).

        Event discipline (matches the reference's boolean collectors):
        <any>/<all> FIRE into their parent the moment they become
        satisfied (receive path), while <none> can only fire at its
        flush boundary — "never seen" is undecidable earlier. A
        nested bool therefore contributes via child_hits (did it
        fire), not its live truth: facets.xml:1136's fallback
        all(any(Online), none(Elektronische)) must stay false until
        the none's record-end flush, even though "no Elektronische
        SO FAR" holds when Online arrives."""
        mode = self.spec.get("mode", "any")
        if mode == "all":
            res = all(self.child_hits) if self.children else False
        elif mode == "none":
            res = not any(self.child_hits)
        else:
            res = any(self.child_hits)
        return res

    # -- transforms ------------------------------------------------------
    def _transform(self, path, value, ctx: _Ctx):
        vals = [value]
        for tname, kw in self.tf:
            out = []
            for v in vals:
                out.extend(self._tf_one(tname, kw, path, v, ctx))
            vals = out
            if not vals:
                break
        return vals

    def _tf_one(self, tname, kw, path, v, ctx: _Ctx):
        if tname == "trim":
            return [v.strip()]
        if tname == "case":
            return [v.upper() if kw["to"] == "upper" else v.lower()]
        if tname == "constant":
            return [kw["value"]]
        if tname == "replace":
            return [re.sub(kw["pattern"], kw["with"], v)]
        if tname == "regexp":
            m = re.search(kw["match"], v)
            if not m:
                return []
            fmt = kw.get("format")
            if fmt is None:
                return [m.group(0)]
            out = fmt
            for gi in range(m.lastindex or 0, 0, -1):
                out = out.replace("${%d}" % gi, m.group(gi) or "")
            return [out]
        if tname == "equals":
            return [v] if v == kw["string"] else []
        if tname == "not-equals":
            return [v] if v != kw["string"] else []
        if tname == "compose":
            return [kw["prefix"] + v + kw["postfix"]]
        if tname == "substring":
            start, end = kw["start"], kw["end"]
            # observed golden semantics: a start at/past the end drops
            # the value (008 language bytes on short fields), while an
            # out-of-range END clamps to the string length
            # (facets.xml:13 @006Pos04 substring(4,6) over the 5-char
            # "s   m" yields "m" and still matches <equals "m">)
            if start >= len(v):
                return []
            return [v[start:end] if end > 0 else v[start:]]
        if tname == "lookup":
            table = ctx.maps.get(kw["map"], {})
            if v in table:
                return [table[v]]
            if kw.get("default") is not None:
                return [kw["default"]]
            return []
        if tname == "split":
            return [p for p in re.split(kw["delimiter"], v)]
        if tname == "unique":
            if v in self.seen:
                return []
            self.seen.add(v)
            return [v]
        if tname == "occurrence":
            self.occ_count += 1
            return [v] if self.occ_count == kw["n"] else []
        if tname == "switch-name-value":
            return [v]  # handled by caller naming; rare in stream mode
        if tname == "zdb":
            from .standardnum import normalize_zdb

            out = normalize_zdb(v)
            return [out] if out is not None else []
        raise _err(f"unknown transform {tname}")

    # -- flushing --------------------------------------------------------
    _parent_sink = None  # set by parent before flush/emit

    def emit(self, ctx: _Ctx, sink, keep_on_cond_fail=False):
        """Produce this collector's output literal(s) into sink (a
        None sink — condition position — still resets state)."""
        if sink is None:
            # condition position: state resets are the OWNER's job
            # (_post_emit resets the shared scope)
            return
        if self.cond is not None and not self.cond.ok():
            # a completion-driven combine RETAINS its parts when the
            # condition is not yet satisfied — the trigger literal may
            # precede the condition's source (DE-836 TypeMedia.xml
            # record 2: 001 before 007) and the emission then happens
            # at a later entity end
            if not keep_on_cond_fail:
                self._post_emit()
            return
        if self.kind == "entity":
            if self.collected:
                sink(self.name or "", dict_entity(self.collected))
            # (name [] marks pass through; the flattener interprets
            # them on ENTITY values only — a scalar literal named
            # "abstract[]" keeps its brackets, matching the
            # reference's Metamorph JsonEncoder output)
        elif self.kind == "combine":
            if all(p in self.values for p in self.parts):
                out = self.spec.get("value", "")
                for p in self.parts:
                    out = out.replace("${%s}" % p, str(self.values[p]))
                sink(self.name or "", out)
        elif self.kind == "choose":
            if self.choice is not None:
                _i, cname, cval = self.choice
                sink(self.name if self.name is not None else cname, cval)
        elif self.kind == "concat":
            if self.collected:
                sink(self.name or "",
                     self.spec.get("delim", "").join(
                         str(v) for _n, v in self.collected))
        elif self.kind == "bool":
            # flush-time firing (the only chance for <none>); a
            # nameless bool in condition position still registers the
            # hit with its parent (personCreator.xml:8-15)
            if not self.fired and self.ok():
                sink(self.name or "", self.spec.get("value", ""))
        self._post_emit()

    def _post_emit(self):
        self.collected = []
        self.values = {}
        self.choice = None
        self.child_hits = [False] * len(self.children)
        self.hit = False
        self.fired = False
        # the condition shares this collect's scope: a per-entity
        # guard must not stay satisfied into the next source entity
        # (fields-1.xml:119-128 IdentifierDOI $2=doi filter)
        if self.cond is not None:
            self.cond.reset_scope()

    def _combine_complete(self, ctx: _Ctx, sink):
        """A flush-less combine emits the moment its parts complete —
        including when the completing part arrives from a CHILD
        collector flushing (the Extent choose-fed combine,
        fields-1.xml:352-392)."""
        if self.kind == "combine" and self.flush_rx is None \
                and not self.flush_record and self.hit \
                and all(p in self.values for p in self.parts):
            self.emit(ctx, sink, keep_on_cond_fail=True)

    def on_entity_end(self, ent_paths: set[str], ctx: _Ctx, sink,
                      real=True):
        """Source-entity end: flush flushWith-matching collectors and
        reset sameEntity scopes (depth-first so inner collectors flush
        into their parents before the parents flush). ``real=False``
        marks a FEEDBACK literal's pseudo-entity: it can satisfy
        flushWith="@x" selectors but must not reset sameEntity scopes
        or per-entity transform state — those windows are defined by
        SOURCE entities only."""
        if self.kind == "data":
            if real:
                # per-entity transform state
                for tname, kw in self.tf:
                    if tname == "occurrence" and kw.get("same"):
                        self.occ_count = 0
            return

        if self.cond is not None and self.cond._ee_sensitive:
            self.cond.on_entity_end(ent_paths, ctx, None, real)
        for i, ch in enumerate(self.children):
            if not ch._ee_sensitive:
                continue
            ch.on_entity_end(ent_paths, ctx, self._child_sink(i, ctx), real)
        self._combine_complete(ctx, sink)
        # flush SELF before ticking the condition: the condition's own
        # flush/reset must not clear the state this emission consults
        # (fields-1.xml:133-142 <any flushWith="100..."> guarding the
        # person entity that flushes on the same boundary)
        if self.flush_rx is not None and any(
            self.flush_rx.match(p) for p in ent_paths
        ):
            self.emit(ctx, sink)
        elif self.same and real:
            if self.cond is not None:
                self.cond.reset_scope()
            self.reset_scope()

    def on_record_end(self, ctx: _Ctx, sink):
        if self.kind == "data":
            return

        if self.cond is not None:
            self.cond.on_record_end(ctx, None)
        for i, ch in enumerate(self.children):
            ch.on_record_end(ctx, self._child_sink(i, ctx))
        self._combine_complete(ctx, sink)
        if self.flush_record or (
            self.flush_rx is None and self.kind in
            ("entity", "choose", "concat", "bool")
        ):
            self.emit(ctx, sink)


def dict_entity(collected: list[tuple[str, Any]]) -> list:
    """An entity's collected literals, kept as an ordered pair list
    (duplicate names legal — the flattener merges)."""
    return list(collected)


class MorphStream:
    """Interpret a stream spec over flat-row records."""

    def __init__(self, spec: dict):
        self.spec = spec
        self.maps = spec.get("maps", {})
        self.roots = [_Node(c, self.maps) for c in self._flatten_groups(
            spec.get("children", ()))]
        # path → indices of roots whose subtree can consume it (the
        # program is static; records share a small path vocabulary, so
        # this cache removes ~all per-literal regex sweeps)
        self._takers: dict[str, list[int]] = {}

    def _flatten_groups(self, children):
        out = []
        for c in children:
            if c.get("kind") == "group":
                out.extend(self._flatten_groups(c.get("children", ())))
            else:
                out.append(c)
        return out

    def run_record(self, literals: list[tuple[str, str, int]]):
        """``literals``: (path, value, entity_id) in document order.
        Returns ordered (name, value) outputs (value scalar or entity
        pair-list)."""
        ctx = _Ctx(self.maps)
        for r in self.roots:
            r.reset_record()
        outputs: list[tuple[str, Any]] = []

        def top_sink_for(root):
            def _sink(name, value):
                if name.startswith("@"):
                    pending.append((name, value))
                else:
                    outputs.append((name, value))
            return _sink

        pending: list[tuple[str, str]] = []

        def drain():
            # feedback literals re-enter the stream; each @literal is
            # its own one-literal "entity", so flushWith="@x"
            # collectors (fields-1.xml:10 RecordIdentifier) flush
            # right after it is dispatched. The CASCADE a literal
            # triggers (lookup chains @language_source →
            # @language_long, fields-1.xml:64-79) completes before the
            # literal's own entity-end fires — Metamorph receivers run
            # synchronously within the upstream literal
            while pending:
                n, v = pending.pop(0)
                if not isinstance(v, str):
                    continue  # @-named entity: no feedback form
                for i in takers(n):
                    r = self.roots[i]
                    r.receive(n, v, ctx, top_sink_for(r))
                drain()
                for r in self.roots:
                    if any(rx.match(n) for rx in r._flush_rxs):
                        r.on_entity_end({n}, ctx, top_sink_for(r),
                                        real=False)

        def takers(path):
            t = self._takers.get(path)
            if t is None:
                t = [i for i, r in enumerate(self.roots)
                     if r.might_take(path)]
                self._takers[path] = t
            return t

        def dispatch(path, value):
            for i in takers(path):
                r = self.roots[i]
                r.receive(path, value, ctx, top_sink_for(r))
            drain()

        def entity_end(paths):
            for r in self.roots:
                # skip subtrees a source-entity end cannot affect: no
                # sameEntity window, no matching flush selector, and
                # no pending combine completion
                if not (r._has_same or r.hit or any(
                    rx.match(p) for rx in r._flush_rxs for p in paths
                )):
                    continue
                r.on_entity_end(paths, ctx, top_sink_for(r))
            drain()

        i, n = 0, len(literals)
        while i < n:
            eid = literals[i][2]
            paths = set()
            j = i
            while j < n and literals[j][2] == eid:
                paths.add(literals[j][0])
                dispatch(literals[j][0], literals[j][1])
                j += 1
            entity_end(paths)
            i = j
        for r in self.roots:
            r.on_record_end(ctx, top_sink_for(r))
            # record-end feedback (@300e_punct punctuation combines,
            # fields-1.xml:330-349) must reach LATER rules before they
            # flush — rule order is the reference's emission order
            drain()
        return outputs


# ------------------------------------------------------------- flattening

def _strip_mark(name):
    if name and name.endswith("[]"):
        return name[:-2], True
    return (name or ""), False


def _is_pairs(v):
    return isinstance(v, list) and v and isinstance(v[0], tuple)


def _join(a, b):
    return f"{a}.{b}" if a and b else (a or b)


def flatten_outputs(outputs, record_id, shapes=None):
    """Ordered (name, value) outputs → flat rows.

    Entity values are pair lists; nesting maps onto the flat model as
    field → occurrence (one per entity flush) → subfield key, with
    deeper entity levels joining keys with '.' and anonymous names
    collapsing. ``[]`` marks register array-shape hints when ``shapes``
    is given (run._nest_record consumes them like the fix path)."""
    rows: list[dict] = []
    occ_per_field: dict[str, int] = {}

    def note_field_array(field):
        if shapes is not None:
            shapes.setdefault("array_fields", set()).add(field)

    def note_sub_array(field, sub):
        if shapes is not None:
            shapes.setdefault("array_subs", set()).add((field, sub))

    def entity_rows(field, occ, key_prefix, pairs):
        for name, value in pairs:
            if _is_pairs(value):
                base, arr = _strip_mark(name)
            else:
                base, arr = (name or ""), False
            key = _join(key_prefix, base)
            if _is_pairs(value):
                if arr and key:
                    note_sub_array(field, key)
                    _seen_sub_arrays.add((field, key))
                entity_rows(field, occ, key, value)
            else:
                if arr or (key and (field, key) in _seen_sub_arrays):
                    note_sub_array(field, key)
                    _seen_sub_arrays.add((field, key))
                rows.append({"record_id": record_id, "field": field,
                             "subfield": key or None, "occurrence": occ,
                             "value": value})

    _seen_sub_arrays: set = set()

    for name, value in outputs:
        if _is_pairs(value):
            base, arr = _strip_mark(name)
        else:
            base, arr = (name or ""), False
        if arr:
            note_field_array(base)
        if _is_pairs(value):
            # pure anonymous-scalar entity → value array rows
            if all((_strip_mark(n)[0] == "" and not _is_pairs(v))
                   for n, v in value):
                for _n, v in value:
                    occ = occ_per_field.get(base, 0)
                    occ_per_field[base] = occ + 1
                    rows.append({"record_id": record_id, "field": base,
                                 "subfield": None, "occurrence": occ,
                                 "value": v})
            elif all(_is_pairs(v) and _strip_mark(n)[0] == ""
                     for n, v in value):
                # every child is itself an entity: each is one ELEMENT
                # of this field (anonymous per-source-entity flushes,
                # e.g. TitleSuper[] > "" > titleSuper[])
                for n2, v2 in value:
                    b2, a2 = _strip_mark(n2)
                    occ = occ_per_field.get(base, 0)
                    occ_per_field[base] = occ + 1
                    if a2 and b2:
                        note_sub_array(base, b2)
                        _seen_sub_arrays.add((base, b2))
                    entity_rows(base, occ, b2, v2)
            else:
                occ = occ_per_field.get(base, 0)
                occ_per_field[base] = occ + 1
                entity_rows(base, occ, "", value)
        else:
            occ = occ_per_field.get(base, 0)
            occ_per_field[base] = occ + 1
            rows.append({"record_id": record_id, "field": base,
                         "subfield": None, "occurrence": occ,
                         "value": value})
    return rows


def spec_shapes(spec: dict) -> dict:
    """Compile-time array-shape hints from []-marked collector names
    (the stream analogue of fixparser's shape harvesting)."""
    shapes = {"array_fields": set(), "array_subs": set()}

    def walk(node, field, prefix):
        name = node.get("name")
        if node.get("kind") != "entity":
            name = None
        base, arr = _strip_mark(name) if name is not None else ("", False)
        if field is None:
            # top-level rule: its name is the FIELD
            if arr and base:
                shapes["array_fields"].add(base)
            nf, np = (base or None), ""
        else:
            np = _join(prefix, base)
            if arr and np:
                shapes["array_subs"].add((field, np))
            nf = field
        for ch in node.get("children", ()):
            if ch.get("kind") == "group":
                for c2 in ch.get("children", ()):
                    walk(c2, nf if nf else None, np if nf else "")
            elif field is None and node.get("kind") == "group":
                walk(ch, None, "")
            else:
                walk(ch, nf if nf else None, np if nf else "")

    for child in spec.get("children", ()):
        if child.get("kind") == "group":
            for c2 in child.get("children", ()):
                walk(c2, None, "")
        else:
            walk(child, None, "")
    return shapes
