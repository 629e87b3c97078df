"""Metafix ``.fix`` text parser + compiler onto the RecordOps vocabulary.

The reference's transformation layer IS a Metafix program — ~20k lines
of ``.fix`` rules selected per Limetrans job (reference
main/src/main/java/hbz/limetrans/Limetrans.java:155-189 picks the
engine, main/src/main/resources/transformation/alma.fix:1-1296 is the
flagship program). :mod:`.recordops` implements the command
*vocabulary* as vectorized batch ops; this module closes the surface
gap: it parses fix TEXT (the artifact a real limetrans user owns) and
compiles it to a RecordOps op-list, so a ``.fix`` file drives the same
``map_batches`` pipeline.

Grammar subset (everything alma.fix:1-300 exercises):

- commands  ``name(arg, arg, key: value, ...)`` — args are
  double/single-quoted strings or bare words; ``#`` line comments and
  ``/* ... */`` block comments
- blocks    ``do list(path: P, "var": V) ... end``,
  ``do once(NAME) ... end``, ``do put_macro(NAME) ... end``
- branches  ``if PRED(...) / elsif PRED(...) / else / end`` and
  ``unless PRED(...) / end`` with predicates ``exists`` and the
  quantifier families ``any_/none_/all_`` × ``match/equal/contain``
- includes  ``include("./other.fix")`` (paths relative to the
  including file), cycle-checked
- macros    ``do put_macro(NAME) body end`` stored as AST;
  ``call_macro(NAME, key: value, ...)`` compiles the body with the
  call's named args overlaid on the variable scope
- variables ``$[name]`` substituted from the vars map (the reference's
  Metafix vars, Limetrans.java:167-171) and macro parameters
- maps      ``put_map(NAME, k: v, ...)`` inline;
  ``put_filemap(PATH, NAME?, sep_char:, key_column:, value_column:,
  expected_columns:)`` for TSV/CSV (gzip transparent);
  ``put_rdfmap(PATH, NAME?, target: PREDICATE)`` for RDF Turtle
  (select_, the reference's RDF lookup maps — SURVEY.md §2.3
  put_rdfmap); ``lookup(path, MAP-NAME, delete/default)`` resolves
  registered maps at compile time into broadcastable dicts;
  ``put_var(NAME, VALUE)`` sets a ``$[name]`` variable from fix text
- arrays    ``join_field(path, sep?)``, ``split_field(path, regexp)``,
  ``filter(path, regexp, invert:?)`` — repeated-value collapse / split
  / regex value filtering (marc/_facet_type-2.fix:130-144)

Path selectors compile to (field, subfield) pairs of the flat-row
model: ``035  .a`` → field ``"035  "`` subfield ``"a"`` (single-char
trailing component = MARC subfield code), ``?`` wildcards match any
character (``348??``), ``X[]``/``.$append``/``.$last`` array markers
reduce to the bare field name (occurrence numbering makes them
explicit), ``$last.key`` → subfield ``key``, and any other dotted name
stays a literal flattened field (``introx.music``).

KNOWN DEVIATION (documented contract): ``do list`` bodies see ONLY the
current element's rows (each element runs as a synthetic record —
recordops.do_list_elements), so predicates/ops inside a loop that
reference fields outside the loop path raise at compile time where
detectable. The reference's loop bodies can touch the whole record;
the alma.fix:185-266 identifier-routing shape (predicates on the loop
var, writes to new fields) is fully covered.

KNOWN DEVIATION (documented contract): ``put_var`` executes at COMPILE
time, unconditionally — a put_var inside a never-taken if/unless branch
still sets the variable (the reference evaluates it per record at run
time). Caller-supplied vars passed to :func:`compile_fix` are never
overwritten by file-level ``put_var``, which therefore behaves as a
default, mirroring the reference's job-setup variable merge.
"""

from __future__ import annotations

import gzip
import io
import os
import re

__all__ = [
    "parse_fix",
    "compile_fix",
    "load_fix_file",
    "load_filemap",
    "load_rdfmap",
    "FixSyntaxError",
    "FixCompileError",
]


class FixSyntaxError(ValueError):
    pass


class FixCompileError(ValueError):
    pass


# --------------------------------------------------------------- tokenizer

_TOKEN_RX = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*|//[^\n]*)
  | (?P<block_comment>/\*.*?\*/)
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<punct>[(),:])
  | (?P<bare>[^\s(),:\#]+)
    """,
    re.VERBOSE | re.DOTALL,
)

_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "'": "'", "\\": "\\"}


def _unquote(s: str) -> str:
    body = s[1:-1]
    out, i = [], 0
    while i < len(body):
        c = body[i]
        if c == "\\" and i + 1 < len(body):
            nxt = body[i + 1]
            # unknown escapes (e.g. regex \d) keep the backslash — fix
            # strings carry Java-regex patterns verbatim
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
            else:
                out.append("\\")
                out.append(nxt)
            i += 2
        else:
            out.append(c)
            i += 1
    return "".join(out)


def _tokenize(text: str) -> list[tuple[str, str, int]]:
    """→ [(kind, value, line)]: kind ∈ {str, bare, punct}."""
    toks, pos, line = [], 0, 1
    while pos < len(text):
        m = _TOKEN_RX.match(text, pos)
        if m is None:
            raise FixSyntaxError(f"line {line}: cannot tokenize at {text[pos:pos+20]!r}")
        kind = m.lastgroup
        val = m.group()
        if kind == "string":
            toks.append(("str", _unquote(val), line))
        elif kind == "bare":
            toks.append(("bare", val, line))
        elif kind == "punct":
            toks.append(("punct", val, line))
        line += val.count("\n")
        pos = m.end()
    return toks


# ------------------------------------------------------------------ parser
#
# AST: a statement is
#   ("cmd", name, args, kwargs, line)
#   ("do", head_cmd, body)                      do list(...)/once/put_macro
#   ("if", [(pred_cmd, body), ...], else_body)  if/elsif chains
#   ("unless", pred_cmd, body)

_BLOCK_OPENERS = {"do", "if", "unless"}


class _Parser:
    def __init__(self, toks):
        self.toks = toks
        self.i = 0

    def _peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def _next(self):
        t = self._peek()
        if t is None:
            raise FixSyntaxError("unexpected end of fix text")
        self.i += 1
        return t

    def _expect_punct(self, p):
        t = self._next()
        if t[0] != "punct" or t[1] != p:
            raise FixSyntaxError(f"line {t[2]}: expected {p!r}, got {t[1]!r}")

    def parse_command(self) -> tuple:
        """``name(args)`` — the cursor sits on the name token."""
        name_t = self._next()
        if name_t[0] != "bare":
            raise FixSyntaxError(f"line {name_t[2]}: expected command name, got {name_t[1]!r}")
        name, line = name_t[1], name_t[2]
        args, kwargs = [], {}
        self._expect_punct("(")
        expecting_value = True
        while True:
            t = self._peek()
            if t is None:
                raise FixSyntaxError(f"line {line}: unterminated argument list for {name}")
            if t[0] == "punct" and t[1] == ")":
                self._next()
                break
            if t[0] == "punct" and t[1] == ",":
                self._next()
                expecting_value = True
                continue
            if not expecting_value:
                raise FixSyntaxError(f"line {t[2]}: expected ',' or ')' in {name}(...)")
            tok = self._next()
            if tok[0] not in ("str", "bare"):
                raise FixSyntaxError(f"line {tok[2]}: unexpected {tok[1]!r} in {name}(...)")
            nxt = self._peek()
            if nxt is not None and nxt[0] == "punct" and nxt[1] == ":":
                self._next()
                val_t = self._next()
                if val_t[0] not in ("str", "bare"):
                    raise FixSyntaxError(
                        f"line {val_t[2]}: expected value after {tok[1]!r}:"
                    )
                kwargs[tok[1]] = val_t[1]
            else:
                args.append(tok[1])
            expecting_value = False
        return ("cmd", name, args, kwargs, line)

    def parse_body(self, *, stop_at=("end",)) -> tuple[list, str]:
        """Statements until one of ``stop_at`` keywords; returns
        (statements, the keyword that ended the body)."""
        stmts = []
        while True:
            t = self._peek()
            if t is None:
                if "<eof>" in stop_at:
                    return stmts, "<eof>"
                raise FixSyntaxError("unexpected end of fix text (missing 'end'?)")
            if t[0] == "bare" and t[1] in stop_at:
                self._next()
                return stmts, t[1]
            stmts.append(self.parse_statement())

    def parse_statement(self):
        t = self._peek()
        if t[0] != "bare":
            raise FixSyntaxError(f"line {t[2]}: expected statement, got {t[1]!r}")
        kw = t[1]
        if kw == "do":
            self._next()
            head = self.parse_command()
            body, _ = self.parse_body()
            return ("do", head, body)
        if kw == "unless":
            self._next()
            pred = self.parse_command()
            body, ended = self.parse_body(stop_at=("end", "else", "elsif"))
            if ended != "end":
                raise FixSyntaxError(
                    f"line {t[2]}: 'unless' takes no elsif/else branches"
                )
            return ("unless", pred, body)
        if kw == "if":
            self._next()
            branches, else_body = [], None
            pred = self.parse_command()
            while True:
                body, ended = self.parse_body(stop_at=("end", "elsif", "else"))
                branches.append((pred, body))
                if ended == "end":
                    break
                if ended == "elsif":
                    pred = self.parse_command()
                    continue
                # else
                else_body, ended2 = self.parse_body(stop_at=("end",))
                break
            return ("if", branches, else_body)
        return self.parse_command()


def parse_fix(text: str) -> list:
    """Fix text → statement AST (no compilation, no file access)."""
    return _Parser(_tokenize(text)).parse_body(stop_at=("<eof>",))[0]


# ---------------------------------------------------------------- file maps

def _open_maybe_gz(path: str) -> io.TextIOBase:
    if path.endswith(".gz"):
        return io.TextIOWrapper(gzip.open(path, "rb"), encoding="utf-8")
    return open(path, encoding="utf-8")


def load_filemap(
    path: str,
    *,
    sep_char: str = "\t",
    key_column: int = 0,
    value_column: int = 1,
) -> dict[str, str]:
    """TSV/CSV two-column lookup table (Metafix ``put_filemap``;
    reference alma.fix:14-16 loads hbz-to-zdb.tsv.gz with
    sep_char/key_column/value_column options). Gzip transparent; rows
    missing either column are skipped; first occurrence of a key wins
    (stable under re-reads)."""
    table: dict[str, str] = {}
    with _open_maybe_gz(path) as fh:
        for ln in fh:
            ln = ln.rstrip("\n")
            if not ln:
                continue
            parts = ln.split(sep_char)
            if len(parts) <= max(key_column, value_column):
                continue
            k = parts[key_column]
            if k not in table:
                table[k] = parts[value_column]
    return table


_TTL_PREFIX_RX = re.compile(r"@prefix\s+(\S*):\s*<([^>]*)>\s*\.")
_TTL_TRIPLE_RX = re.compile(
    r"""^\s*
    (?P<s><[^>]*>|\S+:\S+)\s+
    (?P<p><[^>]*>|a|\S+:\S+)\s+
    (?P<o><[^>]*>|"(?:\\.|[^"\\])*"(?:@[\w-]+|\^\^\S+)?|\S+:\S+)\s*
    [;.]\s*$""",
    re.VERBOSE,
)


def load_rdfmap(path: str, *, target: str | None = None) -> dict[str, str]:
    """RDF Turtle subject→object lookup map (Metafix ``put_rdfmap``;
    reference alma.fix:18-20 loads lobid-gnd.lmdb-style maps — the
    lmdb binary form is environment-specific, the RDF source form is
    the documented input). Supports the line-oriented Turtle subset:
    ``@prefix`` declarations, one ``subject predicate object .``
    triple per line (``;`` continuation lines reuse the last subject).
    ``target`` filters by predicate (prefixed or full IRI); object
    literals are unquoted, IRIs stripped of ``<>``; first object per
    subject wins."""
    prefixes: dict[str, str] = {}
    table: dict[str, str] = {}
    last_subject = None

    def expand(term: str) -> str:
        if term.startswith("<") and term.endswith(">"):
            return term[1:-1]
        if ":" in term:
            p, local = term.split(":", 1)
            if p in prefixes:
                return prefixes[p] + local
        return term

    def literal(term: str) -> str:
        if term.startswith('"'):
            end = term.rfind('"')
            return term[1:end].replace('\\"', '"').replace("\\\\", "\\")
        return expand(term)

    with _open_maybe_gz(path) as fh:
        for ln in fh:
            ln = ln.strip()
            if not ln or ln.startswith("#"):
                continue
            pm = _TTL_PREFIX_RX.match(ln)
            if pm:
                prefixes[pm.group(1)] = pm.group(2)
                continue
            m = _TTL_TRIPLE_RX.match(ln)
            if m:
                s, p, o = m.group("s"), m.group("p"), m.group("o")
                last_subject = expand(s)
            elif last_subject is not None:
                # "; predicate object ." continuation
                m2 = re.match(
                    r"^(?P<p><[^>]*>|a|\S+:\S+)\s+(?P<o>.+?)\s*[;.]\s*$", ln
                )
                if not m2:
                    continue
                p, o = m2.group("p"), m2.group("o")
                s = None
            else:
                continue
            pred = "rdf:type" if p == "a" else expand(p)
            if target is not None and pred not in (target, expand(target)):
                continue
            subj = last_subject
            if subj not in table:
                table[subj] = literal(o)
    return table


# -------------------------------------------------------------- selectors

_ARRAY_MARKER_RX = re.compile(r"\[\]")


def _split_selector(path: str) -> tuple[str, str | None]:
    """Fix path → (field, subfield) in the flat-row model (rules in the
    module docstring)."""
    p = _ARRAY_MARKER_RX.sub("", path)
    # "F.*.key" = key of EVERY element of array F (Dedup.java param
    # "OnlineAccess[].*.uri", alma.fix:898) → (F, key); trailing ".*"
    # = every element's value → (F, None)
    if p.endswith(".*"):
        return p[:-2], None
    star = p.find(".*.")
    if star >= 0:
        return p[:star], p[star + 3:] or None
    # strip EVERY $append / $last / $first marker segment (deep entity
    # paths chain them: "IdentifierISBN[].$last.identifierISBN[].$append",
    # reference marc/identifierISBN.fix:7); what remains of a marked
    # path is (field, key-after-the-first-marker)
    segs = p.split(".")
    kept = [s for s in segs if s not in ("$append", "$last", "$first")]
    if len(kept) != len(segs):
        first = next(
            i for i, s in enumerate(segs)
            if s in ("$append", "$last", "$first")
        )
        field = ".".join(segs[:first])
        key = ".".join(s for s in segs[first:] if not s.startswith("$"))
        # a trailing numeric segment is a 1-based element index
        # (alma.fix:812 "...identifierISBN[].1") — the flat model reads
        # first-occurrence values, so the index collapses into the key
        if key and "." in key:
            head, _, last = key.rpartition(".")
            if last.isdigit():
                key = head
        elif key.isdigit():
            key = ""
        return field, key or None
    # single-character trailing component = MARC subfield code; a
    # bracketed class selects several codes ("$i.[abcdehnpqs]",
    # alma.fix:811). On an @-variable (internal array, no subfields) a
    # trailing NUMERIC component is a 1-based element index
    # (marc/extent.fix:17-29 "@300a.1"/"@300a.2") — carried to the ops
    # as an index-selector sentinel in the subfield slot.
    if "." in p:
        head, _, last = p.rpartition(".")
        if head.startswith("@") and last.isdigit():
            return head, "\x1didx:" + last
        if len(last) == 1 or (last.startswith("[") and last.endswith("]")):
            return head, last
    return p, None


_DST_MARKER_RX = re.compile(r"\$(append|last|first)")


def _key_is_array(path: str) -> bool:
    """True when the path's final KEY segment is []-marked — the write
    site declares an array container for that key ("...$last.title[]
    .$append" vs the scalar "...$last.title")."""
    segs = [seg for seg in path.split(".")
            if seg not in ("$append", "$last", "$first")]
    return bool(segs) and segs[-1].endswith("[]")


def _dst_mode(path: str) -> str:
    """Entity-attachment mode of a destination path: ``$append`` starts
    a NEW entity; ``$last``/``$first`` (and a plain dotted path, the
    Metafix getOrCreate-hash behavior) write into the record's existing
    entity, creating one only if absent. The FIRST marker in a chained
    path ("X[].$last.y[].$append") decides — deeper markers concern
    repetition WITHIN the entity, which the flat model stores as
    sibling rows anyway."""
    if path.startswith("$") and not path.startswith("$["):
        # loop-var-rooted destination ("$i.key[].$append"): the loop
        # ELEMENT is the entity anchor, so the write always joins it;
        # markers past the var concern repetition within the entity
        return "last"
    m = _DST_MARKER_RX.search(path)
    return "append" if m is not None and m.group(1) == "append" else "last"


# ---------------------------------------------------------------- compiler

def _loop_needs_sequential(ops, loop_field: str) -> bool:
    """True when a do-list body both WRITES and PREDICATES on the same
    field outside the loop path — cross-element state that the
    per-element-parallel execution cannot carry."""
    writes: set = set()
    preds: set = set()
    temps: set = set()   # consumed within the element: not cross-state

    def walk(op_list):
        for n, kw in op_list:
            if n in ("copy_field", "move_field"):
                writes.add(kw.get("dst"))
                if n == "move_field":
                    temps.add(kw.get("src"))
            elif n == "remove_field":
                temps.add(kw.get("field"))
            elif n in ("add_field", "add_hash", "add_array", "new_entity"):
                writes.add(kw.get("field"))
            elif n == "paste":
                writes.add(kw.get("dst"))
            if n == "if":
                for pname, pkw in _iter_preds(kw.get("pred")):
                    preds.add(pkw.get("field"))
                walk(kw.get("ops", ()))
                if kw.get("else_ops"):
                    walk(kw["else_ops"])
                for _p, b in kw.get("branches", ()):
                    walk(b)
            elif n == "in" or n == "if_member_local":
                walk(kw.get("ops", ()))
            elif n in ("do_list", "do_list_elements"):
                walk(kw.get("ops", ()))

    def _iter_preds(pred):
        if not pred:
            return
        pn, pkw = pred
        if pn == "not":
            yield from _iter_preds(pkw.get("pred"))
        else:
            yield pn, pkw
        if pkw.get("other_field"):
            yield pn, {"field": pkw["other_field"]}

    walk(ops)
    hot = (writes & preds) - temps - {loop_field, None}
    return bool(hot)


_VAR_RX = re.compile(r"\$\[([^\]]+)\]")

_PRED_NAMES = {
    "exists", "any_match", "any_equal", "any_contain", "none_match",
    "none_equal", "none_contain", "all_match", "all_equal", "all_contain",
    # structural / membership predicates the reference rule corpus uses
    # (alma.fix:304,759,1092; macros.fix:10,55,219)
    "is_empty", "is_array", "is_hash", "in",
    # str_* compare their (var-substituted) string arguments directly —
    # constant once $[vars] are bound, compiled to a const predicate
    "str_equal", "str_contain", "str_match",
    # reference custom predicate (MemberLocal.java:14-34; alma.fix:412)
    "member_local",
}

# value transforms: (op name, required positional count beyond path)
_SIMPLE_VALUE_OPS = {
    "trim": 0, "upcase": 0, "downcase": 0, "vacuum": None,
}


class _Compiler:
    def __init__(
        self,
        *,
        vars: dict[str, str] | None = None,
        base_dir: str | None = None,
        maps: dict[str, dict] | None = None,
        max_include_depth: int = 16,
        missing_maps: str = "error",
        missing_vars: str = "error",
    ):
        self.vars = dict(vars or {})
        # caller-supplied vars win over file-level put_var defaults, the
        # way the reference's job setup overrides rule-file variables
        # (Limetrans.java:167-171 merges config vars over file defaults)
        self._caller_vars = frozenset(self.vars)
        self.base_dir = base_dir
        self.maps: dict[str, dict] = dict(maps or {})
        self.macros: dict[str, list] = {}
        self._include_stack: list[str] = []
        self.root_dir = base_dir  # fixed at the main fix file's dir
        self.max_include_depth = max_include_depth
        # missing_maps: "error" (default) raises on an unreadable
        # put_filemap/put_rdfmap/put_lmdbmap source; "empty" registers
        # an empty map and records a warning — the conformance-compile
        # mode for rule corpora whose external map data (reference
        # alma.fix:15-21 $[external-maps] TSVs + LMDBs) is not present
        if missing_maps not in ("error", "empty"):
            raise ValueError(f"missing_maps must be 'error' or 'empty', got {missing_maps!r}")
        self.missing_maps = missing_maps
        # missing_vars: "error" (default) raises on an undefined
        # $[var]; "literal" keeps the marker text and records a warning
        # — mirroring Metafix's LAZY resolution, where a $[var] inside
        # a never-executed branch resolves never (the reference's
        # transformation test suites compile with EMPTY vars,
        # Limetrans.java:508, TransformationTestCase.java:103)
        if missing_vars not in ("error", "literal"):
            raise ValueError(
                f"missing_vars must be 'error' or 'literal', got {missing_vars!r}"
            )
        self.missing_vars = missing_vars
        self.warnings: list[str] = []
        # array-shape hints harvested from []-marked path arguments —
        # the JSON sink needs them to emit Metafix's array containers
        # ("Edition.edition[]" serializes as {"Edition":{"edition":[..]}}
        # even with one element) which the flat-row model cannot carry
        self.shapes: dict[str, set] = {
            "array_fields": set(),
            "array_subs": set(),
            # keys also written WITHOUT the [] marker somewhere in the
            # program: the shape is branch-dependent (seriesStatement.fix
            # declares $last.title[] on the 490 path while
            # seriesAddedEntryUniformTitle.fix sets scalar $last.title on
            # the 830 path); program-global hints can't know which branch
            # a record takes, so a scalar write elsewhere VETOES the
            # array hint — the runtime repetition then decides
            "scalar_subs": set(),
        }
        # enclosing do-list loop variables visible inside nested loop
        # bodies: name -> (field, subfield) selector
        self._outer_loops: dict[str, tuple] = {}

    def _note_shape(self, path: str, field: str, sub) -> None:
        if "[]" not in path:
            return
        segs = path.split(".")
        fsegs = field.split(".")
        if (
            len(segs) >= len(fsegs)
            and segs[len(fsegs) - 1] == fsegs[-1] + "[]"
        ):
            self.shapes["array_fields"].add(field)
        if sub is not None and (sub + "[]") in segs:
            self.shapes["array_subs"].add((field, sub))
        elif sub is not None and sub in segs:
            self.shapes["scalar_subs"].add((field, sub))

    def _load_map_guarded(self, mname: str, path: str, line: int, loader):
        """Register map ``mname`` from ``loader()``; a missing/unreadable
        source follows the ``missing_maps`` policy."""
        try:
            self.maps[mname] = loader()
        except (FileNotFoundError, NotADirectoryError, IsADirectoryError) as e:
            if self.missing_maps != "empty":
                raise FixCompileError(
                    f"line {line}: map source {path!r} for {mname!r} unreadable "
                    f"({e}); pass missing_maps='empty' to compile without it"
                ) from e
            # caller-supplied data for this name wins over an absent
            # file (the reference registers operator maps in code
            # before the rules run, Limetrans.java:335-346 — fixture
            # harnesses supply them the same way)
            self.maps.setdefault(mname, {})
            self.warnings.append(
                f"line {line}: map {mname!r} source missing ({path}); "
                "kept caller-supplied/empty"
            )

    # -- variable substitution --------------------------------------
    def _sub(self, s: str, line: int) -> str:
        def repl(m):
            name = m.group(1)
            if name not in self.vars:
                if self.missing_vars == "literal":
                    self.warnings.append(
                        f"line {line}: undefined fix variable $[{name}] kept literal"
                    )
                    return m.group(0)
                raise FixCompileError(f"line {line}: undefined fix variable $[{name}]")
            return str(self.vars[name])

        return _VAR_RX.sub(repl, s)

    # -- predicates ---------------------------------------------------
    def _compile_pred(self, cmd, loopvar: str | None, loop_sel) -> tuple:
        _tag, name, args, kwargs, line = cmd
        if name not in _PRED_NAMES:
            raise FixCompileError(f"line {line}: unsupported fix predicate {name!r}")
        args = [self._sub(a, line) for a in args]
        if name.startswith("str_"):
            # str_equal/str_contain/str_match compare STRINGS, not paths
            # (metafacture-fix string predicates) — with $[vars] bound
            # both sides are constants, so the branch condition is too
            if len(args) < 2:
                raise FixCompileError(f"line {line}: {name} needs two strings")
            a, b = args[0], args[1]
            if name == "str_equal":
                truth = a == b
            elif name == "str_contain":
                truth = b in a
            else:  # str_match — Java matches(): full match
                truth = re.fullmatch(b, a) is not None
            return ("const", {"value": truth})
        if name == "in":
            # in(path_a, path_b): some value of a equals some value of b
            # (alma.fix:759,1032 holdings-id correlation)
            if len(args) < 2:
                raise FixCompileError(f"line {line}: in needs (path, path)")
            fa, sa = self._resolve_path(args[0], loopvar, loop_sel, line)
            fb, sb = self._resolve_path(args[1], loopvar, loop_sel, line)
            kw = {"field": fa, "other_field": fb}
            if sa is not None:
                kw["subfield"] = sa
            if sb is not None:
                kw["other_subfield"] = sb
            return ("in", kw)
        field, sub = self._resolve_path(args[0], loopvar, loop_sel, line)
        kw: dict = {"field": field}
        if sub is not None:
            kw["subfield"] = sub
        if "$last" in args[0] or "$first" in args[0]:
            # "$[target].preferredName" with target "CorporateBody[]
            # .$last" (macros.fix:28 lobid-gnd): the predicate tests the
            # CURRENT entity, not the whole array
            kw["last_only"] = True
        if name == "member_local":
            # MemberLocal.java:24-34: path.M absent, or any path.M value
            # equals the job's $[member] var
            if sub is not None:
                raise FixCompileError(
                    f"line {line}: member_local takes an entity path, not a subfield"
                )
            kw["member"] = str(self.vars.get("member", ""))
            return ("member_local", kw)
        if name in ("exists", "is_empty", "is_array", "is_hash"):
            pred = (name, kw)
        elif name.endswith("_match"):
            if len(args) < 2:
                raise FixCompileError(f"line {line}: {name} needs (path, pattern)")
            kw["pattern"] = _java_regex_to_python(args[1])
            pred = (name, kw)
        else:  # any/none/all _equal / _contain
            if len(args) < 2:
                raise FixCompileError(f"line {line}: {name} needs (path, value)")
            kw["value"] = args[1]
            pred = (name, kw)
        return pred

    # -- path resolution ----------------------------------------------
    def _resolve_path(self, path, loopvar, loop_sel, line):
        """A path arg → (field, subfield), mapping the loop variable
        (current first, then any enclosing loop's)."""
        if loopvar is None or not (
            path == loopvar or path.startswith(loopvar + ".")
        ):
            for outer, outer_sel in reversed(self._outer_loops.items()):
                if path == outer or path.startswith(outer + "."):
                    loopvar, loop_sel = outer, outer_sel
                    break
        if loopvar is not None and (path == loopvar or path.startswith(loopvar + ".")):
            lf, ls = loop_sel
            if path == loopvar:
                return lf, ls
            suffix = path[len(loopvar) + 1:]
            if suffix == "*":
                # "$i.*" = every element of the loop value's array
                # (macros.fix:56 remove-nonsort source: "$[source].*") —
                # in the flat row model the loop selector already names
                # all of its rows
                return lf, ls
            if ls is not None:
                raise FixCompileError(
                    f"line {line}: loop var {loopvar} is a value path; "
                    f"{path!r} cannot select a subfield of it"
                )
            if "." in suffix:
                # marker-chained key ("$i.verifiedIdentifierForLinking
                # Entry[].$append", DE-708-deposit.fix:81): drop the
                # $append/$last/$first segments, keep the key
                segs = [
                    s for s in suffix.split(".")
                    if s not in ("$append", "$last", "$first")
                ]
                suffix = ".".join(segs)
            if suffix.endswith("[]"):
                # array-marked subfield key ("$i.controlNumber[]",
                # DE-708-deposit.fix:80) — the marker is a shape hint;
                # an alternation loop selector hints each alternative
                # (the nester sees concrete field names)
                suffix = suffix[:-2]
                for alt in lf.split("|"):
                    self.shapes["array_subs"].add((alt, suffix))
            return lf, suffix
        if loopvar is None and path.startswith("$") and not path.startswith("$["):
            raise FixCompileError(
                f"line {line}: loop variable reference {path!r} outside a do list(...) body"
            )
        field, sub = _split_selector(path)
        self._note_shape(path, field, sub)
        return field, sub

    # -- includes / maps / macros --------------------------------------
    def _do_include(
        self, path: str, line: int, ops_out: list, loopvar, loop_sel,
        inc_vars: dict | None = None,
    ):
        if self.base_dir is None:
            raise FixCompileError(f"line {line}: include() needs a base directory")
        full = os.path.normpath(os.path.join(self.base_dir, path))
        if not os.path.exists(full) and self.root_dir not in (None, self.base_dir):
            # the reference corpus writes nested includes relative to
            # the MAIN fix file's directory (marc/person.fix:7 includes
            # "./marc/_person.fix" from inside marc/) — fall back to the
            # root when the file-relative candidate does not exist
            root_full = os.path.normpath(os.path.join(self.root_dir, path))
            if os.path.exists(root_full):
                full = root_full
        if full in self._include_stack:
            raise FixCompileError(f"line {line}: include cycle via {full}")
        if len(self._include_stack) >= self.max_include_depth:
            raise FixCompileError(f"line {line}: include depth > {self.max_include_depth}")
        with open(full, encoding="utf-8") as fh:
            ast = parse_fix(fh.read())
        old_base, old_vars = self.base_dir, self.vars
        self._include_stack.append(full)
        self.base_dir = os.path.dirname(full)
        if inc_vars:
            self.vars = {**self.vars, **inc_vars}
        try:
            self._compile_body(ast, ops_out, loopvar, loop_sel)
        finally:
            self.base_dir, self.vars = old_base, old_vars
            self._include_stack.pop()

    def _resolve_map(self, name: str, line: int) -> dict:
        if name not in self.maps:
            # Metafix resolves an undefined map name to an EMPTY map
            # (Metafacture Maps.getMap default — reference rule files
            # rely on it: macros/alma.fix:49 looks up
            # alma-format-carrier-facet-$[start] for start values whose
            # facet map was never declared, expecting delete-all)
            self.warnings.append(f"line {line}: undefined lookup map {name!r}; empty")
            return {}
        return self.maps[name]

    # -- command compilation -------------------------------------------
    def _compile_body(self, stmts, ops_out: list, loopvar=None, loop_sel=None):
        for st in stmts:
            tag = st[0]
            if tag == "cmd":
                self._compile_cmd(st, ops_out, loopvar, loop_sel)
            elif tag == "do":
                self._compile_do(st, ops_out, loopvar, loop_sel)
            elif tag == "if":
                _t, branches, else_body = st
                (pred0, body0), *rest = branches
                kw = {
                    "pred": self._compile_pred(pred0, loopvar, loop_sel),
                    "ops": self._sub_ops(body0, loopvar, loop_sel),
                }
                if rest:
                    kw["elifs"] = [
                        (
                            self._compile_pred(p, loopvar, loop_sel),
                            self._sub_ops(b, loopvar, loop_sel),
                        )
                        for p, b in rest
                    ]
                if else_body is not None:
                    kw["else_ops"] = self._sub_ops(else_body, loopvar, loop_sel)
                ops_out.append(("if", kw))
            elif tag == "unless":
                _t, pred, body = st
                ops_out.append(
                    (
                        "if",
                        {
                            "pred": (
                                "not",
                                {"pred": self._compile_pred(pred, loopvar, loop_sel)},
                            ),
                            "ops": self._sub_ops(body, loopvar, loop_sel),
                        },
                    )
                )
            else:  # pragma: no cover — parser emits only the above
                raise FixCompileError(f"unknown statement tag {tag!r}")

    def _sub_ops(self, body, loopvar, loop_sel) -> list:
        out: list = []
        self._compile_body(body, out, loopvar, loop_sel)
        return out

    def _compile_do(self, st, ops_out, loopvar, loop_sel):
        _t, head, body = st
        _tag, name, args, kwargs, line = head
        if name == "once":
            # setup scope: runs its body once per program (includes, map
            # loads); record ops inside compile in place
            self._compile_body(body, ops_out, loopvar, loop_sel)
            return
        if name == "put_macro":
            if not args:
                raise FixCompileError(f"line {line}: put_macro needs a name")
            # options on the put_macro head are the macro's DEFAULT
            # parameters (reference macros.fix:204 do put_macro
            # ("substring", length: "1")) — call_macro kwargs override
            defaults = {k: self._sub(v, line) for k, v in kwargs.items()}
            self.macros[self._sub(args[0], line)] = (defaults, body)
            return
        if name == "list":
            path = kwargs.get("path") or (args[0] if args else None)
            var = kwargs.get("var") or (args[1] if len(args) > 1 else None)
            if path is None or var is None:
                raise FixCompileError(f"line {line}: do list needs path: and var:")
            path = self._sub(path, line)
            field, sub = self._resolve_path(path, loopvar, loop_sel, line)
            inner: list = []
            # enclosing loop vars stay visible inside the body
            # (DE-708-deposit.fix:78-82 pastes into the OUTER "$i."
            # entity from within the inner "$j" loop)
            if loopvar is not None:
                self._outer_loops[loopvar] = loop_sel
            try:
                self._compile_body(body, inner, var, (field, sub))
            finally:
                if loopvar is not None:
                    self._outer_loops.pop(loopvar, None)
            kw = {"field": field, "ops": inner}
            if sub is not None:
                kw["subfield"] = sub
            if _loop_needs_sequential(inner, field):
                # the body READS state the body WRITES (lobid-gnd's
                # first-element-wins preferredName, macros.fix:27-33;
                # the H66 holdings merge keyed on earlier elements'
                # @id, alma.fix:758-765): element i must see element
                # i-1's effects, so the loop runs element-at-a-time
                kw["sequential"] = True
            ops_out.append(("do_list_elements", kw))
            return
        raise FixCompileError(f"line {line}: unsupported do-block {name!r}")

    def _compile_cmd(self, st, ops_out, loopvar, loop_sel):
        _tag, name, args, kwargs, line = st
        args = [self._sub(a, line) for a in args]
        kwargs = {k: self._sub(v, line) for k, v in kwargs.items()}

        def path_kw(p, key_field="field", key_sub="subfield"):
            f, s = self._resolve_path(p, loopvar, loop_sel, line)
            kw = {key_field: f}
            if s is not None:
                kw[key_sub] = s
            return kw

        if name == "include":
            # include() options are vars scoped to the included file
            # (linkingEntries.fix:2-17 parameterized _linkingEntry.fix)
            inc_vars = {k: self._sub(v, line) for k, v in kwargs.items()}
            self._do_include(
                args[0], line, ops_out, loopvar, loop_sel, inc_vars=inc_vars
            )
        elif name == "put_map":
            mname, table = args[0], dict(kwargs)
            self.maps[mname] = table
        elif name == "put_filemap":
            path = os.path.join(self.base_dir or ".", args[0])
            mname = args[1] if len(args) > 1 else os.path.basename(args[0])
            self._load_map_guarded(
                mname, path, line,
                lambda: load_filemap(
                    path,
                    sep_char=kwargs.get("sep_char", "\t"),
                    key_column=int(kwargs.get("key_column", 0)),
                    value_column=int(kwargs.get("value_column", 1)),
                ),
            )
        elif name == "put_rdfmap":
            path = os.path.join(self.base_dir or ".", args[0])
            mname = args[1] if len(args) > 1 else os.path.basename(args[0])
            self._load_map_guarded(
                mname, path, line,
                lambda: load_rdfmap(path, target=kwargs.get("target")),
            )
        elif name == "put_lmdbmap":
            # the reference's LMDB-backed out-of-core map
            # (PutLmdbMap.java:14-24, alma.fix:18-20); here the engine's
            # own DiskMap directory format is the on-disk analogue —
            # opened mmap-backed, consumed zero-copy by the lookup op
            path = os.path.join(self.base_dir or ".", args[0])
            mname = args[1] if len(args) > 1 else os.path.basename(args[0])

            def _open_diskmap():
                from ..state.diskmap import DiskMap

                return DiskMap.open(path)

            self._load_map_guarded(mname, path, line, _open_diskmap)
        elif name == "call_macro":
            mname = args[0]
            if mname not in self.macros:
                raise FixCompileError(f"line {line}: unknown macro {mname!r}")
            defaults, body = self.macros[mname]
            saved = self.vars
            self.vars = {**self.vars, **defaults, **kwargs}
            try:
                self._compile_body(body, ops_out, loopvar, loop_sel)
            finally:
                self.vars = saved
        elif name == "copy_field" or name == "move_field":
            src_f, src_s = self._resolve_path(args[0], loopvar, loop_sel, line)
            dst_f, dst_s = self._resolve_path(args[1], loopvar, loop_sel, line)
            kw = {"src": src_f, "dst": dst_f}
            # dst without a key: a VALUE copy (subfielded src → scalar
            # dst rows), but an ENTITY copy (no src subfield) keeps the
            # source's subfields — Metafix copies the hash wholesale
            # (person.fix:14 move_field("@person", "Person[]"))
            if dst_s is not None or src_s is not None:
                kw["dst_sub"] = dst_s
            if dst_s is not None or _DST_MARKER_RX.search(args[1]):
                # a marker on a key-less dst ("@callnumber.$append",
                # alma.fix:1031) still selects the attachment mode
                kw["dst_mode"] = _dst_mode(args[1])
            if dst_s is not None and _key_is_array(args[1]) \
                    and _DST_MARKER_RX.search(args[1]):
                # the write site declares the key an ARRAY: emit a
                # per-entity shape marker so the sink renders a list
                # even when the program's OTHER branches write the same
                # key scalar (seriesStatement.fix 490-path title[] vs
                # seriesAddedEntryUniformTitle.fix 830-path title)
                kw["dst_arr"] = True
            if src_s is not None:
                kw["src_sub"] = src_s
            if dst_s is None and src_s is None:
                # entity copy/move: the source's array-shape hints
                # follow the rename (person.fix declares arrays on
                # "@person.$last.x[]", then moves @person → Person[])
                for f, s in list(self.shapes["array_subs"]):
                    if f == src_f:
                        self.shapes["array_subs"].add((dst_f, s))
                if src_f in self.shapes["array_fields"]:
                    self.shapes["array_fields"].add(dst_f)
                # dotted hash children declared as arrays
                # ("@rswk.identifierGND[]", macros.fix:103) become dst
                # SUBFIELD arrays after the family move
                pfx_ = src_f + "."
                for f in list(self.shapes["array_fields"]):
                    if f.startswith(pfx_):
                        self.shapes["array_subs"].add(
                            (dst_f, f[len(pfx_):])
                        )
            ops_out.append((name, kw))
        elif name == "add_field":
            kw = path_kw(args[0])
            kw["value"] = args[1]
            if kw.get("subfield") is not None:
                kw["dst_mode"] = _dst_mode(args[0])
            ops_out.append(("add_field", kw))
        elif name == "remove_field":
            ops_out.append(("remove_field", path_kw(args[0])))
        elif name == "standard_number":
            # StandardNumber.java:57-66: normalize the number read from
            # `source` (default: the entity's identifier{Type} field)
            # into preferred{Type} / variant{Type}[] of the entity at
            # aParams[1] (alma.fix:495,530,812)
            if len(args) < 2:
                raise FixCompileError(
                    f"line {line}: standard_number needs (type, entity_path)"
                )
            ntype = args[0].upper()
            ent_f, _ent_s = self._resolve_path(args[1], loopvar, loop_sel, line)
            kw = {"type": ntype, "field": ent_f}
            if "$last" in args[1] or "$first" in args[1]:
                # "IdentifierZDB[].$last" (alma.fix:495) normalizes the
                # CURRENT entity only, not every element of the array
                kw["last_only"] = True
            # StandardNumber writes variant{Type} as an array member of
            # the entity (StandardNumber.java:57-66)
            self.shapes["array_subs"].add((ent_f, f"variant{ntype}"))
            src = kwargs.get("source")
            if src is not None:
                # a trailing ".N" element index selects the N-th value
                # of the source array within each entity
                m = re.search(r"\.(\d+)$", src)
                if m:
                    kw["source_idx"] = int(m.group(1))
                    src = src[: m.start()]
                sf, ss = self._resolve_path(src, loopvar, loop_sel, line)
                kw["source_field"] = sf
                if ss is not None:
                    kw["source_sub"] = ss
            ops_out.append(("standard_number", kw))
        elif name == "replace_all":
            kw = path_kw(args[0])
            kw["pattern"] = _java_regex_to_python(args[1])
            kw["replacement"] = _java_replacement_to_python(args[2])
            ops_out.append(("replace_all", kw))
        elif name == "lookup":
            kw = path_kw(args[0])
            if len(args) > 1:
                kw["table"] = self._resolve_map(args[1], line)
            else:
                kw["table"] = {
                    k: v for k, v in kwargs.items() if k not in ("delete", "default")
                }
            if str(kwargs.get("delete", "")).lower() == "true":
                kw["delete"] = True
            if "default" in kwargs:
                kw["default"] = kwargs["default"]
            ops_out.append(("lookup", kw))
        elif name == "paste":
            dst_f, dst_s = self._resolve_path(args[0], loopvar, loop_sel, line)
            srcs = []
            for a in args[1:]:
                if a.startswith("~"):
                    srcs.append({"lit": a[1:]})
                else:
                    f, s = self._resolve_path(a, loopvar, loop_sel, line)
                    srcs.append({"field": f, "subfield": s} if s is not None else f)
            kw = {"dst": dst_f, "dst_sub": dst_s, "srcs": srcs}
            if dst_s is not None:
                kw["dst_mode"] = _dst_mode(args[0])
            if "join_char" in kwargs:
                kw["join_char"] = kwargs["join_char"]
            ops_out.append(("paste", kw))
        elif name == "uniq" or name == "dedup":
            # reference dedup(path) (Dedup.java:20-24) keeps the first
            # occurrence of each value at the path within a record —
            # the uniq record op with a subfield-scoped selector
            ops_out.append(("uniq", path_kw(args[0])))
        elif name == "flatten":
            # Metafix flatten() collapses nested arrays (alma.fix:935
            # after split_field); the flat row model stores split parts
            # as sibling rows already, so flatten is a structural no-op
            pass
        elif name == "retain":
            fields = [self._resolve_path(a, loopvar, loop_sel, line)[0] for a in args]
            ops_out.append(("retain", {"fields": fields, "prefix": True}))
        elif name == "reject":
            ops_out.append(("reject", {}))
        elif name == "add_array":
            # Metafix set/add_array REPLACES an existing container, so
            # a bare add_array("X[]") compiles to a RESET of the field
            # (alma.fix:489 discards the 035-derived IdentifierZDB
            # entities; rule corpora guard re-inits with ``unless
            # exists`` for exactly this reason). Marker paths
            # ("X[].$last.place[]") initialize within the CURRENT
            # entity only — structural no-ops in the flat model, where
            # wiping the subfield would hit every earlier entity.
            if len(args) > 1:
                kw = path_kw(args[0])
                kw["values"] = args[1:]
                ops_out.append(("add_array", kw))
            elif args and "$" not in args[0]:
                ops_out.append(("add_array", path_kw(args[0])))
        elif name == "add_hash":
            if kwargs:
                kw = path_kw(args[0])
                kw["entries"] = dict(kwargs)
                kw["dst_mode"] = _dst_mode(args[0])
                ops_out.append(("add_hash", kw))
            else:
                # bare add_hash("X[].$append") OPENS a new entity that
                # subsequent $last destinations join (person.fix:1,
                # publisherName.fix:3); realized as a placeholder row
                # dropped at end-of-program (no empty containers)
                kw = path_kw(args[0])
                kw.pop("subfield", None)
                ops_out.append(("new_entity", kw))
        elif name == "parse_text":
            kw = path_kw(args[0])
            kw["pattern"] = _java_regex_to_python(args[1])
            ops_out.append(("parse_text", kw))
        elif name in ("prepend", "append"):
            kw = path_kw(args[0])
            kw["value"] = args[1]
            ops_out.append((name, kw))
        elif name == "substring":
            kw = path_kw(args[0])
            kw["start"] = int(args[1]) if len(args) > 1 else int(kwargs.get("start", 0))
            length = args[2] if len(args) > 2 else kwargs.get("length")
            if length is not None:
                kw["length"] = int(length)
            ops_out.append(("substring", kw))
        elif name in ("trim", "upcase", "downcase"):
            ops_out.append((name, path_kw(args[0])))
        elif name == "join_field":
            kw = path_kw(args[0])
            if len(args) > 1:
                kw["join_char"] = args[1]
            ops_out.append(("join_field", kw))
        elif name == "split_field":
            if len(args) < 2:
                raise FixCompileError(
                    f"line {line}: split_field needs (path, regexp)"
                )
            kw = path_kw(args[0])
            kw["pattern"] = _java_regex_to_python(args[1])
            ops_out.append(("split_field", kw))
        elif name == "filter":
            if len(args) < 2:
                raise FixCompileError(f"line {line}: filter needs (path, regexp)")
            kw = path_kw(args[0])
            kw["pattern"] = _java_regex_to_python(args[1])
            if str(kwargs.get("invert", "")).lower() == "true":
                kw["invert"] = True
            ops_out.append(("filter_values", kw))
        elif name == "put_var":
            # compile-time variable: later $[name] substitutions see it.
            # KNOWN DEVIATION: put_var executes unconditionally at
            # compile time (even inside a not-taken if/unless branch) —
            # the reference evaluates it per record at run time. A
            # caller-supplied var (compile_fix(vars=...)) is NOT
            # overwritten, so file-level put_var acts as a default, like
            # the reference's job-setup var merge.
            if args[0] not in self._caller_vars:
                self.vars[args[0]] = args[1]
        elif name == "vacuum":
            ops_out.append(("vacuum", {}))
        elif name == "drop_local":
            member = kwargs.get("member", self.vars.get("member"))
            if member is None:
                raise FixCompileError(
                    f"line {line}: drop_local needs a member (vars['member'])"
                )
            ops_out.append(("drop_local", {"member": member}))
        elif name == "drop_repeated":
            kw = path_kw(args[0])
            if "index" in kwargs:
                kw["index"] = int(kwargs["index"])
            ops_out.append(("drop_repeated", kw))
        elif name == "verify_links":
            # kwarg-driven form of the reference's verify_links()
            # (VerifyLinks.java configures via setup(isil-path) + bgzf
            # set files; here key/skip sets come from registered maps —
            # their KEY sets — so put_filemap/put_map/put_rdfmap are the
            # loaders): entries: "A,B", source: SUBFIELD (or
            # record_source/record_source_sub), suffix:, keys: MAP,
            # skip: MAP?
            if not args and not kwargs:
                # the reference's argless form (alma.fix:1299): the
                # built-in Link configuration (VerifyLinks.java:36-93) —
                # ID/ISBN/ISSN over the linking entries, plus the super
                # link. Key/skip sets come from registered maps named
                # verify-{id,isbn,issn,superid} / verify-skip{...} (the
                # engine's analogue of setup()'s {isil-path}.{key}.bgzf
                # files); a link whose key map is unregistered/empty is
                # skipped entirely, like a missing non-required set file
                linking_entries = [
                    "AdditionalPhysicalFormEntry", "ConstituentUnitEntry",
                    "DataSourceEntry", "HostItemEntry", "IssuedWithEntry",
                    "MainSeriesEntry", "NonspecificRelationshipEntry",
                    "OriginalLanguageEntry", "OtherEditionEntry",
                    "PrecedingEntry", "SubSeriesEntry", "SucceedingEntry",
                    "SupplementParentEntry", "SupplementSpecialIssueEntry",
                    "TranslationEntry",
                ]
                builtin = [
                    ("id", "identifierForLinkingEntry",
                     "IdentifierForLinkingEntry", linking_entries),
                    ("isbn", "preferredISBN", "PreferredISBN", linking_entries),
                    ("issn", "preferredISSN", "PreferredISSN", linking_entries),
                ]
                for key, source, suffix, entries in builtin:
                    keys = self.maps.get(f"verify-{key}")
                    if not keys:
                        continue
                    kw = {
                        "entries": list(entries), "suffix": suffix,
                        "source": source, "keys": set(keys),
                    }
                    skip = self.maps.get(f"verify-skip{key}")
                    if skip:
                        kw["skip"] = set(skip)
                    ops_out.append(("verify_links", kw))
                super_keys = self.maps.get("verify-superid")
                if super_keys:
                    ops_out.append((
                        "verify_links",
                        {
                            "entries": ["RecordIdentifier"],
                            "suffix": "SuperIdentifier",
                            "record_source": "xbib",
                            "record_source_sub": "uid",
                            "keys": set(super_keys),
                        },
                    ))
                return
            if "entries" not in kwargs or "suffix" not in kwargs:
                raise FixCompileError(
                    f"line {line}: verify_links needs entries: and suffix:"
                )
            kw = {
                "entries": [e.strip() for e in kwargs["entries"].split(",")],
                "suffix": kwargs["suffix"],
                "keys": set(self._resolve_map(kwargs["keys"], line)),
            }
            if "skip" in kwargs:
                kw["skip"] = set(self._resolve_map(kwargs["skip"], line))
            if "source" in kwargs:
                kw["source"] = kwargs["source"]
            elif "record_source" in kwargs:
                f, s = _split_selector(kwargs["record_source"])
                kw["record_source"] = f
                if s is not None:
                    kw["record_source_sub"] = s
            else:
                raise FixCompileError(
                    f"line {line}: verify_links needs source: or record_source:"
                )
            ops_out.append(("verify_links", kw))
        elif name == "nothing":
            pass
        else:
            raise FixCompileError(f"line {line}: unsupported fix command {name!r}")


def _java_groups_to_python(pattern: str) -> str:
    """Java named groups ``(?<name>...)`` → Python ``(?P<name>...)``
    (parse_text patterns in fix files use the Java form)."""
    return re.sub(r"\(\?<([A-Za-z][A-Za-z0-9]*)>", r"(?P<\1>", pattern)


# Java \p{...} POSIX / java.lang.Character classes → ASCII char sets
# (java.util.regex.Pattern "POSIX character classes (US-ASCII only)").
# Values are the BODY of a character class; wrapped in [...] (or
# [^...] for \P) outside one, spliced bare inside one.
_JAVA_POSIX_CLASSES = {
    "Upper": "A-Z",
    "Lower": "a-z",
    "Alpha": "A-Za-z",
    "Digit": "0-9",
    "Alnum": "A-Za-z0-9",
    "Punct": re.escape("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~"),
    "Space": " \\t\\n\\x0b\\f\\r",
    "Blank": " \\t",
    "XDigit": "0-9A-Fa-f",
}


def _scope_inline_flags(pattern: str) -> str:
    """Rewrite Java's mid-pattern inline flags to Python's scoped form:
    ``A((?i)B)C`` → ``A((?i:B))C``. Java lets ``(?i)`` appear anywhere
    and applies it to the rest of the enclosing group; Python ≥3.11
    rejects global flags not at position 0, but ``(?i:...)`` over the
    remainder of the group is the exact equivalent (alma.fix:997-998
    uses ``(?i)zeitschrift`` inside an alternation)."""
    while True:
        # locate a (?flags) token outside a char class, not at pos 0
        i = 0
        in_class = False
        found = -1
        flags = ""
        while i < len(pattern):
            c = pattern[i]
            if c == "\\":
                i += 2
                continue
            if c == "[" and not in_class:
                in_class = True
            elif c == "]" and in_class:
                in_class = False
            elif c == "(" and not in_class and pattern.startswith("(?", i):
                m = re.match(r"\(\?([imsx]+)\)", pattern[i:])
                if m and i > 0:
                    found, flags = i, m.group(1)
                    break
            i += 1
        if found < 0:
            return pattern
        rest_start = found + len(flags) + 3
        # find the close paren of the enclosing group (first unmatched
        # ')' scanning forward), skipping escapes and char classes
        j = rest_start
        depth = 0
        in_class = False
        close = len(pattern)
        while j < len(pattern):
            c = pattern[j]
            if c == "\\":
                j += 2
                continue
            if c == "[" and not in_class:
                in_class = True
            elif c == "]" and in_class:
                in_class = False
            elif not in_class and c == "(":
                depth += 1
            elif not in_class and c == ")":
                if depth == 0:
                    close = j
                    break
                depth -= 1
            j += 1
        pattern = (
            pattern[:found]
            + f"(?{flags}:"
            + pattern[rest_start:close]
            + ")"
            + pattern[close:]
        )


def _java_regex_to_python(pattern: str) -> str:
    """Translate the Java regex dialect fix rules carry to Python
    ``re``: named groups ``(?<n>...)`` → ``(?P<n>...)``, POSIX
    classes ``\\p{Upper}`` → ``[A-Z]`` (``A-Z`` when already inside a
    character class; ``\\P{...}`` negated), and mid-pattern inline
    flags ``(?i)`` scoped to the rest of the enclosing group. Classes
    Python has natively (``\\d``, ``\\w``, lookarounds) pass through;
    unknown ``\\p{...}`` names are left verbatim so the error surfaces
    at the runtime compile with the original spelling (macros.fix:74,
    marc/_person.fix:4 use ``\\p{Upper}``)."""
    pattern = _java_groups_to_python(pattern)
    if "(?" in pattern:
        pattern = _scope_inline_flags(pattern)
    if "\\p{" not in pattern and "\\P{" not in pattern:
        return pattern
    out: list[str] = []
    in_class = False
    i = 0
    while i < len(pattern):
        c = pattern[i]
        if c == "\\" and i + 1 < len(pattern):
            nxt = pattern[i + 1]
            if nxt in "pP" and i + 2 < len(pattern) and pattern[i + 2] == "{":
                end = pattern.find("}", i + 3)
                name = pattern[i + 3:end] if end > 0 else ""
                body = _JAVA_POSIX_CLASSES.get(name)
                if body is not None:
                    neg = nxt == "P"
                    if in_class:
                        # a negated class inside [...] has no splice
                        # form; keep verbatim (not used in the corpus)
                        out.append(pattern[i:end + 1] if neg else body)
                    else:
                        out.append(("[^" if neg else "[") + body + "]")
                    i = end + 1
                    continue
            out.append(pattern[i:i + 2])
            i += 2
            continue
        if c == "[" and not in_class:
            in_class = True
        elif c == "]" and in_class:
            in_class = False
        out.append(c)
        i += 1
    return "".join(out)


def _java_replacement_to_python(repl: str) -> str:
    """Java ``Matcher.replaceAll`` replacement → Python ``re.sub``
    replacement: ``$1`` → ``\\g<1>``, ``${name}`` → ``\\g<name>``,
    ``\\$`` → literal ``$``, ``\\x`` → literal x (backslash-escaped for
    Python where needed). alma.fix:205-208, macros.fix:64,98 use
    ``$n`` group references."""
    out: list[str] = []
    i = 0
    while i < len(repl):
        c = repl[i]
        if c == "\\" and i + 1 < len(repl):
            # Java: backslash makes the next char literal; in a Python
            # repl only a backslash itself needs re-escaping
            nxt = repl[i + 1]
            out.append("\\\\" if nxt == "\\" else nxt)
            i += 2
            continue
        if c == "$" and i + 1 < len(repl):
            nxt = repl[i + 1]
            if nxt.isdigit():
                j = i + 1
                while j < len(repl) and repl[j].isdigit():
                    j += 1
                out.append(f"\\g<{repl[i + 1:j]}>")
                i = j
                continue
            if nxt == "{":
                end = repl.find("}", i + 2)
                if end > 0:
                    out.append(f"\\g<{repl[i + 2:end]}>")
                    i = end + 1
                    continue
        out.append("\\\\" if c == "\\" else c)
        i += 1
    return "".join(out)


def compile_fix(
    text: str,
    *,
    vars: dict[str, str] | None = None,
    base_dir: str | None = None,
    maps: dict[str, dict] | None = None,
    missing_maps: str = "error",
    missing_vars: str = "error",
    warnings: list | None = None,
    shapes: dict | None = None,
) -> list[tuple[str, dict]]:
    """Fix text → RecordOps op-list (ready for
    :class:`~limetrans_ray.functions.recordops.RecordOps`).

    ``missing_maps="empty"`` compiles programs whose external map data
    is absent (each unreadable put_filemap/put_rdfmap/put_lmdbmap
    source registers an empty map); pass a list as ``warnings`` to
    collect one entry per substituted map. Pass a dict as ``shapes`` to
    collect the program's array-shape hints (``array_fields`` /
    ``array_subs`` sets) for the JSON sink's container decisions."""
    comp = _Compiler(vars=vars, base_dir=base_dir, maps=maps,
                     missing_maps=missing_maps, missing_vars=missing_vars)
    ops: list = []
    comp._compile_body(parse_fix(text), ops)
    if warnings is not None:
        warnings.extend(comp.warnings)
    if shapes is not None:
        # scalar writes veto conflicting array hints (branch-dependent
        # shape — see the scalar_subs comment in _Compiler.__init__)
        comp.shapes["array_subs"] -= comp.shapes["scalar_subs"]
        for k, v in comp.shapes.items():
            shapes.setdefault(k, set()).update(v)
    return ops


def load_fix_file(
    path: str,
    *,
    vars: dict[str, str] | None = None,
    maps: dict[str, dict] | None = None,
    missing_maps: str = "error",
    warnings: list | None = None,
    shapes: dict | None = None,
) -> list[tuple[str, dict]]:
    """Read + compile a ``.fix`` file; includes resolve relative to it."""
    with open(path, encoding="utf-8") as fh:
        text = fh.read()
    return compile_fix(
        text, vars=vars, base_dir=os.path.dirname(os.path.abspath(path)), maps=maps,
        missing_maps=missing_maps, warnings=warnings, shapes=shapes,
    )
