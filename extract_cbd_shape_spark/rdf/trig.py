"""Minimal TriG/Turtle parser — driver-side only.

Used to load SHACL shapes graphs (small, compiled on the driver and
broadcast) and test fixtures mirroring the reference corpus
(/root/reference/tests/**/*.ttl). Never runs on executors; the data
path at scale reads Parquet/Iceberg triples directly.

Covers the Turtle/TriG subset the reference corpus uses: @prefix,
IRIs, prefixed names, `a`, blank-node labels and property lists,
collections, literals (plain / @lang / ^^datatype / integer / decimal /
boolean), `;`/`,` continuation lists, comments, and TriG graph blocks
``<g> { ... }``.
"""

from __future__ import annotations

import re
from typing import Iterator, List, Optional, Tuple
from urllib.parse import urljoin

from extract_cbd_shape_spark.model import (
    BLANK,
    IRI,
    RDF_FIRST,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    Quad,
    Term,
    encode_quoted,
)

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<comment>\#[^\n]*)
  | (?P<qopen><<)
  | (?P<qclose>>>)
  | (?P<iri><[^<>"{}|^`\\\s]*>)
  | (?P<string>"""
    + r'"""(?:[^"\\]|\\.|"(?!""))*"""'
    + r"""|"(?:[^"\\\n]|\\.)*"|'(?:[^'\\\n]|\\.)*')
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<dtype>\^\^)
  | (?P<blank>_:[A-Za-z0-9_][A-Za-z0-9_.-]*)
  | (?P<num>[+-]?(?:\d+\.\d+(?:[eE][+-]?\d+)?|\.\d+(?:[eE][+-]?\d+)?|\d+(?:[eE][+-]?\d+)?))
  | (?P<punct>[;,.\[\]()\{\}])
  | (?P<pname>[A-Za-z_][\w.-]*)?:(?P<plocal>[A-Za-z0-9_%](?:[\w.:%-]*[\w:%-])?)?
  | (?P<kw>[A-Za-z][A-Za-z]*)
    """,
    re.VERBOSE,
)

_ESCAPES = {
    "t": "\t", "n": "\n", "r": "\r", "b": "\b", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}


def _unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            nxt = s[i + 1]
            if nxt == "u":
                out.append(chr(int(s[i + 2 : i + 6], 16)))
                i += 6
                continue
            if nxt == "U":
                out.append(chr(int(s[i + 2 : i + 10], 16)))
                i += 10
                continue
            out.append(_ESCAPES.get(nxt, nxt))
            i += 2
            continue
        out.append(c)
        i += 1
    return "".join(out)


class _Tokens:
    def __init__(self, text: str):
        self.toks: List[Tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                raise ValueError(f"TriG tokenizer stuck at: {text[pos:pos+40]!r}")
            pos = m.end()
            kind = m.lastgroup
            if kind in ("ws", "comment"):
                continue
            self.toks.append((kind or "pnamefull", m.group(0)))
        self.i = 0

    def peek(self) -> Optional[Tuple[str, str]]:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> Tuple[str, str]:
        tok = self.toks[self.i]
        self.i += 1
        return tok

    def expect(self, value: str):
        kind, v = self.next()
        if v != value:
            raise ValueError(f"expected {value!r}, got {v!r}")


class TrigParser:
    def __init__(self, text: str, base: Optional[str] = None):
        self.toks = _Tokens(text)
        self.prefixes: dict[str, str] = {}
        self.base = base
        self.quads: List[Quad] = []
        self._bnode_counter = 0
        self._graph: Optional[Term] = None
        self._depth = 0

    def fresh_bnode(self) -> Term:
        self._bnode_counter += 1
        return Term(BLANK, f"_g{self._bnode_counter}")

    def parse(self) -> List[Quad]:
        while self.toks.peek() is not None:
            self._statement()
        return self.quads

    def _statement(self):
        kind, v = self.toks.peek()  # type: ignore[misc]
        if v in ("@prefix", "@base") or (kind == "kw" and v.upper() in ("PREFIX", "BASE")):
            self._directive(v)
            return
        # TriG graph block: term '{' ... '}'  or bare '{'
        if v == "{":
            self.toks.next()
            self._graph = None
            self._triples_block()
            return
        subj = self._term()
        nxt = self.toks.peek()
        if nxt is not None and nxt[1] == "{":
            self.toks.next()
            self._graph = subj
            self._triples_block()
            self._graph = None
            return
        self._predicate_object_list(subj)
        self.toks.expect(".")

    def _triples_block(self):
        while True:
            nxt = self.toks.peek()
            if nxt is None:
                raise ValueError("unterminated graph block")
            if nxt[1] == "}":
                self.toks.next()
                return
            subj = self._term()
            self._predicate_object_list(subj)
            nxt = self.toks.peek()
            if nxt is not None and nxt[1] == ".":
                self.toks.next()

    def _directive(self, v: str):
        self.toks.next()
        if v in ("@prefix",) or v.upper() == "PREFIX":
            kind, pfx = self.toks.next()
            if not pfx.endswith(":"):
                raise ValueError(f"bad prefix decl: {pfx!r}")
            pname = pfx[:-1]
            _, iri = self.toks.next()
            self.prefixes[pname] = self._resolve_iri(iri[1:-1])
            if v == "@prefix":
                self.toks.expect(".")
        else:  # @base / BASE
            _, iri = self.toks.next()
            self.base = self._resolve_iri(iri[1:-1])
            if v == "@base":
                self.toks.expect(".")

    def _resolve_iri(self, raw: str) -> str:
        raw = _unescape(raw)
        if self.base and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", raw):
            return urljoin(self.base, raw)
        return raw

    def _predicate_object_list(self, subj: Term):
        while True:
            pred = self._predicate()
            self._object_list(subj, pred)
            nxt = self.toks.peek()
            if nxt is not None and nxt[1] == ";":
                self.toks.next()
                # allow trailing ';' before '.' or ']'
                nxt = self.toks.peek()
                if nxt is not None and nxt[1] in (".", "]", "}"):
                    return
                continue
            return

    def _predicate(self) -> Term:
        kind, v = self.toks.peek()  # type: ignore[misc]
        if v == "a":
            self.toks.next()
            return Term(IRI, RDF_TYPE)
        term = self._term()
        return term

    def _object_list(self, subj: Term, pred: Term):
        while True:
            obj = self._term()
            self._emit(subj, pred, obj)
            nxt = self.toks.peek()
            # N-Quads-style statement `s p o g .` (used by the reference's
            # tests/03 data to place triples in named graphs).
            if (
                self._depth == 0
                and self._graph is None
                and nxt is not None
                and nxt[1] not in (",", ";", ".", "]", "}")
            ):
                g = self._term()
                self.quads[-1] = Quad(subj, pred, obj, g)
                nxt = self.toks.peek()
            if nxt is not None and nxt[1] == ",":
                self.toks.next()
                continue
            return

    def _emit(self, s: Term, p: Term, o: Term):
        self.quads.append(Quad(s, p, o, self._graph))

    def _term(self) -> Term:
        kind, v = self.toks.next()
        if kind == "qopen":
            # RDF-star quoted triple << s p o >> — an opaque term whose
            # identity is the canonical serialization (model.QUOTED;
            # reference termType 'Quad', lib/Utils.ts:75-84).
            s = self._term()
            p = self._predicate()
            o = self._term()
            k2, v2 = self.toks.next()
            if k2 != "qclose":
                raise ValueError(f"expected '>>', got {v2!r}")
            return encode_quoted(s, p, o)
        if kind == "iri":
            return Term(IRI, self._resolve_iri(v[1:-1]))
        if kind == "blank":
            return Term(BLANK, v[2:])
        if kind == "string":
            if v.startswith('"""'):
                value = _unescape(v[3:-3])
            else:
                value = _unescape(v[1:-1])
            nxt = self.toks.peek()
            if nxt is not None and nxt[0] == "langtag":
                self.toks.next()
                return Term.literal(value, lang=nxt[1][1:].lower())
            if nxt is not None and nxt[1] == "^^":
                self.toks.next()
                dt = self._term()
                return Term.literal(value, datatype=dt.value)
            return Term.literal(value)
        if kind == "num":
            if re.match(r"^[+-]?\d+$", v):
                return Term.literal(v, datatype=XSD_INTEGER)
            if "e" in v.lower():
                return Term.literal(v, datatype=XSD_DOUBLE)
            return Term.literal(v, datatype=XSD_DECIMAL)
        if v == "[":
            node = self.fresh_bnode()
            nxt = self.toks.peek()
            if nxt is not None and nxt[1] == "]":
                self.toks.next()
                return node
            self._depth += 1
            self._predicate_object_list(node)
            self._depth -= 1
            self.toks.expect("]")
            return node
        if v == "(":
            return self._collection()
        if v in ("true", "false"):
            return Term.literal(v, datatype=XSD_BOOLEAN)
        if ":" in v:  # prefixed name
            pfx, _, local = v.partition(":")
            if pfx not in self.prefixes:
                raise ValueError(f"unknown prefix {pfx!r} in {v!r}")
            return Term(IRI, self.prefixes[pfx] + _unescape_pname(local))
        raise ValueError(f"unexpected token {v!r} ({kind})")

    def _collection(self) -> Term:
        items: List[Term] = []
        while True:
            nxt = self.toks.peek()
            if nxt is None:
                raise ValueError("unterminated collection")
            if nxt[1] == ")":
                self.toks.next()
                break
            items.append(self._term())
        if not items:
            return Term(IRI, RDF_NIL)
        head = self.fresh_bnode()
        cur = head
        first = Term(IRI, RDF_FIRST)
        rest = Term(IRI, RDF_REST)
        for i, item in enumerate(items):
            self._emit(cur, first, item)
            if i + 1 < len(items):
                nxt_node = self.fresh_bnode()
                self._emit(cur, rest, nxt_node)
                cur = nxt_node
            else:
                self._emit(cur, rest, Term(IRI, RDF_NIL))
        return head


def _unescape_pname(local: str) -> str:
    return re.sub(r"%([0-9A-Fa-f]{2})", lambda m: chr(int(m.group(1), 16)), local)


def parse_trig(text: str, base: Optional[str] = None) -> List[Quad]:
    """Parse a TriG/Turtle document into a list of driver-side Quads."""
    return TrigParser(text, base=base).parse()
