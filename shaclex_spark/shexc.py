"""ShExC (compact syntax) parser for the flat fragment.

Covers the subset the reference's own SLang algebra interprets
(SURVEY.md §2.3–2.4): prefix decls, shape declarations with optional
node-kind keyword / CLOSED / EXTRA, EachOf of triple constraints with
predicate (or inverse ^predicate), value expressions (datatype IRI,
@shape refs, value sets, node kinds, '.', AND/OR/NOT), and
cardinalities (?, +, *, {m}, {m,n}, {m,}). Grammar exercised against
/root/reference/examples/clingo/paper.shex and examples/shex/*.shex.

Semantics follow the reference's ShEx→SLang compilation:
- TripleConstraint = two-count (exclusive) semantics
  (ShEx2SLang.scala:103-113) → PropertyConstraint(exclusive=True)
- EachOf closes the shape over its mentioned predicates
  (ShEx2SLang.scala:95-101) unless EXTRA lists exceptions
- default cardinality {1,1}; '?'={0,1}, '+'={1,*}, '*'={0,*}

Also parses the compact shape-map trigger format
(doc/grammars/shapeMapGrammar.bnf:19-31): `node@shape`,
`{FOCUS p _}@shape`, `{_ p FOCUS}@shape`.
"""

from __future__ import annotations

import re

from .model import RDF_TYPE
from .shapes import SchemaDict

_TOKEN_RE = re.compile(
    r"""
    (?P<comment>\#[^\n]*)
  | (?P<iri><[^>]*>)
  | (?P<string>"(?:[^"\\]|\\.)*"(?:@[A-Za-z0-9-]+|\^\^(?:<[^>]*>|[A-Za-z_][\w.-]*:[\w.-]*))?)
  | (?P<card>[?*+])
  | (?P<repeat>\{\s*\d+\s*(?:,\s*(?:\d+|\*)?\s*)?\})
  | (?P<pname>\^?[A-Za-z_][\w.-]*:(?![-.])[\w.-]*|\^?:(?![-.])[\w.-]+|:)
  | (?P<keyword>[A-Za-z]+)
  | (?P<punct>[{}();@\[\].,^|])
""", re.VERBOSE)

# IRIREF body per the ShExC/Turtle grammar: any char except controls,
# space and <>"{}|^`\  — backslash only as a well-formed UCHAR
# (\uHHHH / \UHHHHHHHH). Rejects ECHAR escapes (\n), PN_LOCAL_ESC
# (\/), raw spaces and malformed UCHARs (negativeSyntax corpus:
# IRIREF-with-* cases).
_IRI_BODY_RE = re.compile(
    r"(?:[^\x00-\x20<>\"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*\Z")


class ShExCError(ValueError):
    pass


def _tokenize(text: str) -> list[str]:
    out = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        between = text[pos:m.start()].strip()
        if between:
            raise ShExCError(f"unexpected input: {between!r}")
        pos = m.end()
        if m.lastgroup == "comment":
            continue
        if m.lastgroup == "iri" and not _IRI_BODY_RE.match(m.group(0)[1:-1]):
            raise ShExCError(f"malformed IRIREF: {m.group(0)!r}")
        out.append(m.group(0))
    rest = text[pos:].strip()
    if rest:
        raise ShExCError(f"unexpected trailing input: {rest!r}")
    return out


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0
        self.prefixes: dict[str, str] = {}

    # -- token utils -----------------------------------------------------
    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            raise ShExCError("unexpected end of input")
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, tok: str) -> None:
        got = self.next()
        if got.lower() != tok.lower():
            raise ShExCError(f"expected {tok!r}, got {got!r}")

    # -- IRI resolution ---------------------------------------------------
    def resolve(self, tok: str) -> str:
        if tok.startswith("<") and tok.endswith(">"):
            return tok[1:-1]
        if tok == "a":
            return RDF_TYPE
        if ":" in tok:
            pfx, local = tok.split(":", 1)
            if pfx not in self.prefixes:
                raise ShExCError(f"undefined prefix {pfx!r} in {tok!r}")
            return self.prefixes[pfx] + local
        raise ShExCError(f"not an IRI token: {tok!r}")

    def is_iri_token(self, tok: str | None) -> bool:
        if tok is None:
            return False
        return (tok.startswith("<") or tok == "a"
                or bool(re.fullmatch(r"[A-Za-z_][\w.-]*:[\w.-]*|:[\w.-]+", tok)))

    # -- grammar ----------------------------------------------------------
    def parse_schema(self) -> list[dict]:
        shapes = []
        while self.peek() is not None:
            tok = self.peek()
            if tok.lower() in ("prefix", "base"):
                self.next()
                if tok.lower() == "base":
                    self.next()  # ignore base IRI
                    continue
                pname = self.next()
                if not pname.endswith(":"):
                    raise ShExCError(f"bad prefix decl: {pname!r}")
                iri = self.next()
                self.prefixes[pname[:-1]] = iri[1:-1]
                continue
            shapes.append(self.parse_shape_decl())
        return shapes

    def parse_shape_decl(self) -> dict:
        label_tok = self.next()
        if label_tok == "a":
            # 'a' is the rdf:type predicate keyword, never a shape name
            # (negativeSyntax: shapename-a)
            raise ShExCError("'a' cannot name a shape")
        label = (label_tok[1:-1] if label_tok.startswith("<")
                 else self.resolve(label_tok))
        spec: dict = {"label": label, "constraints": []}
        node_constraints: list[dict] = []
        closed = True  # EachOf closes over mentioned preds (SLang semantics)
        extra: list[str] = []
        while True:
            tok = self.peek()
            if tok is None:
                raise ShExCError(f"shape {label}: missing body")
            low = tok.lower()
            if low in ("iri", "bnode", "literal", "nonliteral"):
                self.next()
                node_constraints.append(self._kind_expr(low))
            elif low == "closed":
                self.next()
                closed = True
            elif low == "extra":
                self.next()
                while self.is_iri_token(self.peek()) and self.peek() != "{":
                    extra.append(self.resolve(self.next()))
            elif tok == "{":
                break
            else:
                raise ShExCError(f"shape {label}: unexpected {tok!r}")
        self.expect("{")
        groups: list[list[dict]] = [[]]
        one_of_inline: list[list[list[dict]]] = []
        group_blocks: list[dict] = []
        while self.peek() != "}":
            if self.peek() == "(":
                # inline group: ( tc... | tc... ) or ( tc...; tc... ){m,n}
                self.next()
                inner: list[list[dict]] = [[]]
                while self.peek() != ")":
                    inner[-1].append(self.parse_triple_constraint())
                    if self.peek() == ";":
                        self.next()
                    elif self.peek() == "|":
                        self.next()
                        inner.append([])
                    elif self.peek() != ")":
                        raise ShExCError(
                            f"expected ';', '|' or ')' after triple "
                            f"constraint, got {self.peek()!r}")
                self.expect(")")
                gmin, gmax = self.parse_cardinality()
                if (gmin, gmax) != (1, 1):
                    # group cardinality → shapes.GroupBlock semantics
                    if len(inner) == 1:
                        kind, members = "eachOf", inner[0]
                    elif all(len(alt) == 1 for alt in inner):
                        kind, members = "oneOf", [alt[0] for alt in inner]
                    else:
                        raise ShExCError(
                            "mixed ;/| group with cardinality unsupported")
                    group_blocks.append({
                        "kind": kind, "minCount": gmin, "maxCount": gmax,
                        "members": members})
                    if self.peek() == ";":
                        self.next()
                    continue
                one_of_inline.append(inner)
            else:
                tc = self.parse_triple_constraint()
                groups[-1].append(tc)
            if self.peek() == ";":
                self.next()
            elif self.peek() == "|":   # top-level OneOf group separator
                self.next()
                groups.append([])
            elif self.peek() != "}":
                # adjacency without a separator is a syntax error
                # (negativeSyntax: group-no-COMMA-separators)
                raise ShExCError(
                    f"expected ';', '|' or '}}' after triple constraint, "
                    f"got {self.peek()!r}")
        self.expect("}")
        if len(groups) > 1:
            spec["oneOf"] = groups
        else:
            spec["constraints"] = groups[0]
        if one_of_inline:
            # each inline group contributes one exclusive-choice block
            spec.setdefault("oneOf", [])
            for inner in one_of_inline:
                if spec["oneOf"]:
                    # engine supports ONE oneOf block per shape: merge
                    # by cross-combining would explode; keep first,
                    # reject extras explicitly
                    raise ShExCError(
                        f"shape {label}: multiple OneOf blocks unsupported")
                spec["oneOf"] = inner
        if group_blocks:
            spec["groupBlocks"] = group_blocks
        if node_constraints:
            spec["nodeConstraints"] = node_constraints
        spec["closed"] = closed
        spec["extra"] = extra
        return spec

    @staticmethod
    def _kind_expr(low: str) -> dict:
        mapping = {"iri": "IRI", "bnode": "BlankNode", "literal": "Literal",
                   "nonliteral": "BlankNodeOrIRI"}
        return {"kind": "nodeKind", "value": mapping[low]}

    def parse_triple_constraint(self) -> dict:
        tok = self.next()
        inverse = False
        if tok == "^":
            inverse = True
            tok = self.next()
        elif tok.startswith("^"):
            inverse = True
            tok = tok[1:]
        pred = self.resolve(tok)
        node = self.parse_value_expr()
        min_c, max_c = self.parse_cardinality()
        path = {"kind": "inverse", "iri": pred} if inverse else pred
        return {"path": path, "minCount": min_c, "maxCount": max_c,
                "node": node, "exclusive": True}

    def parse_value_expr(self) -> dict:
        left = self.parse_value_atom()
        while self.peek() is not None and self.peek().lower() in ("and", "or"):
            op = self.next().lower()
            right = self.parse_value_atom()
            left = {"kind": op, "exprs": [left, right]}
        return left

    def parse_value_atom(self) -> dict:
        tok = self.peek()
        if tok is None:
            raise ShExCError("expected value expression")
        low = tok.lower()
        if tok == ".":
            self.next()
            return {"kind": "true"}
        if low == "not":
            self.next()
            return {"kind": "not", "expr": self.parse_value_atom()}
        if low in ("iri", "bnode", "literal", "nonliteral"):
            self.next()
            return self._kind_expr(low)
        if tok == "@":
            self.next()
            ref_tok = self.next()
            ref = (ref_tok[1:-1] if ref_tok.startswith("<")
                   else self.resolve(ref_tok))
            return {"kind": "ref", "label": ref}
        if tok == "[":
            self.next()
            values = []
            while self.peek() != "]":
                values.append(self.parse_value_set_member())
            self.expect("]")
            return {"kind": "in", "values": values}
        if tok == "a":
            # 'a' is only the rdf:type PREDICATE keyword; as a value
            # expression a bare 'a' is invalid (negativeSyntax:
            # 1dotAnnot_AIRIREF)
            raise ShExCError("'a' is not a value expression")
        if self.is_iri_token(tok):
            self.next()
            return {"kind": "datatype", "iri": self.resolve(tok)}
        raise ShExCError(f"unexpected value expression token {tok!r}")

    def parse_value_set_member(self) -> dict:
        tok = self.next()
        if tok.startswith('"'):
            m = re.fullmatch(
                r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^(.+))?', tok)
            value = m.group(1).replace('\\"', '"').replace("\\\\", "\\")
            out: dict = {"kind": "literal", "value": value}
            if m.group(2):
                out["lang"] = m.group(2)
            elif m.group(3):
                dt = m.group(3)
                out["dt"] = dt[1:-1] if dt.startswith("<") else self.resolve(dt)
            return out
        return {"kind": "iri", "value": self.resolve(tok)}

    def parse_cardinality(self) -> tuple[int, int | None]:
        tok = self.peek()
        if tok == "?":
            self.next()
            return 0, 1
        if tok == "+":
            self.next()
            return 1, None
        if tok == "*":
            self.next()
            return 0, None
        if tok is not None and tok.startswith("{") and tok != "{":
            self.next()
            m = re.fullmatch(r"\{\s*(\d+)\s*(?:,\s*(\d+|\*)?\s*)?\}", tok)
            if not m:
                raise ShExCError(f"bad cardinality {tok!r}")
            mn = int(m.group(1))
            if m.group(2) is None and "," not in tok:
                return mn, mn           # {m}
            if m.group(2) in (None, "*"):
                return mn, None         # {m,} / {m,*}
            return mn, int(m.group(2))  # {m,n}
        return 1, 1  # ShEx default: exactly one


def parse_shexc(text: str) -> SchemaDict:
    parser = _Parser(_tokenize(text))
    specs = parser.parse_schema()
    return SchemaDict.from_json(specs), parser.prefixes


def parse_shape_map(text: str, prefixes: dict[str, str]) -> list[dict]:
    """Compact shape map → trigger associations (triggers.shape_map_focus
    input). Supports `<n>@<S>`, `pfx:n@<S>`, `{FOCUS p _}@S`,
    `{_ p FOCUS}@S`."""

    def resolve(tok: str) -> str:
        tok = tok.strip()
        if tok.startswith("<"):
            return tok[1:-1]
        pfx, local = tok.split(":", 1)
        return prefixes[pfx] + local

    out = []
    for part in re.split(r",(?![^{]*\})", text):
        part = part.strip()
        if not part:
            continue
        m = re.fullmatch(r"\{\s*(FOCUS|_)\s+(\S+)\s+(FOCUS|_)\s*\}@(\S+)", part)
        if m:
            pred = resolve(m.group(2))
            shape = (m.group(4)[1:-1] if m.group(4).startswith("<")
                     else resolve(m.group(4)))
            if m.group(1) == "FOCUS":
                out.append({"focusSubjectsOf": pred, "shape": shape})
            else:
                out.append({"focusObjectsOf": pred, "shape": shape})
            continue
        m = re.fullmatch(r"(\S+)@(\S+)", part)
        if not m:
            raise ShExCError(f"bad shape-map association: {part!r}")
        node = resolve(m.group(1))
        shape = (m.group(2)[1:-1] if m.group(2).startswith("<")
                 else resolve(m.group(2)))
        out.append({"node": node, "shape": shape})
    return out
