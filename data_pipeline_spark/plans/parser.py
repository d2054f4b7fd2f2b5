"""Parser for the LUX-style search DSL.

Grammar (the surface of storage/marklogic/ml_lexer.py:408-588 and
query_token_rules.py — tokens BOOL/LPAREN/RPAREN/COMMA/WORD/COLON/QUOTE/COMP
— re-implemented from scratch as a regex lexer + recursive descent):

    expr  := BOOL '(' expr (',' expr)* ')'          BOOL in {AND, OR, NOT}
           | 'ANDNOT' '(' expr ',' expr ')'         positive NOT negative
           | 'BOOST' '(' expr ',' expr ')'          baseline, boosted (ranking)
           | 'NEAR' '(' expr (',' expr)* [',' number] ')'   word proximity
           | ['^'] WORD '(' expr (',' expr)* ')'    relationship traversal
           | ['^'] '*'  '(' expr (',' expr)* ')'    wildcard traversal (Rel(None))
           | WORD COMP value                        leaf field comparison
    value := '"' chars '"' | number | word
    COMP  := = | != | > | >= | < | <= | ~     (~ = tokenized word match, Q4)

Relationship children are an implicit AND. `^rel` is the inverse traversal
(Q6: documents pointed TO by matches).  ANDNOT/BOOST/NEAR are the
remaining boolean tokens of the reference grammar (`ml_lexer.py:328`,
cts `andNotQuery`/`boostQuery`/`nearQuery`, cts.py:30-60,131): ANDNOT is
binary difference, BOOST keeps the baseline's membership and only
affects ranking (SearchPlanner.search_scored), NEAR takes word-query
leaves plus an optional trailing token distance (default 10, the cts
default).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<caret>\^)
      | (?P<star>\*)
      | (?P<comp>>=|<=|!=|=|>|<|~)
      | (?P<quoted>"(?:[^"\\]|\\.)*")
      | (?P<number>-?\d+(?:\.\d+)?)
      | (?P<word>[A-Za-z_][A-Za-z0-9_#]*)
    )""",
    re.VERBOSE,
)

BOOL_OPS = {"AND", "OR", "NOT"}
BINARY_OPS = {"ANDNOT", "BOOST"}
NEAR_DEFAULT_DISTANCE = 10


@dataclass
class Leaf:
    field: str
    op: str
    value: str | float | int


@dataclass
class Bool:
    op: str  # AND | OR | NOT | ANDNOT | BOOST
    children: list


@dataclass
class Near:
    children: list  # word-query leaves
    distance: int


@dataclass
class Rel:
    predicate: str | None  # None = wildcard: traverse EVERY predicate
    inverse: bool
    child: object  # AST node


def _lex(s: str) -> list[tuple[str, str]]:
    tokens = []
    pos = 0
    while pos < len(s):
        m = _TOKEN_RE.match(s, pos)
        if not m or m.end() == pos:
            if s[pos:].strip() == "":
                break
            raise ValueError(f"lex error at {pos}: {s[pos:pos + 20]!r}")
        pos = m.end()
        kind = m.lastgroup
        tokens.append((kind, m.group(kind)))
    return tokens


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self, k: int = 0):
        return self.toks[self.i + k] if self.i + k < len(self.toks) else (None, None)

    def eat(self, kind: str) -> str:
        k, v = self.peek()
        if k != kind:
            raise ValueError(f"expected {kind}, got {k}:{v!r} at token {self.i}")
        self.i += 1
        return v

    def parse_expr(self):
        kind, val = self.peek()
        if kind == "caret":
            self.eat("caret")
            if self.peek()[0] == "star":
                self.eat("star")
                return self._parse_call(None, inverse=True)
            name = self.eat("word")
            return self._parse_call(name, inverse=True)
        if kind == "star":
            # `*(expr)` — the UNAMBIGUOUS wildcard traversal: Rel(None)
            # always means every-predicate, so an edge relation with a
            # genuine predicate literally named like the planner's
            # any_predicate surface name stays filterable (pass
            # any_predicate=None and use `*`).
            self.eat("star")
            return self._parse_call(None, inverse=False)
        if kind != "word":
            raise ValueError(f"expected word, got {kind}:{val!r}")
        if val in BOOL_OPS:
            self.eat("word")
            children = self._parse_args()
            if val == "NOT" and len(children) != 1:
                raise ValueError("NOT takes exactly one argument")
            return Bool(val, children)
        if val in BINARY_OPS:
            self.eat("word")
            children = self._parse_args()
            if len(children) != 2:
                raise ValueError(f"{val} takes exactly two arguments")
            return Bool(val, children)
        if val == "NEAR":
            self.eat("word")
            children, distance = self._parse_near_args()
            if len(children) < 2:
                raise ValueError("NEAR takes at least two word queries")
            return Near(children, distance)
        nxt_kind, _ = self.peek(1)
        if nxt_kind == "lparen":
            name = self.eat("word")
            return self._parse_call(name, inverse=False)
        return self._parse_leaf()

    def _parse_call(self, name: str | None, inverse: bool):
        children = self._parse_args()
        child = children[0] if len(children) == 1 else Bool("AND", children)
        return Rel(name, inverse, child)

    def _parse_args(self) -> list:
        self.eat("lparen")
        children = [self.parse_expr()]
        while self.peek()[0] == "comma":
            self.eat("comma")
            children.append(self.parse_expr())
        self.eat("rparen")
        return children

    def _parse_near_args(self) -> tuple[list, int]:
        """NEAR's argument list: word queries, optionally ending in a bare
        number — the token distance (cts.nearQuery's second argument)."""
        self.eat("lparen")
        children = [self.parse_expr()]
        distance = NEAR_DEFAULT_DISTANCE
        while self.peek()[0] == "comma":
            self.eat("comma")
            if self.peek()[0] == "number" and self.peek(1)[0] == "rparen":
                tok = self.eat("number")
                # cts.nearQuery distances are whole token counts — reject
                # rather than silently truncate NEAR(a, b, 1.9) to 1
                if not re.fullmatch(r"\d+", tok):
                    raise ValueError(
                        f"NEAR distance must be a non-negative integer, got {tok!r}"
                    )
                distance = int(tok)
                break
            children.append(self.parse_expr())
        self.eat("rparen")
        return children, distance

    def _parse_leaf(self) -> Leaf:
        field = self.eat("word")
        op = self.eat("comp")
        kind, val = self.peek()
        if kind == "quoted":
            self.eat("quoted")
            value: str | float | int = re.sub(r"\\(.)", r"\1", val[1:-1])
        elif kind == "number":
            self.eat("number")
            value = float(val) if "." in val else int(val)
        elif kind == "word":
            value = self.eat("word")
        else:
            raise ValueError(f"expected value, got {kind}:{val!r}")
        return Leaf(field, op, value)


def parse(query: str):
    """Parse a DSL string into the AST (Leaf / Bool / Rel nodes)."""
    p = _Parser(_lex(query))
    ast = p.parse_expr()
    if p.i != len(p.toks):
        raise ValueError(f"trailing tokens at {p.i}: {p.toks[p.i:]}")
    return ast


def parse_json(clause: dict):
    """Q2 (ml_lexer.py:324-405 semantics): the same query language as JSON
    clauses. Shapes:

        {"AND": [c1, c2, ...]} / {"OR": [...]} / {"NOT": [c]}
        {"ANDNOT": [pos, neg]} / {"BOOST": [base, boost]}
        {"NEAR": [w1, w2, ...], "_distance": 3}
        {"field": value}                       -> equality leaf
        {"field": value, "_comp": ">="}        -> comparison leaf
        {"rel": {subclause}}                   -> relationship traversal
        {"^rel": {subclause}}                  -> inverse traversal
        {"*": {subclause}} / {"^*": {...}}     -> wildcard traversal (Rel(None))

    `_comp` and other `_`-prefixed keys are parameters, not clauses."""
    if not isinstance(clause, dict):
        raise TypeError(f"clause must be a dict, got {type(clause).__name__}")
    keys = [k for k in clause if not k.startswith("_")]
    if len(keys) != 1:
        raise ValueError(f"clause needs exactly one operator key, got {keys}")
    key = keys[0]
    val = clause[key]
    if key in BOOL_OPS or key in BINARY_OPS:
        children = [parse_json(c) for c in (val if isinstance(val, list) else [val])]
        if key == "NOT" and len(children) != 1:
            raise ValueError("NOT takes exactly one clause")
        if key in BINARY_OPS and len(children) != 2:
            raise ValueError(f"{key} takes exactly two clauses")
        return Bool(key, children)
    if key == "NEAR":
        children = [parse_json(c) for c in (val if isinstance(val, list) else [val])]
        if len(children) < 2:
            raise ValueError("NEAR takes at least two word queries")
        return Near(children, int(clause.get("_distance", NEAR_DEFAULT_DISTANCE)))
    if isinstance(val, dict):
        inverse = key.startswith("^")
        pred = key.lstrip("^")
        # {"*": {...}} / {"^*": {...}} — explicit wildcard traversal
        return Rel(None if pred == "*" else pred, inverse, parse_json(val))
    comp = clause.get("_comp", "=")
    return Leaf(key, comp, val)
