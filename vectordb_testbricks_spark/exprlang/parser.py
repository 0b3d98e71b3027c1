"""Lexer + recursive-descent parser for the Milvus filter-expression grammar.

Produces a small AST (plain dataclasses, engine-independent). The compiler in
``compiler.py`` lowers the AST to PySpark Columns; a DuckDB-SQL lowering could
be added symmetrically.

Grammar (verbatim forms observed in the reference — SURVEY.md §2.2):

    expr      := or_expr
    or_expr   := and_expr (("or" | "||") and_expr)*
    and_expr  := unary (("and" | "&&") unary)*
    unary     := ("not" | "!") unary | comparison
    comparison:= bit_or (cmp_tail)?
    cmp_tail  := (relop bit_or)+             # chained => conjunction (P2)
               | "like" STRING               # P6
               | ("=~" | "!~") STRING        # 3.0 regex (gated at compile)
               | ["not"] "in" list_or_operand# P4/P5
    bit_or    := bit_xor ("|" bit_xor)*      # 3.0 bitwise (gated); binds
    bit_xor   := bit_and ("^" bit_and)*      #   tighter than relops
    bit_and   := operand ("&" operand)*      #   (Go-style, not C's trap)
    operand   := literal | path_or_call | "(" expr ")"
    path_or_call := IDENT ("(" args ")")? ("[" (STRING|INT|"*") "]")*
    literal   := INT | FLOAT | STRING | RAWSTRING | BOOL | list

3.0-roadmap surface (reference feature-inventory doc §3 "regex filter
operators =~ !~", "raw string literal r\"...\"", "bitwise operators & | ^"):
parsed unconditionally — none of these forms is valid 2.6 syntax, so the
grammar extension cannot change any 2.6 expression's meaning — and the
version gate lives in the compiler (enable_v3_exprs), mirroring how
TEXT_MATCH/PHRASE_MATCH parse as plain calls but compile gated.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class ExprSyntaxError(ValueError):
    pass


# ---------------------------------------------------------------- AST nodes

@dataclass(frozen=True)
class Lit:
    value: object  # int | float | str | bool


@dataclass(frozen=True)
class ListLit:
    items: tuple


@dataclass(frozen=True)
class Star:
    """3.0 ``[*]`` element quantifier inside a path (feature-inventory
    doc §1 "$[...] 访问"): ``items[*]["val"]`` addresses EVERY element's
    ``val``; a comparison over such a path is existentially quantified
    (gated at compile time with the other v3 prototypes)."""


@dataclass(frozen=True)
class Path:
    """Column reference with optional accessors: ``j["a"][0]`` ->
    Path("j", ("a", 0)); ``items[*]`` -> Path("items", (Star(),))."""
    name: str
    accessors: tuple = ()


@dataclass(frozen=True)
class Call:
    func: str  # lower-cased function name
    args: tuple = ()


@dataclass(frozen=True)
class Cmp:
    op: str  # == != > >= < <=
    left: object
    right: object


@dataclass(frozen=True)
class In:
    operand: object
    items: object  # ListLit (or Path for pre-bound lists)
    negated: bool = False


@dataclass(frozen=True)
class Like:
    operand: object
    pattern: str


@dataclass(frozen=True)
class Regex:
    """3.0 ``field =~ "pat"`` / ``field !~ "pat"`` (unanchored match)."""
    operand: object
    pattern: str
    negated: bool = False


@dataclass(frozen=True)
class BitOp:
    """3.0 bitwise ``&``/``^``/``|`` over integer operands."""
    op: str  # "&" "^" "|"
    left: object
    right: object


@dataclass(frozen=True)
class And:
    left: object
    right: object


@dataclass(frozen=True)
class Or:
    left: object
    right: object


@dataclass(frozen=True)
class Not:
    operand: object


@dataclass(frozen=True)
class TrueLit:
    """Empty filter == full scan (validators.py:61-65)."""


# ------------------------------------------------------------------- lexer

_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<float>(?:\d+\.\d*|\.\d+)(?:[eE][+-]?\d+)?|\d+[eE][+-]?\d+)
  | (?P<int>\d+)
  | (?P<rawstring>[rR]"[^"]*"|[rR]'[^']*')
  | (?P<string>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<op>==|!=|>=|<=|&&|\|\||=~|!~|[><!()\[\],+\-&|^*])
  | (?P<ident>[A-Za-z_][A-Za-z0-9_]*)
    """,
    re.VERBOSE,
)

_KEYWORDS = {"and", "or", "not", "in", "like", "true", "false"}


@dataclass
class Token:
    kind: str  # "float" "int" "string" "op" "ident" "kw" "eof"
    text: str
    pos: int


def _unescape(s: str) -> str:
    body = s[1:-1]
    return re.sub(
        r"\\(.)",
        lambda m: {"n": "\n", "t": "\t", "r": "\r"}.get(m.group(1), m.group(1)),
        body,
    )


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    i = 0
    while i < len(src):
        m = _TOKEN_RE.match(src, i)
        if not m:
            raise ExprSyntaxError(f"unexpected character {src[i]!r} at {i} in {src!r}")
        i = m.end()
        kind = m.lastgroup
        if kind == "ws":
            continue
        text = m.group()
        if kind == "ident" and text.lower() in _KEYWORDS:
            out.append(Token("kw", text.lower(), m.start()))
        else:
            out.append(Token(kind, text, m.start()))
    out.append(Token("eof", "", len(src)))
    return out


# ------------------------------------------------------------------ parser

_RELOPS = {"==", "!=", ">", ">=", "<", "<="}


def _has_star(node) -> bool:
    """True when the operand is (or contains, through BitOp) a Path with
    a ``[*]`` quantifier."""
    if isinstance(node, Path):
        return any(isinstance(a, Star) for a in node.accessors)
    if isinstance(node, BitOp):
        return _has_star(node.left) or _has_star(node.right)
    return False


@dataclass
class _Parser:
    tokens: list[Token]
    i: int = 0
    src: str = ""

    def peek(self) -> Token:
        return self.tokens[self.i]

    def next(self) -> Token:
        t = self.tokens[self.i]
        self.i += 1
        return t

    def expect(self, kind: str, text: str | None = None) -> Token:
        t = self.next()
        if t.kind != kind or (text is not None and t.text != text):
            raise ExprSyntaxError(
                f"expected {text or kind} at {t.pos}, got {t.text!r} in {self.src!r}")
        return t

    # expr := or_expr
    def parse_expr(self):
        node = self.parse_and()
        while self.peek().kind == "kw" and self.peek().text == "or" or \
                (self.peek().kind == "op" and self.peek().text == "||"):
            self.next()
            node = Or(node, self.parse_and())
        return node

    def parse_and(self):
        node = self.parse_unary()
        while (self.peek().kind == "kw" and self.peek().text == "and") or \
                (self.peek().kind == "op" and self.peek().text == "&&"):
            self.next()
            node = And(node, self.parse_unary())
        return node

    def parse_unary(self):
        t = self.peek()
        if (t.kind == "kw" and t.text == "not") or (t.kind == "op" and t.text == "!"):
            # disambiguate "not in" handled in comparison tail; a leading
            # "not" here is a boolean negation
            self.next()
            return Not(self.parse_unary())
        return self.parse_comparison()

    def parse_comparison(self):
        left = self.parse_bit_or()
        t = self.peek()
        # chained relops: a <= x <= b  => (a <= x) and (x <= b)
        if t.kind == "op" and t.text in _RELOPS:
            parts = []
            prev = left
            while self.peek().kind == "op" and self.peek().text in _RELOPS:
                op = self.next().text
                right = self.parse_bit_or()
                parts.append(Cmp(op, prev, right))
                prev = right
            if len(parts) > 1 and any(
                    _has_star(p.left) or _has_star(p.right) for p in parts):
                # the desugar is exact for scalars but would quantify
                # each conjunct with an INDEPENDENT element — `0 <
                # nums[*] < 5` would match a row with [-1, 10] although
                # no element lies in the range. Reject rather than
                # silently change meaning.
                raise ExprSyntaxError(
                    "combined ranges over a [*] path are unsupported "
                    f"(each bound would quantify independently) in "
                    f"{self.src!r}")
            node = parts[0]
            for p in parts[1:]:
                node = And(node, p)
            return node
        if t.kind == "op" and t.text in ("=~", "!~"):
            self.next()
            return Regex(left, self.expect_stringish(),
                         negated=t.text == "!~")
        if t.kind == "kw" and t.text == "like":
            self.next()
            return Like(left, self.expect_stringish())
        if t.kind == "kw" and t.text == "not":
            # "x not in [...]"
            nxt = self.tokens[self.i + 1]
            if nxt.kind == "kw" and nxt.text == "in":
                self.next()
                self.next()
                return In(left, self.parse_operand(), negated=True)
            raise ExprSyntaxError(f"unexpected 'not' at {t.pos} in {self.src!r}")
        if t.kind == "kw" and t.text == "in":
            self.next()
            return In(left, self.parse_operand())
        return left

    def parse_bit_or(self):
        node = self.parse_bit_xor()
        while self.peek().kind == "op" and self.peek().text == "|":
            self.next()
            node = BitOp("|", node, self.parse_bit_xor())
        return node

    def parse_bit_xor(self):
        node = self.parse_bit_and()
        while self.peek().kind == "op" and self.peek().text == "^":
            self.next()
            node = BitOp("^", node, self.parse_bit_and())
        return node

    def parse_bit_and(self):
        node = self.parse_operand()
        while self.peek().kind == "op" and self.peek().text == "&":
            self.next()
            node = BitOp("&", node, self.parse_operand())
        return node

    def expect_stringish(self) -> str:
        """A quoted pattern/value: escaped STRING or 3.0 RAWSTRING (body
        taken verbatim — what r'...' exists for: regex patterns)."""
        t = self.next()
        if t.kind == "string":
            return _unescape(t.text)
        if t.kind == "rawstring":
            return t.text[2:-1]
        raise ExprSyntaxError(
            f"expected string at {t.pos}, got {t.text!r} in {self.src!r}")

    def parse_operand(self):
        t = self.peek()
        if t.kind in ("int", "float"):
            self.next()
            # unary minus is folded at literal level below
            return Lit(int(t.text) if t.kind == "int" else float(t.text))
        if t.kind == "op" and t.text == "-":
            self.next()
            n = self.expect_number()
            return Lit(-n)
        if t.kind == "op" and t.text == "+":
            self.next()
            return Lit(self.expect_number())
        if t.kind == "string":
            self.next()
            return Lit(_unescape(t.text))
        if t.kind == "rawstring":
            self.next()
            return Lit(t.text[2:-1])
        if t.kind == "kw" and t.text in ("true", "false"):
            self.next()
            return Lit(t.text == "true")
        if t.kind == "op" and t.text == "[":
            return self.parse_list()
        if t.kind == "op" and t.text == "(":
            self.next()
            node = self.parse_expr()
            self.expect("op", ")")
            return node
        if t.kind == "ident":
            return self.parse_path_or_call()
        raise ExprSyntaxError(f"unexpected token {t.text!r} at {t.pos} in {self.src!r}")

    def expect_number(self):
        t = self.next()
        if t.kind == "int":
            return int(t.text)
        if t.kind == "float":
            return float(t.text)
        raise ExprSyntaxError(f"expected number at {t.pos} in {self.src!r}")

    def parse_list(self) -> ListLit:
        self.expect("op", "[")
        items = []
        if not (self.peek().kind == "op" and self.peek().text == "]"):
            while True:
                node = self.parse_operand()
                if not isinstance(node, Lit):
                    raise ExprSyntaxError("list literals may contain only scalars")
                items.append(node.value)
                if self.peek().kind == "op" and self.peek().text == ",":
                    self.next()
                    continue
                break
        self.expect("op", "]")
        return ListLit(tuple(items))

    def parse_path_or_call(self):
        name = self.expect("ident").text
        if self.peek().kind == "op" and self.peek().text == "(":
            self.next()
            args = []
            if not (self.peek().kind == "op" and self.peek().text == ")"):
                while True:
                    args.append(self.parse_operand())
                    if self.peek().kind == "op" and self.peek().text == ",":
                        self.next()
                        continue
                    break
            self.expect("op", ")")
            return Call(name.lower(), tuple(args))
        accessors = []
        while self.peek().kind == "op" and self.peek().text == "[":
            self.next()
            t = self.next()
            if t.kind == "string":
                accessors.append(_unescape(t.text))
            elif t.kind == "int":
                accessors.append(int(t.text))
            elif t.kind == "op" and t.text == "*":
                accessors.append(Star())
            else:
                raise ExprSyntaxError(
                    f"bad accessor {t.text!r} at {t.pos} in {self.src!r}")
            self.expect("op", "]")
        return Path(name, tuple(accessors))


def parse(src: str):
    """Parse a Milvus filter expression into an AST. Empty => TrueLit."""
    if src is None or src.strip() == "":
        return TrueLit()
    p = _Parser(tokenize(src), src=src)
    node = p.parse_expr()
    if p.peek().kind != "eof":
        t = p.peek()
        raise ExprSyntaxError(f"trailing input at {t.pos}: {t.text!r} in {src!r}")
    return node
