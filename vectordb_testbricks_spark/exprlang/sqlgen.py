"""DuckDB-SQL emitter for the Milvus filter-expression AST.

The differential-testing twin of :mod:`compiler`: the same parsed AST
lowers to a DuckDB boolean expression, so ANY expression the engine
accepts can be cross-checked against an independent SQL engine on the
same data — not just the hand-curated oracle strings in the driver
registry. Randomized differential coverage lives in
tests/test_expr_differential.py.

Scope: the scalar/array core (comparisons, combined ranges, and/or/not,
in / not-in, Milvus LIKE, ARRAY_CONTAINS / _ANY / _ALL, array_length,
array element access, starts_with, bool equality, empty filter) plus the
dynamic-field path (an undeclared name resolves to the ``_dynamic``
map<string,string> with literal-driven TRY_CAST — mirror of
compiler._dynamic_path) plus the gated 3.0 operator prototypes
(``=~``/``!~`` → regexp_matches, bitwise ``&``/``^``/``|`` →
``&``/xor()/``|`` — DuckDB's ``^`` is POWER; ``[*]`` quantified
comparisons → Kleene-exists CASE over list_filter; TEXT_MATCH →
list_has_any over the documented tokenizer twin). Geo and PHRASE_MATCH
keep their curated/Python oracles — their SQL encodings are
engine-shaped enough that a generic emitter would just re-implement the
curated strings.

Semantics parity notes (each mirrors a compiler.py decision):
  * Milvus LIKE knows only ``%``; ``_``/``\\`` are literals. The emitted
    pattern routes through the same :func:`milvus_like_pattern` escaping
    and pins ``ESCAPE '\\'`` (DuckDB has no default escape char).
  * Array element access is 0-based in Milvus/Spark (try_element_at),
    1-based in DuckDB lists — the emitter shifts the index; both sides
    evaluate NULL out of bounds.
  * Dynamic values are strings; a comparison against a numeric literal
    TRY_CASTs the extracted value to DOUBLE (bool → BOOLEAN), exactly
    the compiler's ``_cast_for`` discipline. DuckDB map access returns a
    list, so the value is ``map_extract(m, 'k')[1]`` (NULL when absent).
  * ``==`` → ``=``, ``!=`` → ``<>``; three-valued NULL logic then agrees
    between Spark filters and SQL WHERE by construction.
"""

from __future__ import annotations

from vectordb_testbricks_spark.exprlang import parser as ast
from vectordb_testbricks_spark.exprlang.compiler import (
    _cast_for, milvus_like_pattern)

DYNAMIC_SQL_COL = '"_dynamic"'


class SqlGenError(ValueError):
    """Expression uses a surface outside the emitter's scope."""


def _lit(v) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (int, float)):
        return repr(v)
    raise SqlGenError(f"unsupported literal {v!r}")


def _ident(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _list_sql(node) -> str:
    """A ListLit as a DuckDB list value (for list_has_any/_all)."""
    if not isinstance(node, ast.ListLit):
        raise SqlGenError(f"expected list literal, got {node!r}")
    return "[" + ", ".join(_lit(v) for v in node.items) + "]"


_CMP = {"==": "=", "!=": "<>", ">": ">", ">=": ">=", "<": "<", "<=": "<="}

_SQL_CAST = {"double": "DOUBLE", "boolean": "BOOLEAN"}


class _Emitter:
    def __init__(self, columns: set[str] | None,
                 json_columns: set[str] | None,
                 analyzers: dict | None = None,
                 struct_array_columns: set[str] | None = None):
        self.columns = columns
        self.json_columns = json_columns or set()
        self.analyzers = analyzers or {}
        self.struct_array_columns = struct_array_columns or set()
        self.calls = {
            "array_contains": lambda a: (
                f"list_contains({self.operand(a[0])}, "
                f"{self.operand(a[1])})"),
            "array_contains_any": lambda a: (
                f"list_has_any({self.operand(a[0])}, {_list_sql(a[1])})"),
            "array_contains_all": lambda a: (
                f"list_has_all({self.operand(a[0])}, {_list_sql(a[1])})"),
            "array_length": lambda a: f"len({self.operand(a[0])})",
            "starts_with": lambda a: (
                f"starts_with({self.operand(a[0])}, "
                f"{self.operand(a[1])})"),
            "text_match": self._text_match_sql,
            "phrase_match": self._phrase_match_sql,
        }

    def _text_match_sql(self, args) -> str:
        """DuckDB twin of compiler.text_match (the inline-tokenize
        branch): analyze the query literal driver-side with the field's
        analyzer (functions.text.py_tokenize — the same code the Spark
        side uses), tokenize the field with the documented DuckDB twin
        of functions.text.tokenize, and test any-overlap. NULL field →
        NULL on both engines (split/list_filter/list_has_any all
        propagate); empty analyzed query → constant FALSE, mirroring
        the compiler."""
        from vectordb_testbricks_spark.functions.text import py_tokenize
        field, querylit = args[0], args[1]
        if not isinstance(querylit, ast.Lit) or not isinstance(
                querylit.value, str):
            raise SqlGenError("TEXT_MATCH query must be a string literal")
        toks, kw = self._analyzed_field(field, "TEXT_MATCH")
        terms = py_tokenize(querylit.value, **kw)
        if not terms:
            return "FALSE"
        terms_sql = "[" + ", ".join(_lit(t) for t in terms) + "]"
        return f"list_has_any({toks}, {terms_sql})"

    def _analyzed_field(self, field, caller: str):
        """(tokens_sql, analyzer_kwargs) for a TEXT_MATCH/PHRASE_MATCH
        field argument — shared validation + the tokenizer's documented
        DuckDB twin."""
        from vectordb_testbricks_spark.functions.text import (
            TOKEN_SPLIT_RE, TOKEN_SPLIT_RE_CASED, analyzer_kwargs)
        if not isinstance(field, ast.Path) or field.accessors:
            raise SqlGenError(f"{caller} needs a plain field name")
        if self.is_dynamic(field):
            raise SqlGenError(
                f"{caller} over dynamic fields keeps curated oracles")
        kw = analyzer_kwargs(self.analyzers.get(field.name))
        if kw["lowercase"]:
            base, split_re = f"lower({_ident(field.name)})", TOKEN_SPLIT_RE
        else:
            base, split_re = _ident(field.name), TOKEN_SPLIT_RE_CASED
        if kw.get("dict_words"):
            # dict/CJK tokenizer twin: the SAME ordered-alternation FMM
            # pattern (one source of truth, functions.text.fmm_pattern);
            # RE2's leftmost-first alternation matches java.util.regex
            # here (differentially tested)
            from vectordb_testbricks_spark.functions.text import (
                fmm_pattern)
            pat = fmm_pattern(kw["dict_words"], kw["lowercase"])
            toks = f"regexp_extract_all({base}, {_lit(pat)})"
        else:
            toks = (f"list_filter(string_split_regex({base}, "
                    f"{_lit(split_re)}), _t -> _t != '')")
        if kw["stop_words"]:
            sw = ", ".join(_lit(w) for w in kw["stop_words"])
            toks = f"list_filter({toks}, _t -> _t NOT IN ({sw}))"
        if kw.get("synonyms"):
            # CASE arms in group order = first-match, mirroring the
            # Python twin's break and the Spark chain's reversed nesting
            arms = " ".join(
                f"WHEN _t IN ({', '.join(_lit(m) for m in g)}) THEN "
                f"[{', '.join(_lit(m) for m in g)}]"
                for g in kw["synonyms"])
            toks = (f"flatten(list_transform({toks}, _t -> "
                    f"CASE {arms} ELSE [_t] END))")
        if kw.get("ngram"):
            a, b = kw["ngram"]
            toks = (
                f"flatten(list_transform({toks}, _w -> "
                f"flatten(list_transform(range({a}, {b + 1}), _n -> "
                f"CASE WHEN length(_w) >= _n THEN "
                f"list_transform(range(0, length(_w) - _n + 1), "
                f"_i -> substring(_w, _i + 1, _n)) "
                f"ELSE CAST([] AS VARCHAR[]) END))))")
        return toks, kw

    def _phrase_match_sql(self, args) -> str:
        """DuckDB twin of compiler.phrase_match: in-order bounded-gap
        sloppy phrase (positions p1 < ... < pm, term_j at p_j, span
        pm − p1 ≤ (m−1) + slop) as the same nested-exists chain the
        compiler unrolls — slop=0 degenerates to exact adjacency.
        Positions are 1-based on both engines (DuckDB list indexing is
        1-based natively); NULL fields propagate to NULL throughout."""
        from vectordb_testbricks_spark.functions.text import py_tokenize
        field, querylit = args[0], args[1]
        slop = 0
        if len(args) > 2:
            # mirror the compiler's validation exactly: the parser folds
            # unary minus into the literal, and a negative slop must be
            # the same loud error on both lowerings, not a silently
            # stricter-than-adjacency bound here
            if (not isinstance(args[2], ast.Lit)
                    or not isinstance(args[2].value, int)
                    or args[2].value < 0):
                raise SqlGenError(
                    "phrase_match slop must be a non-negative int literal")
            slop = args[2].value
        if not isinstance(querylit, ast.Lit) or not isinstance(
                querylit.value, str):
            raise SqlGenError("PHRASE_MATCH query must be a string literal")
        toks, kw = self._analyzed_field(field, "PHRASE_MATCH")
        terms = py_tokenize(querylit.value, **kw)
        if not terms:
            return "FALSE"
        m = len(terms)

        def positions(j):
            return (f"list_filter(range(1, len({toks}) + 1), "
                    f"_p -> {toks}[_p] = {_lit(terms[j])})")

        if m == 1:
            return f"(len({positions(0)}) > 0)"

        def chain(j):
            # _p{j} must follow _p{j-1} and keep the running span from
            # _p0 within the prefix budget — compiler.chain's bounds
            bound = (m - 1 + slop) if j == m - 1 else (j + slop)
            pred = f"_p{j} > _p{j - 1} AND _p{j} - _p0 <= {bound}"
            if j < m - 1:
                pred += f" AND {chain(j + 1)}"
            return (f"len(list_filter({positions(j)}, "
                    f"_p{j} -> {pred})) > 0")

        return (f"(len({toks}) >= {m} AND "
                f"len(list_filter({positions(0)}, _p0 -> {chain(1)})) > 0)")

    def is_dynamic(self, node) -> bool:
        return (isinstance(node, ast.Path) and self.columns is not None
                and node.name not in self.columns)

    def is_jsonish(self, node) -> bool:
        """Operands whose SQL value is an extracted JSON/dynamic string —
        the ones the literal-driven TRY_CAST discipline applies to
        (compiler operand kind 'json')."""
        return self.is_dynamic(node) or (
            isinstance(node, ast.Path) and bool(node.accessors)
            and node.name in self.json_columns)

    @staticmethod
    def _json_path(accessors) -> str:
        return "$" + "".join(
            f"[{a}]" if isinstance(a, int) else f".{a}" for a in accessors)

    def path(self, node: ast.Path) -> str:
        if any(isinstance(a, ast.Star) for a in node.accessors):
            # comparisons lower through _star_cmp; any other position
            # (IN, LIKE, calls) has no exists-shaped rewrite here
            raise SqlGenError(
                "[*] outside a comparison keeps curated/Python oracles")
        if self.is_dynamic(node):
            if node.accessors:
                raise SqlGenError(
                    "JSON inside dynamic values keeps curated oracles")
            return (f"map_extract({DYNAMIC_SQL_COL}, "
                    f"{_lit(node.name)})[1]")
        if node.accessors and node.name in self.json_columns:
            # JSON-string column: the SQL twin of get_json_object —
            # json_extract_string matches its NULL-on-missing and
            # unquoted-scalar semantics
            return (f"json_extract_string({_ident(node.name)}, "
                    f"{_lit(self._json_path(node.accessors))})")
        sql = _ident(node.name)
        for a in node.accessors:
            if not isinstance(a, int):
                raise SqlGenError(
                    f"non-integer accessor {a!r} (JSON paths keep "
                    "curated oracles)")
            sql = f"{sql}[{a + 1}]"   # DuckDB lists are 1-based
        return sql

    def operand(self, node) -> str:
        if isinstance(node, ast.Lit):
            return _lit(node.value)
        if isinstance(node, ast.Path):
            return self.path(node)
        if isinstance(node, ast.ListLit):
            return "(" + ", ".join(_lit(v) for v in node.items) + ")"
        if isinstance(node, ast.Call) and node.func in self.calls:
            # value-typed calls (array_length) as comparison operands
            return self.calls[node.func](node.args)
        if isinstance(node, ast.BitOp):
            l, r = self.operand(node.left), self.operand(node.right)
            # DuckDB's `^` is POWER; its bitwise xor is the xor() function
            if node.op == "^":
                return f"xor({l}, {r})"
            return f"({l} {node.op} {r})"
        raise SqlGenError(f"unsupported operand {node!r}")

    def _dyn_cast(self, sql: str, other_lit) -> str:
        """Literal-driven TRY_CAST for a dynamic (string) value — the SQL
        twin of compiler._cast_for + try_cast."""
        cast = _cast_for(other_lit.value)
        if cast:
            return f"TRY_CAST({sql} AS {_SQL_CAST[cast]})"
        return sql

    @staticmethod
    def _star_split(node):
        """(accessors before [*], accessors after) for a star path, else
        None — the emitter-side mirror of compiler._star_split."""
        if not isinstance(node, ast.Path):
            return None
        stars = [i for i, a in enumerate(node.accessors)
                 if isinstance(a, ast.Star)]
        if not stars:
            return None
        if len(stars) > 1:
            raise SqlGenError("only one [*] per path is supported")
        i = stars[0]
        return node.accessors[:i], node.accessors[i + 1:]

    def _star_cmp(self, node: ast.Cmp) -> str | None:
        """DuckDB twin of the compiler's [*] quantified comparison
        (F.exists over the array) — Kleene-exists semantics spelled out:
        NULL array → NULL; any element satisfying the predicate → TRUE;
        else any NULL element-predicate → NULL; else FALSE. `len(
        list_filter(..)) > 0` alone would collapse the NULL cases to
        FALSE, which diverges under NOT."""
        ls, rs = self._star_split(node.left), self._star_split(node.right)
        if ls is None and rs is None:
            return None
        if ls is not None and rs is not None:
            raise SqlGenError("[*] on both sides keeps curated oracles")
        flip = ls is None
        path_node = node.right if flip else node.left
        other_node = node.left if flip else node.right
        pre, post = rs if flip else ls
        if self.is_dynamic(path_node) or path_node.name in self.json_columns:
            raise SqlGenError(
                "[*] over JSON/dynamic paths keeps curated oracles")
        if not isinstance(other_node, ast.Lit):
            raise SqlGenError(
                "[*] comparisons with non-literal operands keep curated "
                "oracles")
        # The emitter has no element-type information, so it lowers
        # exactly the shapes it can emit correctly: ``col[*]`` over a
        # scalar array, and ``col[*]["field"]`` when the caller declared
        # the column a struct-array (a string accessor on a map or
        # JSON-string element would need getItem / TRY_CAST semantics
        # the SQL here does not mirror). Everything else keeps curated
        # oracles — the compiler is deliberately wider.
        if pre:
            raise SqlGenError(
                "[*] with pre-star accessors keeps curated oracles")
        base = self.path(ast.Path(path_node.name, ()))
        elem = "_e"
        for a in post:
            if (isinstance(a, str)
                    and path_node.name in self.struct_array_columns):
                elem = f"{elem}.{_ident(a)}"
            else:
                raise SqlGenError(
                    f"accessor {a!r} under [*] keeps curated oracles "
                    "(declare the column in struct_array_columns for "
                    "struct-field access)")
        lit = _lit(other_node.value)
        l, r = (lit, elem) if flip else (elem, lit)
        pred = f"({l} {_CMP[node.op]} {r})"
        return (f"(CASE WHEN {base} IS NULL THEN NULL"
                f" WHEN len(list_filter({base}, _e -> {pred})) > 0"
                f" THEN TRUE"
                f" WHEN len(list_filter({base}, _e -> {pred} IS NULL)) > 0"
                f" THEN NULL ELSE FALSE END)")

    def cmp(self, node: ast.Cmp) -> str:
        star = self._star_cmp(node)
        if star is not None:
            return star
        lsql, rsql = self.operand(node.left), self.operand(node.right)
        if self.is_jsonish(node.left) and isinstance(node.right, ast.Lit):
            lsql = self._dyn_cast(lsql, node.right)
        if self.is_jsonish(node.right) and isinstance(node.left, ast.Lit):
            rsql = self._dyn_cast(rsql, node.left)
        return f"({lsql} {_CMP[node.op]} {rsql})"

    def in_(self, node: ast.In) -> str:
        # `x in []` is valid expr-lang; Spark's isin([]) is constant
        # false (true for `not in`), but `x IN ()` is a DuckDB syntax
        # error — emit the constant to keep the differential twin total.
        if isinstance(node.items, ast.ListLit) and not node.items.items:
            return "TRUE" if node.negated else "FALSE"
        osql = self.operand(node.operand)
        if self.is_jsonish(node.operand) and isinstance(
                node.items, ast.ListLit) and node.items.items:
            osql = self._dyn_cast(osql, ast.Lit(node.items.items[0]))
        neg = "NOT " if node.negated else ""
        return f"({osql} {neg}IN {self.operand(node.items)})"

    def to_sql(self, node) -> str:
        if isinstance(node, ast.TrueLit):
            return "TRUE"
        if isinstance(node, ast.And):
            return f"({self.to_sql(node.left)} AND {self.to_sql(node.right)})"
        if isinstance(node, ast.Or):
            return f"({self.to_sql(node.left)} OR {self.to_sql(node.right)})"
        if isinstance(node, ast.Not):
            return f"(NOT {self.to_sql(node.operand)})"
        if isinstance(node, ast.Cmp):
            return self.cmp(node)
        if isinstance(node, ast.In):
            return self.in_(node)
        if isinstance(node, ast.Like):
            pat = _lit(milvus_like_pattern(node.pattern))
            return f"({self.operand(node.operand)} LIKE {pat} ESCAPE '\\')"
        if isinstance(node, ast.Regex):
            # unanchored find — same convention as Spark RLIKE. Dialect
            # caveat: Spark is java.util.regex, DuckDB is RE2; the
            # differential corpus sticks to their shared subset
            # (literals, classes, anchors, quantifiers, alternation).
            m = f"regexp_matches({self.operand(node.operand)}, " \
                f"{_lit(node.pattern)})"
            return f"(NOT {m})" if node.negated else f"({m})"
        if isinstance(node, ast.Call):
            fn = self.calls.get(node.func)
            if fn is None:
                raise SqlGenError(
                    f"function {node.func!r} keeps its curated oracle")
            return fn(node.args)
        # a bare boolean column used as a predicate
        if isinstance(node, ast.Path):
            return self.path(node)
        raise SqlGenError(f"unsupported node {node!r}")


def to_sql(node, columns: set[str] | None = None,
           json_columns: set[str] | None = None,
           analyzers: dict | None = None,
           struct_array_columns: set[str] | None = None) -> str:
    """Lower a parsed filter AST to a DuckDB boolean expression.

    ``columns``: the declared column names; when given, an undeclared
    Path lowers through the dynamic-field map (compiler parity). When
    None, every name is treated as a declared column. ``json_columns``:
    declared string columns holding JSON — accessor paths on them lower
    to json_extract_string (compiler's get_json_object twin).
    ``analyzers``: per-field analyzer_params for TEXT_MATCH (compiler's
    ``analyzers`` twin). ``struct_array_columns``: columns declared
    array<struct<...>>, enabling ``col[*]["field"]`` struct access under
    the quantifier (the emitter is otherwise element-type-blind)."""
    return _Emitter(columns, json_columns, analyzers,
                    struct_array_columns).to_sql(node)


__all__ = ["to_sql", "SqlGenError"]
