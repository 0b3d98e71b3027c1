"""Randomized differential testing of the filter-expression language.

Every expression string is parsed ONCE, then lowered twice — through the
Spark compiler (exprlang.compiler) and through the DuckDB SQL emitter
(exprlang.sqlgen) — and both run against the same parquet table. The
per-expression signature (matching-row count + sum of matching ids) must
agree exactly, NULL three-valued logic included. A curated list pins one
expression per language feature; a seeded random generator then composes
hundreds of nested and/or/not combinations over typed leaves — coverage
the hand-written oracle strings in the driver registry cannot reach.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.exprlang import compile_expr, parse
from vectordb_testbricks_spark.exprlang.sqlgen import to_sql

N_ROWS = 1500
N_RANDOM = 240
CHUNK = 40


@pytest.fixture(scope="module")
def dft(spark, tmp_path_factory):
    """Synthetic differential table: typed scalars with ~10% NULLs (the
    three-valued-logic trap), strings with LIKE-able structure, and two
    array columns. Written to parquet so both engines read identical
    bytes."""
    path = str(tmp_path_factory.mktemp("diff") / "dft.parquet")
    df = spark.range(N_ROWS).select(
        F.col("id"),
        F.when(F.col("id") % 10 != 3, (F.col("id") * 7 % 100).cast("int"))
        .alias("i32"),
        F.when(F.col("id") % 11 != 5,
               (F.col("id") * 13 % 1000) / 10.0).alias("val"),
        F.concat(F.lit("item-"), (F.col("id") % 37).cast("string"),
                 F.when(F.col("id") % 4 == 0, "_x").otherwise("-y"))
        .alias("name"),
        F.when(F.col("id") % 7 != 2, F.col("id") % 3 == 0).alias("flag"),
        F.transform(F.sequence(F.lit(0), F.col("id") % 4),
                    lambda i: F.concat(F.lit("t"), ((F.col("id") + i) % 6)
                                       .cast("string"))).alias("tags"),
        F.when(F.col("id") % 13 != 6,
               F.transform(F.sequence(F.lit(0), F.col("id") % 3),
                           lambda i: ((F.col("id") * 3 + i) % 20)
                           .cast("int"))).alias("nums"),
        # struct-array for the [*] quantifier: ~6% NULL arrays, and a
        # NULL val inside some elements so the quantified comparison's
        # NULL-element branch (Kleene exists) is exercised, not just the
        # NULL-array branch
        F.when(F.col("id") % 17 != 8, F.transform(
            F.sequence(F.lit(0), F.col("id") % 3),
            lambda i: F.struct(
                F.when((F.col("id") + i) % 5 != 2,
                       ((F.col("id") * 5 + i * 7) % 60).cast("int"))
                .alias("val"),
                F.concat(F.lit("g"), ((F.col("id") + i) % 4)
                         .cast("string")).alias("tag"))))
        .alias("items"),
        # dynamic catch-all: string-valued map; dyn_num is absent for
        # id%6==0 rows (the missing-key NULL path)
        F.when(
            F.col("id") % 6 == 0,
            F.map_from_arrays(
                F.array(F.lit("dyn_word"), F.lit("dyn_flag")),
                F.array(F.concat(F.lit("w"),
                                 (F.col("id") % 9).cast("string")),
                        (F.col("id") % 2 == 0).cast("string"))))
        .otherwise(F.map_from_arrays(
            F.array(F.lit("dyn_num"), F.lit("dyn_word"),
                    F.lit("dyn_flag")),
            F.array((F.col("id") % 50).cast("string"),
                    F.concat(F.lit("w"), (F.col("id") % 9).cast("string")),
                    (F.col("id") % 2 == 0).cast("string"))))
        .alias("_dynamic"),
        # JSON-string column (P7): nested object, ~11% NULLs
        F.when(F.col("id") % 9 != 4, F.concat(
            F.lit('{"k": '), (F.col("id") % 30).cast("string"),
            F.lit(', "s": "s'), (F.col("id") % 5).cast("string"),
            F.lit('", "b": '),
            F.when(F.col("id") % 2 == 0, "true").otherwise("false"),
            F.lit(', "n": {"x": '), (F.col("id") % 7).cast("string"),
            F.lit("}}"))).alias("props"),
    )
    df.coalesce(1).write.mode("overwrite").parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW dft AS SELECT * FROM '{path}/*.parquet'")
    return spark.read.parquet(path), con


CURATED = [
    "",                                        # P15 empty = full scan
    "i32 == 21",                               # P1
    "i32 != 21",
    "val > 50.0",
    "10 <= i32 <= 40",                         # P2 combined range
    "i32 >= 10 and val < 80.0",                # P3
    "i32 < 5 or i32 > 95",
    "not (i32 == 21)",
    "i32 in [7, 14, 21, 28]",                  # P4
    "i32 not in [7, 14, 21, 28]",              # P5
    "i32 in []",                               # empty IN = const false
    "i32 not in []",                           # empty NOT IN = const true
    'name like "item-1%"',                     # P6 (% only)
    'name like "item-2%_x"',                   # _ is a literal in Milvus
    "nums[0] > 10",                            # P8 element access
    "nums[2] > 5",                             # P8 out-of-bounds = NULL
    "not (nums[2] > 5)",                       # ...and its 3VL negation
    'ARRAY_CONTAINS(tags, "t3")',              # P9
    "ARRAY_CONTAINS_ANY(nums, [1, 5, 9])",     # P10
    'ARRAY_CONTAINS_ALL(tags, ["t1", "t2"])',
    "array_length(nums) == 3",
    "flag == true",                            # P13
    "flag == false and i32 > 50",
    'starts_with(name, "item-3")',
    'i32 > 30 and name like "item-%-y" and not (val < 20.0)',  # P16
    "dyn_num > 25",                            # dynamic field, numeric cast
    "dyn_num <= 10 or dyn_num >= 45",
    "dyn_num in [3, 17, 33]",
    'dyn_word == "w4"',                        # dynamic string compare
    'dyn_word like "w%"',
    "dyn_flag == true",                        # dynamic bool cast
    "dyn_gone > 3",                            # key absent everywhere -> 0
    "not (dyn_num > 25)",                      # 3VL with missing keys
    'props["k"] > 12',                         # P7 JSON path, numeric cast
    'props["k"] in [3, 9, 21]',
    'props["s"] == "s2"',                      # JSON string compare
    'props["b"] == true',                      # JSON bool cast
    'props["n"]["x"] <= 3',                    # nested JSON path
    'props["zz"] > 1',                         # missing JSON key -> 0
    'not (props["k"] > 12)',                   # 3VL with NULL props
]


def _leaf(rnd: random.Random) -> str:
    k = rnd.randrange(19)
    if k >= 16:
        kk = k - 16
        if kk == 0:
            return f'props["k"] {rnd.choice([">", "<=", "=="])} ' \
                   f"{rnd.randrange(30)}"
        if kk == 1:
            return f'props["s"] == "s{rnd.randrange(5)}"'
        return f'props["n"]["x"] {rnd.choice([">", "<="])} ' \
               f"{rnd.randrange(7)}"
    if k >= 12:
        kk = k - 12
        if kk == 0:
            return f"dyn_num {rnd.choice(['>', '<=', '=='])} " \
                   f"{rnd.randrange(50)}"
        if kk == 1:
            return f'dyn_word == "w{rnd.randrange(9)}"'
        if kk == 2:
            return f"dyn_flag == {rnd.choice(['true', 'false'])}"
        items = sorted(rnd.sample(range(50), rnd.randrange(1, 4)))
        return f"dyn_num {rnd.choice(['', 'not '])}in {items}"
    if k == 0:
        return f"i32 {rnd.choice(['==', '!=', '>', '>=', '<', '<='])} " \
               f"{rnd.randrange(-5, 105)}"
    if k == 1:
        return f"val {rnd.choice(['>', '>=', '<', '<='])} " \
               f"{rnd.randrange(0, 1000) / 10.0}"
    if k == 2:
        lo = rnd.randrange(0, 80)
        return f"{lo} <= i32 <= {lo + rnd.randrange(1, 30)}"
    if k == 3:
        items = sorted(rnd.sample(range(100), rnd.randrange(1, 6)))
        neg = rnd.choice(["", "not "])
        return f"i32 {neg}in {items}"
    if k == 4:
        return f'name like "item-{rnd.randrange(37)}%"'
    if k == 5:
        return f'name == "item-{rnd.randrange(37)}-y"'
    if k == 6:
        return f"flag == {rnd.choice(['true', 'false'])}"
    if k == 7:
        return f'ARRAY_CONTAINS(tags, "t{rnd.randrange(6)}")'
    if k == 8:
        items = sorted(rnd.sample(range(20), rnd.randrange(1, 4)))
        return f"ARRAY_CONTAINS_ANY(nums, {items})"
    if k == 9:
        ts = ", ".join(f'"t{t}"'
                       for t in sorted(rnd.sample(range(6),
                                                  rnd.randrange(1, 3))))
        return f"ARRAY_CONTAINS_ALL(tags, [{ts}])"
    if k == 10:
        return f"array_length(nums) == {rnd.randrange(1, 4)}"
    return f"nums[{rnd.randrange(3)}] {rnd.choice(['>', '<='])} " \
           f"{rnd.randrange(20)}"


def _expr(rnd: random.Random, depth: int = 0) -> str:
    if depth >= 3 or rnd.random() < 0.35:
        return _leaf(rnd)
    r = rnd.random()
    a, b = _expr(rnd, depth + 1), _expr(rnd, depth + 1)
    if r < 0.40:
        return f"({a}) and ({b})"
    if r < 0.80:
        return f"({a}) or ({b})"
    return f"not ({a})"


def _signatures_spark(df, exprs, **ck):
    aggs = []
    for i, e in enumerate(exprs):
        pred = compile_expr(e, df, **ck)
        aggs.append(F.coalesce(F.sum(F.when(pred, 1)), F.lit(0))
                    .alias(f"c{i}"))
        aggs.append(F.coalesce(F.sum(F.when(pred, F.col("id"))), F.lit(0))
                    .alias(f"s{i}"))
    row = df.agg(*aggs).collect()[0]
    return [(row[f"c{i}"], row[f"s{i}"]) for i in range(len(exprs))]


COLUMNS = {"id", "i32", "val", "name", "flag", "tags", "nums", "items",
           "_dynamic", "props"}
JSON_COLUMNS = {"props"}


def _signatures_duck(con, exprs):
    sels = []
    for i, e in enumerate(exprs):
        sql = to_sql(parse(e), columns=COLUMNS,
                     json_columns=JSON_COLUMNS,
                     struct_array_columns={"items"})
        sels.append(f"CAST(COUNT(*) FILTER (WHERE {sql}) AS BIGINT)")
        sels.append(f"CAST(COALESCE(SUM(id) FILTER (WHERE {sql}), 0) "
                    f"AS BIGINT)")
    row = con.execute("SELECT " + ", ".join(sels) + " FROM dft").fetchone()
    return [(row[2 * i], row[2 * i + 1]) for i in range(len(exprs))]


def _check(df, con, exprs, **ck):
    for i in range(0, len(exprs), CHUNK):
        chunk = exprs[i:i + CHUNK]
        got = _signatures_spark(df, chunk, **ck)
        want = _signatures_duck(con, chunk)
        for e, g, w in zip(chunk, got, want):
            assert g == w, f"differential mismatch for {e!r}: " \
                           f"spark={g} duckdb={w}"


def test_curated_expressions_match_duckdb(dft):
    df, con = dft
    _check(df, con, CURATED)
    # sanity: the corpus is not degenerate — most curated filters select
    # a proper nonempty subset
    sigs = _signatures_spark(df, CURATED)
    nontrivial = sum(1 for c, _ in sigs if 0 < c < N_ROWS)
    # trivial by design: the empty filter (full scan), the negated
    # full-scan pair, the absent-key probes, and the constant
    # empty-IN / empty-NOT-IN pair
    assert nontrivial >= len(CURATED) - 7


@pytest.mark.slow
def test_random_expressions_match_duckdb(dft):
    df, con = dft
    rnd = random.Random(7)
    exprs = [_expr(rnd) for _ in range(N_RANDOM)]
    _check(df, con, exprs)
    # the generator must exercise real selectivity spread, not constants
    sigs = _signatures_spark(df, exprs[:CHUNK])
    assert len({c for c, _ in sigs}) > 10


def test_random_query_assembly_matches_duckdb(dft):
    """Q1/Q2/ext assembly differential: random (filter, output_fields,
    order_by, offset, limit) specs run through operators.query.query()
    vs the equivalent DuckDB SELECT — row-identical, order included.
    The predicate layer is covered by the signature tests above; this
    exercises the assembly AROUND it (projection order, offset-without-
    limit, offset past the row count, ordered pagination). order_by
    always ends with the unique id so both engines produce one total
    order; DuckDB sorts ASC NULLS LAST by default where Spark sorts
    NULLS FIRST, so the SQL says NULLS FIRST explicitly."""
    from vectordb_testbricks_spark.operators.query import query

    df, con = dft
    rnd = random.Random(41)
    scalar_cols = ["id", "i32", "val", "name", "flag"]
    for _ in range(30):
        flt = _expr(rnd) if rnd.random() < 0.8 else ""
        fields = rnd.sample(scalar_cols, rnd.randrange(1, 5))
        if "id" not in fields:
            fields.append("id")
        ob = rnd.sample([c for c in scalar_cols if c != "id"],
                        rnd.randrange(0, 3)) + ["id"]
        offset = rnd.choice([0, 0, 3, 17, N_ROWS + 10])
        limit = rnd.choice([None, 1, 7, 40])
        got = [tuple(r) for r in query(
            df, flt or None, output_fields=fields, limit=limit,
            order_by=ob, offset=offset).collect()]
        sql = to_sql(parse(flt), columns=COLUMNS,
                     json_columns=JSON_COLUMNS)
        q = (f"SELECT {', '.join(fields)} FROM dft WHERE {sql} "
             f"ORDER BY {', '.join(c + ' NULLS FIRST' for c in ob)}")
        if limit is not None:
            q += f" LIMIT {limit}"
        if offset:
            q += f" OFFSET {offset}"
        want = con.execute(q).fetchall()
        assert got == want, f"assembly mismatch flt={flt!r} " \
                            f"fields={fields} ob={ob} off={offset} " \
                            f"lim={limit}: {got[:3]} vs {want[:3]}"


# -------------------------------------------- 3.0 operator prototypes

# Regex patterns stick to the Java-regex ∩ RE2 shared subset (literals,
# char classes, anchors, \d, bounded quantifiers, alternation) — the two
# engines' dialects diverge on backrefs/lookaround, which Milvus's RE2
# engine would not accept anyway.
V3_CURATED = [
    'name =~ "item-1[0-9]-y"',
    'name !~ "^item-2"',
    'name =~ r"item-\\d\\d_x"',          # raw string: \d reaches the
    'name !~ r"(item-3|item-12)-y$"',    # engines unescaped
    'dyn_word =~ "w[0-5]$"',             # dynamic value; NULL when absent
    'not (dyn_word =~ "w[0-5]$")',       # ...and its 3VL negation
    "(id & 7) == 3",
    "id & 1 == 1",                       # & binds tighter than == (grammar)
    "(id ^ 21) < 700",
    "(id | 16) >= 48",
    "id & 3 ^ 2 | 8 == 10",              # full precedence chain & > ^ > |
    "(i32 & 12) != 0",                   # NULLs flow three-valued through
    "not ((i32 & 12) != 0)",             # the bit op on both engines
    '(id & 1) == 0 and name =~ "y$"',
    # [*] element quantifier → Spark F.exists vs DuckDB Kleene-exists
    # (CASE over list_filter); NULL arrays (nums, items) and NULL
    # element values (items.val) push both engines through all three
    # truth values, with and without NOT
    "nums[*] > 15",
    "not (nums[*] > 15)",
    "10 < nums[*]",                      # quantified path on the right
    'tags[*] == "t3"',
    'items[*]["val"] > 40',
    'not (items[*]["val"] > 40)',
    'items[*]["val"] <= 3',
    'items[*]["tag"] == "g2"',
    'items[*]["val"] != 12',
    'nums[*] > 15 and items[*]["tag"] == "g1"',
]


def _v3_leaf(rnd: random.Random) -> str:
    k = rnd.randrange(9)
    if k == 6:
        return f"nums[*] {rnd.choice(['>', '<=', '=='])} " \
               f"{rnd.randrange(20)}"
    if k == 7:
        return f'items[*]["val"] {rnd.choice([">", "<=", "!="])} ' \
               f"{rnd.randrange(60)}"
    if k == 8:
        return f'items[*]["tag"] == "g{rnd.randrange(4)}"'
    if k == 0:
        return f'name =~ "item-{rnd.randrange(37)}[-_]"'
    if k == 1:
        return f'name !~ "^item-{rnd.randrange(37)}-"'
    if k == 2:
        return 'name =~ r"-\\d+[-_]"'
    if k == 3:
        return f"(id & {rnd.randrange(1, 16)}) == {rnd.randrange(8)}"
    if k == 4:
        return f"(id ^ {rnd.randrange(64)}) < {rnd.randrange(100, 1500)}"
    return f"(i32 | {rnd.randrange(32)}) >= {rnd.randrange(100)}"


def _v3_expr(rnd: random.Random, depth: int = 0) -> str:
    if depth >= 2 or rnd.random() < 0.4:
        return _v3_leaf(rnd)
    a = _v3_expr(rnd, depth + 1)
    b = _leaf(rnd) if rnd.random() < 0.5 else _v3_expr(rnd, depth + 1)
    return f"({a}) {rnd.choice(['and', 'or'])} ({b})"


@pytest.mark.slow
def test_text_match_matches_duckdb(dft):
    """TEXT_MATCH differential: Spark arrays_overlap over tokenize()
    vs DuckDB list_has_any over the tokenizer's documented SQL twin,
    from one parsed AST. Covers case folding, NULL fields (props is
    NULL for ~11% of rows — 3VL under NOT), the empty-analyzed-query
    constant, and a per-field stop-words analyzer."""
    df, con = dft
    cases = [
        'TEXT_MATCH(name, "item 12")',
        'TEXT_MATCH(name, "X")',                 # query folds to "x"
        'not TEXT_MATCH(name, "item")',          # matches-all, negated
        'TEXT_MATCH(props, "s2 true")',          # NULL field -> NULL
        'not (TEXT_MATCH(props, "s2"))',         # ...3VL under NOT
        'TEXT_MATCH(name, "--")',                # analyzes to no terms
        'TEXT_MATCH(name, "12 17") and i32 > 20',
    ]
    for analyzers in (
            None,
            {"name": {"tokenizer": "standard",
                      "filter": ["lowercase",
                                 {"type": "stop",
                                  "stop_words": ["item"]}]}},
            # case-preserving analyzer (empty filter list => no
            # lowercase): exercises the TOKEN_SPLIT_RE_CASED branch on
            # both engines — "X" must match the literal "_x" suffix rows
            # only via the cased token "x"... which no longer folds, so
            # the match set differs from the folded run
            {"name": {"tokenizer": "standard", "filter": []}},
            # roadmap ngram tokenizer: char 2-3-grams within alnum runs
            # on both engines (nested flatten/list_transform twin)
            {"name": {"tokenizer": {"type": "ngram", "min_gram": 2,
                                    "max_gram": 3}}},
            # roadmap inline synonym filter: expand semantics on both
            # engines ("item" expands with "x", so querying "x" matches
            # every row; CASE-arm order = first-match)
            {"name": {"tokenizer": "standard",
                      "filter": ["lowercase",
                                 {"type": "synonym",
                                  "synonyms": ["item,x", "17,y"]}]}},
            # dict/CJK FMM tokenizer (r09): ordered-alternation regex on
            # both engines — "item-12" segments to the dictionary word,
            # punct drops, alnum runs survive — leftmost-first
            # alternation parity between java.util.regex and RE2 is
            # exactly what this case guards
            {"name": {"tokenizer": {"type": "dict",
                                    "words": ["item", "em-1"]}}}):
        for e in cases:
            node = parse(e)
            pred = compile_expr(e, df, enable_text_match=True,
                                analyzers=analyzers)
            got = df.filter(pred).agg(
                F.count(F.lit(1)), F.coalesce(F.sum("id"), F.lit(0))
            ).collect()[0]
            sql = to_sql(node, columns=COLUMNS, json_columns=JSON_COLUMNS,
                         analyzers=analyzers)
            want = con.execute(
                f"SELECT CAST(COUNT(*) AS BIGINT), "
                f"CAST(COALESCE(SUM(id), 0) AS BIGINT) FROM dft "
                f"WHERE {sql}").fetchone()
            assert tuple(got) == want, \
                f"text_match mismatch {e!r} analyzers={analyzers}: " \
                f"{tuple(got)} vs {want}"


def test_phrase_match_matches_duckdb(dft):
    """PHRASE_MATCH differential: the compiler's nested-exists sloppy
    phrase (in-order, span ≤ (m−1)+slop) vs the same chain emitted as
    DuckDB list_filter nesting, from one parsed AST. name tokenizes to
    ["item", <n>, "x"|"y"], so adjacency, gap-of-one, 3-term phrases,
    and order violations all have known row sets; props exercises NULL
    fields (3VL under NOT)."""
    df, con = dft
    cases = [
        'PHRASE_MATCH(name, "item 12")',          # exact adjacency
        'PHRASE_MATCH(name, "item x")',           # gap -> false at slop=0
        'PHRASE_MATCH(name, "item x", 1)',        # ...true at slop=1
        'PHRASE_MATCH(name, "item 12 x")',        # 3-term adjacency
        'PHRASE_MATCH(name, "12 item")',          # order violation
        'PHRASE_MATCH(name, "12 item", 5)',       # stays false: in-order
        'PHRASE_MATCH(name, "item")',             # single term
        'not PHRASE_MATCH(props, "s2", 2)',       # NULL field, 3VL
        # multi-term + slop>0 on a NULL field: the sloppy branch builds
        # positions arrays via greatest+filter which swallow the NULL —
        # regression for the r07 advisor finding (NULL AND FALSE = FALSE
        # dropped NULL rows under NOT while DuckDB kept them)
        'not PHRASE_MATCH(props, "s2 true", 1)',
        'not PHRASE_MATCH(props, "s2 a b", 2)',
        'PHRASE_MATCH(name, "item 3") or PHRASE_MATCH(name, "item 7")',
    ]
    for e in cases:
        node = parse(e)
        pred = compile_expr(e, df, enable_text_match=True)
        got = df.filter(pred).agg(
            F.count(F.lit(1)), F.coalesce(F.sum("id"), F.lit(0))
        ).collect()[0]
        sql = to_sql(node, columns=COLUMNS, json_columns=JSON_COLUMNS)
        want = con.execute(
            f"SELECT CAST(COUNT(*) AS BIGINT), "
            f"CAST(COALESCE(SUM(id), 0) AS BIGINT) FROM dft "
            f"WHERE {sql}").fetchone()
        assert tuple(got) == want, \
            f"phrase_match mismatch {e!r}: {tuple(got)} vs {want}"


@pytest.mark.slow
def test_v3_operator_prototypes_match_duckdb(dft):
    """Gated 3.0 prototypes (=~/!~ regex, bitwise &/^/|, raw strings)
    differentially verified: Spark rlike/bitwise Columns vs DuckDB
    regexp_matches/&/xor()/| from the same parsed AST."""
    df, con = dft
    rnd = random.Random(23)
    exprs = V3_CURATED + [_v3_expr(rnd) for _ in range(60)]
    _check(df, con, exprs, enable_v3_exprs=True)
    sigs = _signatures_spark(df, V3_CURATED, enable_v3_exprs=True)
    nontrivial = sum(1 for c, _ in sigs if 0 < c < N_ROWS)
    assert nontrivial >= len(V3_CURATED) - 2
