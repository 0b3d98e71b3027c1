"""Expression-language tests: grammar forms P1-P16 from SURVEY.md §2.2,
validated against direct DataFrame predicates and DuckDB."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.exprlang import compile_expr, parse
from vectordb_testbricks_spark.exprlang.parser import ExprSyntaxError


def n_rows(df, expr):
    return df.filter(compile_expr(expr, df)).count()


def test_p1_comparisons(tables):
    li = tables["lineitem"].df
    assert n_rows(li, "l_quantity == 1.0") == li.filter("l_quantity = 1.0").count()
    assert n_rows(li, "l_orderkey != 1") == li.filter("l_orderkey <> 1").count()
    assert n_rows(li, "l_discount >= 0.05") == li.filter("l_discount >= 0.05").count()


def test_p2_combined_range(tables):
    li = tables["lineitem"].df
    expected = li.filter("l_quantity >= 10 and l_quantity <= 20").count()
    assert n_rows(li, "10 <= l_quantity <= 20") == expected
    assert n_rows(li, "l_quantity >= 10 and l_quantity <= 20") == expected
    assert n_rows(li, "l_quantity >= 10 && l_quantity <= 20") == expected


def test_p3_connectives(tables):
    o = tables["orders"].df
    a = n_rows(o, 'o_orderstatus == "F" or o_totalprice > 100000')
    b = n_rows(o, 'o_orderstatus == "F" || o_totalprice > 100000')
    assert a == b > 0
    assert n_rows(o, 'not (o_orderstatus == "F")') == \
        o.filter("o_orderstatus <> 'F'").count()


def test_p4_p5_in(tables):
    c = tables["customer"].df
    exp = c.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).count()
    assert n_rows(c, 'c_mktsegment in ["BUILDING", "MACHINERY"]') == exp
    assert n_rows(c, 'c_mktsegment not in ["BUILDING", "MACHINERY"]') == \
        c.count() - exp


def test_p6_like(tables):
    p = tables["part"].df
    assert n_rows(p, 'p_name like "%a%"') == p.filter("p_name like '%a%'").count()
    # Milvus LIKE: '_' is a LITERAL, not the SQL single-char wildcard —
    # no brand value contains an underscore, so this matches nothing
    # (while SQL LIKE 'Brand#1_' would match Brand#11..Brand#15)
    assert n_rows(p, 'p_brand like "Brand#1_"') == 0
    assert p.filter("p_brand like 'Brand#1_'").count() > 0


def test_p6_like_literal_underscore(spark):
    df = spark.createDataFrame(
        [("a_b",), ("axb",), ("a_bc",)], "s string")
    assert n_rows(df, 's like "a_b"') == 1      # only the literal a_b
    assert n_rows(df, 's like "a_b%"') == 2     # a_b, a_bc
    assert n_rows(df, 's like "%_b%"') == 2     # underscore-containing only


def test_p7_json_path(tables):
    e = tables["events"].df
    exp = e.filter(F.get_json_object("props", "$.k").cast("double") >= 50).count()
    assert n_rows(e, 'props["k"] >= 50') == exp
    assert 0 < exp < e.count()


def test_p8_array_access(spark):
    df = spark.createDataFrame([(1, [10, 20]), (2, [30, 40])], "id int, a array<int>")
    assert n_rows(df, "a[0] == 10") == 1
    assert n_rows(df, "a[1] in [20, 40]") == 2


def test_p9_p10_array_contains(spark):
    df = spark.createDataFrame(
        [(1, ["x", "y"]), (2, ["y", "z"]), (3, ["q"])], "id int, tags array<string>")
    assert n_rows(df, 'array_contains(tags, "y")') == 2
    assert n_rows(df, 'array_contains_any(tags, ["x", "z"])') == 2
    assert n_rows(df, 'array_contains_all(tags, ["y", "z"])') == 1
    assert n_rows(df, "array_length(tags) == 2") == 2


def test_p11_json_contains(spark):
    df = spark.createDataFrame(
        [(1, '{"tags": ["a", "b"]}'), (2, '{"tags": ["b"]}')], "id int, j string")
    assert n_rows(df, 'json_contains(j["tags"], "a")') == 1
    assert n_rows(df, 'json_contains_any(j["tags"], ["a", "b"])') == 2
    assert n_rows(df, 'json_contains_all(j["tags"], ["a", "b"])') == 1


def test_p12_st_contains(spark):
    df = spark.createDataFrame(
        [(1, "POINT (0.5 0.5)"), (2, "POINT (2.0 2.0)"), (3, "POINT (-1.0 0.5)")],
        "id int, loc string")
    expr = 'st_contains(loc, "POLYGON((0 0, 1 0, 1 1, 0 1, 0 0))")'
    got = sorted(r["id"] for r in df.filter(compile_expr(expr, df)).collect())
    assert got == [1]


def test_p13_bool_eq(spark):
    df = spark.createDataFrame([(1, True), (2, False)], "id int, flag boolean")
    assert n_rows(df, "flag == True") == 1
    assert n_rows(df, "flag == false") == 1


def test_p14_string_escaping(spark):
    df = spark.createDataFrame([(1, 'a"b'), (2, "a'b")], "id int, s string")
    assert n_rows(df, 's == "a\\"b"') == 1
    assert n_rows(df, "s == 'a\\'b'") == 1


def test_p15_empty_filter(tables):
    li = tables["lineitem"].df
    assert n_rows(li, "") == li.count()


def test_p16_compound(tables):
    li = tables["lineitem"].df
    expr = ('l_quantity > 45 || l_discount > 0.09 '
            'or (l_returnflag == "R" and l_linenumber in [1, 2])')
    exp = li.filter(
        "l_quantity > 45 or l_discount > 0.09 "
        "or (l_returnflag = 'R' and l_linenumber in (1, 2))").count()
    assert n_rows(li, expr) == exp


def test_pushdown_reaches_parquet(tables):
    li = tables["lineitem"].df
    plan = li.filter(compile_expr("l_orderkey <= 100", li)) \
        .select("l_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_orderkey" in plan


def test_syntax_errors():
    for bad in ["l_orderkey ==", "a >", "in [1,2]", 'x like 5', "(a == 1"]:
        with pytest.raises((ExprSyntaxError, Exception)):
            parse(bad)


def test_parser_never_crashes_on_arbitrary_input(tables):
    """Fuzz: any input either parses (and compiles against a real schema,
    or fails with the typed compile error) or raises the typed syntax
    error — never an unclassified exception."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from vectordb_testbricks_spark.exprlang import compile_expr
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError
    from vectordb_testbricks_spark.exprlang.parser import ExprSyntaxError

    df = tables["part"].df

    @settings(max_examples=300, deadline=None)
    @given(st.text(
        alphabet=st.sampled_from(list(
            'abcxyz_0123456789 ()[]{}"\'%<>=!&|.,+-~p_name')),
        max_size=40))
    def fuzz(s):
        try:
            compile_expr(s, df)
        except (ExprSyntaxError, ExprCompileError):
            pass
    fuzz()


def test_text_match_gated_and_semantics(spark):
    """TEXT_MATCH (gated 3.0-roadmap prototype): raises the typed compile
    error unless enabled; enabled, it matches docs whose analyzed text
    shares ANY analyzed query term (case-folded, punctuation split)."""
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError

    df = spark.createDataFrame(
        [(1, "The Quick Brown fox."), (2, "lazy dog sleeps"),
         (3, "quick!dog"), (4, "nothing relevant here")],
        "id long, text string")
    with pytest.raises(ExprCompileError, match="gated"):
        compile_expr("TEXT_MATCH(text, 'quick')", df)
    pred = compile_expr("TEXT_MATCH(text, 'Quick, DOG')", df,
                        enable_text_match=True)
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 2, 3]
    # an all-punctuation query analyzes to zero terms -> matches nothing
    none = compile_expr("TEXT_MATCH(text, '!!! ...')", df,
                        enable_text_match=True)
    assert df.filter(none).count() == 0


def test_text_match_prefers_token_sidecar(spark):
    """When the plan carries a materialized token column (_toks_<field>),
    TEXT_MATCH probes it instead of re-tokenizing the raw text — the
    tokenize-once shape shared with the BM25 function field."""
    df = spark.createDataFrame(
        [(1, "raw says alpha", ["zebra"]), (2, "raw says beta", ["beta"])],
        "id long, text string, _toks_text array<string>")
    pred = compile_expr("TEXT_MATCH(text, 'zebra')", df,
                        enable_text_match=True)
    assert [r.id for r in df.filter(pred).collect()] == [1]


def test_phrase_match_gated_and_semantics(spark):
    """PHRASE_MATCH (gated, slop=0): analyzed query terms must occur
    consecutively in order; case and punctuation fold through the same
    analyzer; negative slop raises."""
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError

    df = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "quick the brown fox"),
         (3, "Quick, Brown fox"), (4, "brown quick"), (5, "quick")],
        "id long, text string")
    with pytest.raises(ExprCompileError, match="gated"):
        compile_expr('PHRASE_MATCH(text, "quick brown")', df)
    pred = compile_expr('PHRASE_MATCH(text, "Quick Brown!")', df,
                        enable_text_match=True)
    # adjacency in order: 1 (..quick brown..) and 3 (folded) match;
    # 2 has them separated, 4 reversed, 5 incomplete
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 3]
    single = compile_expr('PHRASE_MATCH(text, "quick")', df,
                          enable_text_match=True)
    assert sorted(r.id for r in df.filter(single).collect()) == [1, 2, 3, 4, 5]
    with pytest.raises(ExprCompileError, match="slop"):
        compile_expr('PHRASE_MATCH(text, "quick brown", -1)', df,
                     enable_text_match=True)


def _ref_sloppy_inorder(tokens: list[str], terms: list[str],
                        slop: int) -> bool:
    """Independent reference for the in-order bounded-gap semantics:
    exhaustive search over ordered position tuples with span ≤ m-1+slop."""
    m = len(terms)
    pos = [[i + 1 for i, t in enumerate(tokens) if t == term]
           for term in terms]

    def dfs(j, prev, first):
        if j == m:
            return True
        return any(dfs(j + 1, p, first) for p in pos[j]
                   if p > prev and p - first <= m - 1 + slop)

    return any(dfs(1, p1, p1) for p1 in pos[0])


def test_phrase_match_sloppy_in_order_bounded_gap(spark):
    """PHRASE_MATCH slop>0 (gated prototype): in-order matches within the
    gap budget — up to ``slop`` extra tokens between the phrase terms —
    verified against an exhaustive driver-side reference over a seeded
    corpus. Documented divergence from full Lucene: out-of-order
    arrangements ('brown quick' at slop 2) do NOT match; in-order matches
    are a strict subset, never a false positive."""
    import random
    from vectordb_testbricks_spark.functions.text import py_tokenize
    rnd = random.Random(23)
    vocab = ["quick", "brown", "fox", "dog", "the", "over"]
    rows = [(i, " ".join(rnd.choice(vocab) for _ in range(rnd.randrange(9))))
            for i in range(300)]
    # pinned edge docs: exact adjacency, one/two-token gaps, reversed,
    # repeated-term phrase fodder, too-short
    rows += [(300, "quick brown"), (301, "quick the brown"),
             (302, "quick the the brown"), (303, "brown quick"),
             (304, "quick quick brown"), (305, ""), (306, "quick")]
    df = spark.createDataFrame(rows, "id long, text string")
    cases = [("quick brown", 1), ("quick brown", 2), ("quick fox dog", 2),
             ("quick quick", 1), ("the quick brown fox", 3)]
    for phrase, slop in cases:
        pred = compile_expr(f'PHRASE_MATCH(text, "{phrase}", {slop})', df,
                            enable_text_match=True)
        got = sorted(r.id for r in df.filter(pred).collect())
        terms = py_tokenize(phrase)
        want = sorted(i for i, txt in rows
                      if _ref_sloppy_inorder(py_tokenize(txt), terms, slop))
        assert got == want, (phrase, slop)
    # slop=1 admits one gap: 300, 301 match; 302 (two gaps) does not;
    # 303 reversed never matches in-order
    p1 = compile_expr('PHRASE_MATCH(text, "quick brown", 1)', df,
                      enable_text_match=True)
    pinned = {r.id for r in df.filter(p1).collect()} & set(range(300, 307))
    assert pinned == {300, 301, 304}


def test_text_match_uses_field_analyzer(spark):
    """The query literal must analyze with the MATCH FIELD's analyzer: a
    cased field (no lowercase filter) keeps 'Quick' != 'quick', and a
    stop-filtered field drops stop words from the query too."""
    df = spark.createDataFrame(
        [(1, "Quick fox"), (2, "quick fox"), (3, "the fox")],
        "id long, text string")
    cased = {"tokenizer": "standard", "filter": []}
    pred = compile_expr('TEXT_MATCH(text, "Quick")', df,
                        enable_text_match=True,
                        analyzers={"text": cased})
    assert [r.id for r in df.filter(pred).collect()] == [1]
    stop = {"tokenizer": "standard",
            "filter": ["lowercase", {"type": "stop", "stop_words": ["the"]}]}
    # 'the' analyzes away on BOTH sides: the query contributes no term
    # for it, so only 'fox' matches (all rows)
    pred = compile_expr('TEXT_MATCH(text, "the fox")', df,
                        enable_text_match=True, analyzers={"text": stop})
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 2, 3]
    only_stop = compile_expr('TEXT_MATCH(text, "the")', df,
                             enable_text_match=True,
                             analyzers={"text": stop})
    assert df.filter(only_stop).count() == 0


def test_v3_parser_surface():
    """3.0 operator prototypes parse unconditionally (the gate is at
    compile time, like TEXT_MATCH): =~/!~ with escaped or raw string
    patterns, bitwise precedence & > ^ > | with all three binding
    tighter than relops, and raw strings keeping backslashes verbatim."""
    from vectordb_testbricks_spark.exprlang.parser import (
        BitOp, Cmp, Lit, Path, Regex, parse)
    assert parse('name =~ "a.c"') == Regex(Path("name"), "a.c")
    assert parse('name !~ "x$"') == Regex(Path("name"), "x$", negated=True)
    # raw string: \d is NOT unescaped (the escaped form "\\d" means the
    # same thing; "\d" would collapse to a bare 'd')
    assert parse('name =~ r"\\d+"') == Regex(Path("name"), "\\d+")
    assert parse("name like r'10%_x'") == parse('name like "10%_x"')
    # & > ^ > |, all tighter than ==
    assert parse("a & 3 == 1") == Cmp("==", BitOp("&", Path("a"), Lit(3)),
                                      Lit(1))
    assert parse("a & 1 ^ 2 | 4 == 7") == Cmp(
        "==",
        BitOp("|", BitOp("^", BitOp("&", Path("a"), Lit(1)), Lit(2)),
              Lit(4)),
        Lit(7))
    # && / || still lex as boolean connectives, not two bit ops
    assert parse("a == 1 && b == 2") == parse("a == 1 and b == 2")
    assert parse("a == 1 || b == 2") == parse("a == 1 or b == 2")


def test_v3_operators_gated_and_semantics(spark):
    """=~ / !~ / bitwise compile only with enable_v3_exprs=True and then
    evaluate with unanchored-regex and three-valued-NULL semantics."""
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError

    df = spark.createDataFrame(
        [(1, "alpha-12"), (2, "beta-7"), (3, None), (4, "alpha-9x")],
        "id long, name string")
    with pytest.raises(ExprCompileError, match="gated"):
        compile_expr('name =~ "alpha"', df)
    with pytest.raises(ExprCompileError, match="gated"):
        compile_expr("(id & 1) == 1", df)
    m = compile_expr(r'name =~ r"alpha-\d+$"', df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(m).collect()) == [1]
    nm = compile_expr('name !~ "alpha"', df, enable_v3_exprs=True)
    # 3VL: the NULL name is dropped by !~ too (same discipline as !=)
    assert sorted(r.id for r in df.filter(nm).collect()) == [2]
    odd = compile_expr("id & 1 == 1", df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(odd).collect()) == [1, 3]
    x = compile_expr("(id ^ 1) == 0", df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(x).collect()) == [1]


def test_star_element_access_gated_and_semantics(spark):
    """3.0 [*] element access ($[...] 访问): a comparison over
    path[*]... is existentially quantified over the array — lowered to a
    scan-stage exists (no Generate in the plan); gated with the other v3
    prototypes; literal side may appear on either side; struct subfield
    and plain-array element walks both work."""
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError

    df = spark.createDataFrame(
        [(1, [{"tag": "a", "val": 50}, {"tag": "b", "val": 10}], [1, 2]),
         (2, [{"tag": "b", "val": 99}], [7]),
         (3, [], [0, 8]),
         (4, None, None)],
        "id long, items array<struct<tag string, val int>>, "
        "nums array<bigint>")
    with pytest.raises(ExprCompileError, match="gated"):
        compile_expr('items[*]["val"] > 40', df)
    p = compile_expr('items[*]["val"] > 40', df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(p).collect()) == [1, 2]
    p = compile_expr('items[*]["tag"] == "a"', df, enable_v3_exprs=True)
    assert [r.id for r in df.filter(p).collect()] == [1]
    # plain array of scalars; literal on the left flips correctly
    p = compile_expr("5 <= nums[*]", df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(p).collect()) == [2, 3]
    # empty array -> no element satisfies; NULL array -> NULL (dropped)
    p = compile_expr("nums[*] >= 0", df, enable_v3_exprs=True)
    assert sorted(r.id for r in df.filter(p).collect()) == [1, 2, 3]
    # plan stays un-exploded
    plan = df.filter(compile_expr('items[*]["val"] > 40', df,
                                  enable_v3_exprs=True)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan
    # compile-time rejections
    for bad in ('items[*]["val"] > nums[*]',        # two quantifiers
                'unknown_col[*] > 1'):              # undeclared
        with pytest.raises(ExprCompileError):
            compile_expr(bad, df, enable_v3_exprs=True)
    # a [*] path outside a comparison is rejected with a clear message
    with pytest.raises(ExprCompileError, match="quantifies"):
        compile_expr('array_length(nums[*]) == 1', df,
                     enable_v3_exprs=True)


def test_star_rejected_in_json_and_chained_contexts(spark):
    """review r07c: [*] must fail loudly where it has no lowering —
    JSON-string paths, dynamic paths, and chained combined ranges —
    instead of stringifying into a JSON path that silently matches
    nothing; nested JSON under a struct folds ALL remaining accessors."""
    from vectordb_testbricks_spark.exprlang.compiler import ExprCompileError
    from vectordb_testbricks_spark.exprlang.parser import ExprSyntaxError

    df = spark.createDataFrame(
        [(1, '{"a": {"b": 3}}', [1, 9],
          {"j": '{"a": {"b": 7}}'},
          {"dyn_x": "5"})],
        "id long, props string, nums array<bigint>, "
        "meta struct<j string>, _dynamic map<string,string>")
    for bad in ('props[*] == 1',          # JSON-string column
                'undeclared[*] == 1'):    # dynamic path
        with pytest.raises(ExprCompileError, match=r"\[\*\]"):
            compile_expr(bad, df, enable_v3_exprs=True,
                         json_columns={"props"})
    with pytest.raises(ExprSyntaxError, match="combined ranges"):
        compile_expr("0 < nums[*] < 5", df, enable_v3_exprs=True)
    # nested JSON inside a struct: every remaining accessor reaches the
    # JSON path (was: only the first, silently comparing the wrong value)
    p = compile_expr('meta["j"]["a"]["b"] == 7', df)
    assert df.filter(p).count() == 1
    p = compile_expr('meta["j"]["a"]["b"] == 3', df)
    assert df.filter(p).count() == 0


def test_ngram_tokenizer_analyzer(spark):
    """Roadmap ngram tokenizer: analyzer_params dict-tokenizer shape,
    Lucene semantics (grams within alnum runs, short runs emit
    nothing), twin parity, validation, and TEXT_MATCH end-to-end."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.exprlang import compile_expr
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, py_tokenize, tokenize)
    ap = {"tokenizer": {"type": "ngram", "min_gram": 2, "max_gram": 3}}
    kw = analyzer_kwargs(ap)
    assert py_tokenize("Hello, wor!", **kw) == [
        "he", "el", "ll", "lo", "hel", "ell", "llo", "wo", "or", "wor"]
    assert py_tokenize("a", **kw) == []      # shorter than min_gram
    df = spark.createDataFrame(
        [(0, "Hello world"), (1, "nothing shared"), (2, None)],
        "id bigint, body string")
    got = df.select("id", tokenize(F.col("body"), **kw).alias("g")) \
            .collect()
    by_id = {r.id: r.g for r in got}
    assert by_id[0] == py_tokenize("Hello world", **kw)
    assert by_id[2] is None
    # TEXT_MATCH through the per-field analyzer: "hell" grams to
    # [he,el,ll,hel,ell] which overlap row 0 only... and "xqz" (grams
    # xq,qz,xqz) matches nothing
    pred = compile_expr('TEXT_MATCH(body, "hell")', df,
                        enable_text_match=True, analyzers={"body": ap})
    assert [r.id for r in df.filter(pred).collect()] == [0]
    pred2 = compile_expr('TEXT_MATCH(body, "xqz")', df,
                         enable_text_match=True, analyzers={"body": ap})
    assert df.filter(pred2).count() == 0
    for bad in ({"tokenizer": {"type": "edge_ngram"}},
                {"tokenizer": {"type": "ngram", "min_gram": 0}},
                {"tokenizer": {"type": "ngram", "min_gram": 3,
                               "max_gram": 2}}):
        with _pt.raises(ValueError):
            analyzer_kwargs(bad)


def test_synonym_filter_analyzer(spark):
    """Roadmap inline synonym filter (expand semantics): group members
    share all tokens on both lowerings; first group wins for a token in
    two groups (Spark chain vs Python break parity); validation."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.exprlang import compile_expr
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, py_tokenize, tokenize)
    ap = {"tokenizer": "standard",
          "filter": ["lowercase",
                     {"type": "synonym",
                      "synonyms": ["fast,quick,rapid", "big,large"]}]}
    kw = analyzer_kwargs(ap)
    assert py_tokenize("A Quick big dog", **kw) == [
        "a", "fast", "quick", "rapid", "big", "large", "dog"]
    df = spark.createDataFrame(
        [(0, "the RAPID fox"), (1, "a large hound"), (2, "plain prose")],
        "id bigint, body string")
    got = {r.id: r.g for r in
           df.select("id", tokenize(F.col("body"), **kw).alias("g"))
           .collect()}
    for i, text in [(0, "the RAPID fox"), (1, "a large hound"),
                    (2, "plain prose")]:
        assert got[i] == py_tokenize(text, **kw), i
    # TEXT_MATCH: querying "fast" matches the doc that said "rapid"
    pred = compile_expr('TEXT_MATCH(body, "fast")', df,
                        enable_text_match=True, analyzers={"body": ap})
    assert [r.id for r in df.filter(pred).collect()] == [0]
    # overlapping groups: first group claims the shared token
    ap2 = {"tokenizer": "standard",
           "filter": ["lowercase",
                      {"type": "synonym",
                       "synonyms": ["x,y", "y,z"]}]}
    kw2 = analyzer_kwargs(ap2)
    assert py_tokenize("y", **kw2) == ["x", "y"]
    r = spark.createDataFrame([("y",)], "t string").select(
        tokenize(F.col("t"), **kw2).alias("g")).collect()[0]
    assert r.g == ["x", "y"]
    for bad in ({"filter": [{"type": "synonym", "synonyms": "a,b"}]},
                {"filter": [{"type": "synonym", "synonyms": ["solo"]}]}):
        with _pt.raises(ValueError):
            analyzer_kwargs(bad)


def test_synonym_file_dictionary(spark, tmp_path):
    """Feature-inventory §5 analyzer resources ('synonym file'): a
    synonym dictionary file (one comma-separated group per line, blank
    lines and # comments skipped) resolves driver-side at
    analyzer_kwargs time into the SAME inline expansion — identical
    kwargs, identical tokens, composable with inline groups. Mapping
    rules (a => b) and oversized dictionaries fail loudly."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, py_tokenize, tokenize)
    d = tmp_path / "syn.txt"
    d.write_text("# pace words\nfast, quick, rapid\n\nbig,large\n")
    ap_file = {"tokenizer": "standard",
               "filter": ["lowercase",
                          {"type": "synonym", "synonyms_path": str(d)}]}
    ap_inline = {"tokenizer": "standard",
                 "filter": ["lowercase",
                            {"type": "synonym",
                             "synonyms": ["fast,quick,rapid",
                                          "big,large"]}]}
    kw = analyzer_kwargs(ap_file)
    assert kw == analyzer_kwargs(ap_inline)
    r = spark.createDataFrame([("the RAPID dog",)], "t string").select(
        tokenize(F.col("t"), **kw).alias("g")).collect()[0]
    assert r.g == py_tokenize("the RAPID dog", **kw) == \
        ["the", "fast", "quick", "rapid", "dog"]
    # inline groups come FIRST, then the file's (first group wins ties)
    mixed = analyzer_kwargs(
        {"tokenizer": "standard",
         "filter": ["lowercase",
                    {"type": "synonym", "synonyms": ["rapid,swift"],
                     "synonyms_path": str(d)}]})
    assert py_tokenize("rapid", **mixed) == ["rapid", "swift"]
    # loud failures: mapping syntax, oversized dictionary, missing file
    (tmp_path / "map.txt").write_text("usa, united states => america\n")
    with _pt.raises(ValueError, match="=>"):
        analyzer_kwargs({"filter": [
            {"type": "synonym",
             "synonyms_path": str(tmp_path / "map.txt")}]})
    (tmp_path / "huge.txt").write_text(
        "\n".join(f"w{i}a,w{i}b" for i in range(501)))
    with _pt.raises(ValueError, match="too large"):
        analyzer_kwargs({"filter": [
            {"type": "synonym",
             "synonyms_path": str(tmp_path / "huge.txt")}]})
    with _pt.raises(OSError):
        analyzer_kwargs({"filter": [
            {"type": "synonym",
             "synonyms_path": str(tmp_path / "absent.txt")}]})


def test_dict_tokenizer_cjk_standin(spark, tmp_path, duck):
    """CJK analyzer stand-in (feature-inventory §3 lists jieba/pinyin;
    this is the public-knowledge dictionary FMM segmenter): longest
    dictionary word wins at each position, OOV non-ascii chars emit as
    unigrams, ascii runs stay word tokens, ascii + CJK punctuation
    drops. Verified identical across ALL THREE lowerings (Spark
    regexp_extract_all, Python re twin, DuckDB RE2 twin) and end-to-end
    through TEXT_MATCH with a per-field dict analyzer."""
    import pytest as _pt
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.exprlang import compile_expr
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, fmm_pattern, py_tokenize, tokenize)
    ap = {"tokenizer": {"type": "dict",
                        "words": ["北京", "北京大学", "天安门", "天安"]}}
    kw = analyzer_kwargs(ap)
    texts = ["我爱北京大学和天安门广场 hello World42，测试。",
             "天安门 north 北京大学 south!",
             "no cjk at all — just ascii",
             "",
             None]
    # longest-match + unigram fallback + punct drop
    assert py_tokenize(texts[0], **kw) == [
        "我", "爱", "北京大学", "和", "天安门", "广", "场",
        "hello", "world42", "测", "试"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "id bigint, body string")
    got = {r.id: r.g for r in df.select(
        "id", tokenize(F.col("body"), **kw).alias("g")).collect()}
    pat = fmm_pattern(kw["dict_words"], kw["lowercase"])
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None
            continue
        assert got[i] == py_tokenize(t, **kw), t
        d = duck.execute(
            "SELECT regexp_extract_all(lower(?), ?)", [t, pat]
        ).fetchone()[0]
        assert got[i] == d, t
    # TEXT_MATCH analyzes the query with the field's dict analyzer:
    # "北京大学" is one token (longest match), so it hits rows 0 and 1
    pred = compile_expr('TEXT_MATCH(body, "北京大学")', df,
                        enable_text_match=True, analyzers={"body": ap})
    assert sorted(r.id for r in df.filter(pred).collect()) == [0, 1]
    # "北京" alone is NOT a token of rows containing 北京大学 (FMM took
    # the longer word), so it matches nothing
    pred2 = compile_expr('TEXT_MATCH(body, "北京")', df,
                         enable_text_match=True, analyzers={"body": ap})
    assert df.filter(pred2).count() == 0
    # file dictionary: one word per line, comments skipped — resolved
    # at declaration time like the synonym file dictionaries
    dic = tmp_path / "cjk.dic"
    dic.write_text("# demo dictionary\n北京\n天安门\n\n", encoding="utf-8")
    kw2 = analyzer_kwargs({"tokenizer": {"type": "dict",
                                         "dict_path": str(dic)}})
    assert py_tokenize("去北京看天安门", **kw2) == [
        "去", "北京", "看", "天安门"]
    # stop filter composes after segmentation
    kw3 = analyzer_kwargs({
        "tokenizer": {"type": "dict", "words": ["北京"]},
        "filter": ["lowercase", {"type": "stop", "stop_words": ["的"]}]})
    assert py_tokenize("我的北京", **kw3) == ["我", "北京"]
    # validation: empty wordlist, oversized wordlist, ngram combo,
    # non-list words
    for bad in ({"tokenizer": {"type": "dict"}},
                {"tokenizer": {"type": "dict", "words": "北京"}},
                {"tokenizer": {"type": "dict",
                               "words": [f"w{i}" for i in range(2001)]}}):
        with _pt.raises(ValueError):
            analyzer_kwargs(bad)


def test_dict_tokenizer_keeps_halfwidth_katakana_and_fullwidth_alnum(
        spark, duck):
    """Review r09 #5: halfwidth katakana and fullwidth letters/digits
    are text, not punctuation — they must emit as unigram fallback
    tokens; fullwidth punctuation still drops. All three lowerings."""
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, fmm_pattern, py_tokenize, tokenize)
    kw = analyzer_kwargs({"tokenizer": {"type": "dict", "words": ["北京"]}})
    text = "ｶﾀｶﾅ１２３ＡＢ：北京！ok"
    want = ["ｶ", "ﾀ", "ｶ", "ﾅ", "１", "２", "３", "ａ", "ｂ",
            "北京", "ok"]
    assert py_tokenize(text, **kw) == want
    df = spark.createDataFrame([(text,)], "body string")
    got = df.select(tokenize(F.col("body"), **kw).alias("g")).collect()[0]
    assert got["g"] == want
    pat = fmm_pattern(kw["dict_words"], kw["lowercase"])
    d = duck.execute("SELECT regexp_extract_all(lower(?), ?)",
                     [text, pat]).fetchone()[0]
    assert d == want


def test_dict_tokenizer_ascii_word_precedence(spark, duck):
    """ADVICE r09: ascii dict words take precedence over run
    tokenization — words=('spark',) tokenizes 'sparks' as
    ['spark', 's'] (FMM applied uniformly; an RE2-compatible boundary
    guard does not exist because RE2 has no lookahead). Documented in
    fmm_pattern; pinned here across all three lowerings."""
    from pyspark.sql import functions as F
    from vectordb_testbricks_spark.functions.text import (
        analyzer_kwargs, fmm_pattern, py_tokenize, tokenize)
    kw = analyzer_kwargs({"tokenizer": {
        "type": "dict", "words": ["spark stream", "stream", "spark"]}})
    cases = {
        "sparks": ["spark", "s"],
        "Spark streaming": ["spark stream", "ing"],
        # a dict word strictly INSIDE a run does not win — leftmost-first
        # starts the run branch at position 0 and it consumes the run
        "restream": ["restream"],
        "plain words": ["plain", "words"],
    }
    pat = fmm_pattern(kw["dict_words"], kw["lowercase"])
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(cases)], "id bigint, body string")
    got = {r.id: r.g for r in df.select(
        "id", tokenize(F.col("body"), **kw).alias("g")).collect()}
    for i, (text, want) in enumerate(cases.items()):
        assert py_tokenize(text, **kw) == want, text
        assert got[i] == want, text
        d = duck.execute("SELECT regexp_extract_all(lower(?), ?)",
                         [text, pat]).fetchone()[0]
        assert d == want, text
