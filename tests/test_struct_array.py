"""StructArray / embedding-list element-level prototypes (3.0 roadmap
§1) vs plain-Python references: entity-scope predicates must stay
un-exploded (plan-asserted), element hits carry addressable paths, and
embedding-list search matches brute force in both scopes."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def sa_rows():
    rnd = random.Random(17)
    rows = []
    for i in range(24):
        els = [{"tag": f"t{rnd.randrange(5)}", "val": rnd.randrange(100)}
               for _ in range(rnd.randrange(0, 5))]   # 0 elements happens
        rows.append((i, els))
    return rows


@pytest.fixture(scope="module")
def sa_df(spark, sa_rows):
    return spark.createDataFrame(
        sa_rows, "id long, items array<struct<tag string, val int>>")


def test_element_exists_and_count_stay_unexploded(sa_df, sa_rows):
    from vectordb_testbricks_spark.operators.struct_array import (
        element_count, element_exists)
    pred = lambda e: (e["tag"] == "t2") & (e["val"] > 40)   # noqa: E731
    got = sorted(r.id for r in sa_df.filter(
        element_exists("items", pred)).collect())
    want = sorted(i for i, els in sa_rows
                  if any(e["tag"] == "t2" and e["val"] > 40 for e in els))
    assert got == want
    counts = {r.id: r.n for r in sa_df.select(
        "id", element_count("items", pred).alias("n")).collect()}
    for i, els in sa_rows:
        assert counts[i] == sum(
            1 for e in els if e["tag"] == "t2" and e["val"] > 40), i
    # the entity-scope plan must contain NO Generate (explode) node —
    # the HOF evaluates inside the scan stage
    plan = sa_df.filter(element_exists("items", pred)) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan, plan


def test_element_filter_hits_carry_addressable_paths(sa_df, sa_rows):
    from vectordb_testbricks_spark.operators.struct_array import (
        element_filter_hits)
    hits = element_filter_hits(sa_df, "items", "id",
                               lambda e: e["val"] >= 80)
    got = sorted((r.id, r.element_idx, r.element.val)
                 for r in hits.collect())
    want = sorted((i, j, e["val"]) for i, els in sa_rows
                  for j, e in enumerate(els) if e["val"] >= 80)
    assert got == want


@pytest.fixture(scope="module")
def el_rows():
    rnd = random.Random(29)
    rows = []
    for i in range(30):
        vecs = [[rnd.uniform(-1, 1) for _ in range(4)]
                for _ in range(rnd.randrange(1, 4))]
        rows.append((i, vecs))
    return rows


@pytest.fixture(scope="module")
def el_df(spark, el_rows):
    return spark.createDataFrame(
        el_rows, "id long, embs array<array<double>>")


_Q = [0.3, -0.7, 0.5, 0.1]


def _cos(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / (math.sqrt(sum(x * x for x in a))
                  * math.sqrt(sum(y * y for y in b)))


def _l2(a, b):
    return sum((x - y) ** 2 for x, y in zip(a, b))


@pytest.fixture(scope="module")
def qdf(spark):
    return spark.createDataFrame([(0, _Q)],
                                 "query_id int, qvec array<double>")


def test_embedding_list_search_element_scope(el_df, el_rows, qdf):
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    hits = embedding_list_search(el_df, qdf, "embs", "id",
                                 metric="COSINE", k=7, scope="element")
    got = [(r.id, r.element_idx, round(r.score, 9), r.rank)
           for r in hits.orderBy("rank").collect()]
    flat = sorted(((_cos(v, _Q), i, j) for i, vecs in el_rows
                   for j, v in enumerate(vecs)),
                  key=lambda t: (-t[0], t[1], t[2]))
    want = [(i, j, round(s, 9), r + 1)
            for r, (s, i, j) in enumerate(flat[:7])]
    assert got == want


def test_embedding_list_search_entity_maxsim(el_df, el_rows, qdf):
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    hits = embedding_list_search(el_df, qdf, "embs", "id",
                                 metric="COSINE", k=5, scope="entity")
    got = [(r.id, r.element_idx, round(r.score, 9), r.rank)
           for r in hits.orderBy("rank").collect()]
    per_entity = []
    for i, vecs in el_rows:
        scores = [_cos(v, _Q) for v in vecs]
        best = max(scores)
        per_entity.append((best, i, scores.index(best)))
    per_entity.sort(key=lambda t: (-t[0], t[1]))
    want = [(i, j, round(s, 9), r + 1)
            for r, (s, i, j) in enumerate(per_entity[:5])]
    assert got == want
    # every entity appears at most once at entity scope
    full = embedding_list_search(el_df, qdf, "embs", "id",
                                 metric="COSINE", k=1000, scope="entity")
    ids = [r.id for r in full.collect()]
    assert len(ids) == len(set(ids)) == len(el_rows)


def test_embedding_list_search_l2_ascending(el_df, el_rows, qdf):
    """The ascending-metric branch: entity score is the MINIMUM element
    distance and the argmax tie-break still picks the lowest idx."""
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    hits = embedding_list_search(el_df, qdf, "embs", "id",
                                 metric="L2", k=4, scope="entity")
    got = [(r.id, r.element_idx, round(r.score, 9))
           for r in hits.orderBy("rank").collect()]
    per_entity = []
    for i, vecs in el_rows:
        ds = [_l2(v, _Q) for v in vecs]
        best = min(ds)
        per_entity.append((best, i, ds.index(best)))
    per_entity.sort(key=lambda t: (t[0], t[1]))
    want = [(i, j, round(s, 9)) for s, i, j in per_entity[:4]]
    assert got == want


def test_embedding_list_search_with_filters(el_df, el_rows, qdf):
    """flt prunes entities, element_pred prunes elements before scoring
    — the roadmap's 'embedding-list search + element-level filter'
    composition."""
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    epred = lambda v: F.element_at(v, 1) > 0    # noqa: E731
    hits = embedding_list_search(
        el_df, qdf, "embs", "id", metric="COSINE", k=100, scope="entity",
        flt=F.col("id") % 2 == 0, element_pred=epred)
    got = {r.id: (r.element_idx, round(r.score, 9))
           for r in hits.collect()}
    want = {}
    for i, vecs in el_rows:
        if i % 2 != 0:
            continue
        kept = [(j0, v) for j0, v in enumerate(vecs) if v[0] > 0]
        if not kept:
            continue
        scores = [(_cos(v, _Q), j0) for j0, v in kept]
        s, j0 = max(scores, key=lambda t: (t[0], -t[1]))
        want[i] = (j0, round(s, 9))
    # element_idx addresses the STORED array position even under an
    # element filter (posexplode runs before the filter), so the hit
    # path $[idx] stays resolvable against the row
    assert got == want


def test_embedding_list_range_search(el_df, el_rows, qdf):
    """Element-level range search (roadmap §1): the radius/range_filter
    band prunes element scores before ranking; entity scope keeps an
    entity only if some element lands inside the band."""
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    lo, hi = 0.1, 0.6     # similarity band: radius < s <= range_filter
    el = embedding_list_search(el_df, qdf, "embs", "id",
                               metric="COSINE", k=1000, scope="element",
                               radius=lo, range_filter=hi)
    got = sorted((r.id, r.element_idx, round(r.score, 9))
                 for r in el.collect())
    want = sorted((i, j, round(s, 9)) for i, vecs in el_rows
                  for j, s in ((j, _cos(v, _Q))
                               for j, v in enumerate(vecs))
                  if lo < s <= hi)
    assert got == want and got        # band is non-empty by construction
    ent = embedding_list_search(el_df, qdf, "embs", "id",
                                metric="COSINE", k=1000, scope="entity",
                                radius=lo, range_filter=hi)
    ent_ids = sorted(r.id for r in ent.collect())
    assert ent_ids == sorted({i for i, _, _ in want})
    # distance metric flips the band direction: range_filter <= s < radius
    dl = embedding_list_search(el_df, qdf, "embs", "id",
                               metric="L2", k=1000, scope="element",
                               radius=2.0, range_filter=0.5)
    gd = sorted((r.id, r.element_idx) for r in dl.collect())
    wd = sorted((i, j) for i, vecs in el_rows
                for j, v in enumerate(vecs) if 0.5 <= _l2(v, _Q) < 2.0)
    assert gd == wd


def test_element_level_hybrid_search_composes_with_fusion(spark, el_df,
                                                          el_rows, qdf):
    """Element-level hybrid search (roadmap §1): an entity-scope
    embedding-list branch returns the standard ranked hit shape
    (query_id, id, score, rank), so it composes with rrf_fuse against
    any other branch unchanged — here a second element branch over a
    different query vector stands in for the text/BM25 modality."""
    from vectordb_testbricks_spark.operators.fusion import rrf_fuse
    from vectordb_testbricks_spark.operators.struct_array import (
        embedding_list_search)
    q2 = spark.createDataFrame([(0, [-0.5, 0.4, 0.8, -0.2])],
                               "query_id int, qvec array<double>")
    b1 = embedding_list_search(el_df, qdf, "embs", "id",
                               metric="COSINE", k=10, scope="entity")
    b2 = embedding_list_search(el_df, q2, "embs", "id",
                               metric="COSINE", k=10, scope="entity")
    fused = rrf_fuse([b1, b2], "id", k=5).collect()
    # python reference over the two branches' rank lists
    def ranks(qv):
        per = []
        for i, vecs in el_rows:
            per.append((max(_cos(v, qv) for v in vecs), i))
        per.sort(key=lambda t: (-t[0], t[1]))
        return {i: r + 1 for r, (_, i) in enumerate(per[:10])}
    r1, r2 = ranks(_Q), ranks([-0.5, 0.4, 0.8, -0.2])
    scores = {}
    for i in set(r1) | set(r2):
        scores[i] = sum(1.0 / (60 + rr[i]) for rr in (r1, r2) if i in rr)
    want = sorted(scores.items(), key=lambda t: (-t[1], t[0]))[:5]
    got = [(r.id, round(r.score, 9)) for r in
           sorted(fused, key=lambda r: r.rank)]
    assert got == [(i, round(s, 9)) for i, s in want]
