"""Model-based testing of the manager's DML surface.

A seeded random sequence of insert / upsert / partial_update / delete
operations runs twice: through the real CollectionManager (parquet
versions, CURRENT flips, partition routing) and through a trivial
in-memory dict model implementing the reference semantics
(latest-write-wins by PK; partial updates keep unmentioned columns;
delete-by-filter on compiled expressions). After every few steps and at
the end, the manager's visible state must equal the model exactly —
the interleavings this explores (upsert-after-delete, partial update
inserting a new PK, delete hitting a just-partial-updated row) are where
hand-written per-op tests historically miss bugs.
"""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from vectordb_testbricks_spark.manager import CollectionManager
from vectordb_testbricks_spark.schema import FieldSpec, SchemaSpec

N_STEPS = 18
CHECK_EVERY = 6


@pytest.fixture()
def mgr(spark, tmp_path):
    m = CollectionManager(spark, str(tmp_path / "wh"))
    m.create_collection(SchemaSpec("mdl", [
        FieldSpec("pk", "INT64", primary=True),
        FieldSpec("grp", "INT64", nullable=True),
        FieldSpec("txt", "VARCHAR", max_length=64, nullable=True),
    ]))
    return m


def _df(spark, rows):
    return spark.createDataFrame(rows, "pk long, grp long, txt string")


def _state(mgr):
    return {r.pk: (r.grp, r.txt)
            for r in mgr.read("mdl").select("pk", "grp", "txt").collect()}


def _rand_rows(rnd, n):
    return [(rnd.randrange(40), rnd.randrange(5), f"t{rnd.randrange(9)}")
            for _ in range(n)]


@pytest.mark.slow
def test_random_dml_sequences_match_model(spark, mgr):
    rnd = random.Random(29)
    model: dict[int, tuple] = {}
    for step in range(N_STEPS):
        op = rnd.randrange(4)
        if op == 0:  # insert a batch of FRESH pks (reference insert is
            #          append; duplicate-pk inserts are the upsert op's job)
            rows = [(pk, g, t) for pk, g, t in _rand_rows(rnd, 4)
                    if pk not in model]
            rows = list({r[0]: r for r in rows}.values())
            if not rows:
                continue
            mgr.insert("mdl", _df(spark, rows))
            for pk, g, t in rows:
                model[pk] = (g, t)
        elif op == 1:  # upsert: latest-write-wins, whole row
            rows = list({r[0]: r for r in _rand_rows(rnd, 3)}.values())
            mgr.upsert("mdl", _df(spark, rows))
            for pk, g, t in rows:
                model[pk] = (g, t)
        elif op == 2:  # partial update: only txt provided; grp keeps its
            #            old value for existing pks, NULL for new ones
            rows = list({r[0]: (r[0], r[2])
                         for r in _rand_rows(rnd, 3)}.values())
            mgr.partial_update(
                "mdl", spark.createDataFrame(rows, "pk long, txt string"))
            for pk, t in rows:
                old = model.get(pk)
                model[pk] = (old[0] if old else None, t)
        else:  # delete by a random filter over grp/pk
            kind = rnd.randrange(3)
            if kind == 0:
                g = rnd.randrange(5)
                flt = f"grp == {g}"
                doomed = [pk for pk, (gg, _) in model.items() if gg == g]
            elif kind == 1:
                lo = rnd.randrange(40)
                hi = lo + rnd.randrange(1, 10)
                flt = f"pk >= {lo} and pk <= {hi}"
                doomed = [pk for pk in model if lo <= pk <= hi]
            else:
                t = f"t{rnd.randrange(9)}"
                flt = f'txt == "{t}"'
                doomed = [pk for pk, (_, tt) in model.items() if tt == t]
            mgr.delete("mdl", flt)
            for pk in doomed:
                del model[pk]
        if step % CHECK_EVERY == CHECK_EVERY - 1:
            assert _state(mgr) == model, f"diverged after step {step}"
    assert _state(mgr) == model
    # the sequence must have actually exercised a populated collection
    assert len(model) > 5
