"""Grouped ranking-metric (NDCG/MAP/MRR) tests — hand-computed oracles
using the SAME literal integer weights the operator embeds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from hybridbackend_spark.functions.rankmetrics import (
    dcg_weights,
    ranking_metrics,
)


def _rows(group, rels):
    """Items with descending score = list order; rel per position."""
    return [
        (group, float(len(rels) - i), i, int(r)) for i, r in enumerate(rels)
    ]


def _run(spark, data, k=10):
    df = spark.createDataFrame(data, "g long, score double, tb long, rel long")
    out = ranking_metrics(
        df, "g", score=F.col("score"), rel=F.col("rel"),
        tiebreak=F.col("tb"), k=k,
    )
    return {r.g: r for r in out.collect()}


def test_hand_computed_metrics(spark):
    # group 1: rel pattern 0,1,0,1 -> first=2, AP=(1/2 + 2/4)/2 = 0.5
    res = _run(spark, _rows(1, [0, 1, 0, 1]) + _rows(2, [1, 1, 1]))
    w = dcg_weights(10)
    cw = [sum(w[: i + 1]) for i in range(10)]
    r1 = res[1]
    assert r1.n_items == 4 and r1.n_rel == 2 and r1.first_rank == 2
    lcm = math.lcm(*range(1, 11))
    assert r1.ap_num == 1 * (lcm // 2) + 2 * (lcm // 4)
    assert r1.dcg_num == w[1] + w[3]
    assert r1.idcg_num == cw[1]
    assert r1.mrr == 1.0 / 2
    assert r1.map_k == r1.ap_num / (2 * lcm)
    assert r1.ndcg_k == (w[1] + w[3]) / cw[1]
    assert abs(r1.map_k - 0.5) < 1e-12
    # group 2: perfect ranking -> ndcg exactly 1.0, map exactly 1.0
    r2 = res[2]
    assert r2.ndcg_k == 1.0 and r2.map_k == 1.0 and r2.mrr == 1.0


def test_zero_relevant_group_is_zero_not_error(spark):
    r = _run(spark, _rows(5, [0, 0, 0]))[5]
    assert r.n_rel == 0 and r.first_rank == 0
    assert r.mrr == 0.0 and r.map_k == 0.0 and r.ndcg_k == 0.0
    assert r.idcg_num == 0


def test_cutoff_ignores_items_past_k(spark):
    # relevant item at position 5 with k=4 contributes nothing
    r = _run(spark, _rows(9, [0, 0, 0, 0, 1]), k=4)[9]
    assert r.first_rank == 0 and r.dcg_num == 0 and r.ap_num == 0
    # but n_rel counts the whole group, and IDCG@k stays bounded by k
    assert r.n_rel == 1 and r.idcg_num == dcg_weights(4)[0]
    assert r.ndcg_k == 0.0


def test_tiebreak_makes_order_deterministic(spark):
    # two items with the same score: tiebreak ascending decides ranks
    data = [(3, 1.0, 2, 1), (3, 1.0, 1, 0)]
    r = _run(spark, data)[3]
    # tb=1 (rel 0) ranks first, tb=2 (rel 1) second
    assert r.first_rank == 2


def test_k_validation():
    with pytest.raises(ValueError):
        ranking_metrics(None, "g", F.lit(1), F.lit(1), F.lit(1), k=0)


def test_target_encode_loo_leakage_and_shrinkage(spark):
    from hybridbackend_spark.functions.feature import target_encode_loo

    # cat A: labels 1,1,0 ; cat B: 0 ; global: n=4, pos=2, prior=1/2
    data = [(1, "A", 1), (2, "A", 1), (3, "A", 0), (4, "B", 0)]
    df = spark.createDataFrame(data, "rid long, cat string, y long")
    out = {r.rid: r for r in
           target_encode_loo(df, "cat", "y", alpha=2).collect()}
    # row 1 (A, y=1): LOO pos = 1, enc = (1*4 + 2*2) / ((3-1+2)*4) = 8/16
    assert out[1].te_num == 8 and out[1].te_den == 16
    assert out[1].te == 0.5
    # row 3 (A, y=0): LOO pos = 2, enc = (2*4 + 4)/16 = 12/16
    assert out[3].te == 0.75
    # row 4 (B, y=0): n_c=1 -> pure prior: (0 + 4)/((0+2)*4) = 4/8
    assert out[4].te == 0.5
    # leakage check: rows 1 and 3 in the same category differ ONLY via
    # their own label exclusion
    assert out[1].te != out[3].te


def test_ngram_repetition_counts(spark):
    from hybridbackend_spark.operators.text import ngram_repetition

    df = spark.createDataFrame(
        [
            (1, "a b a b a b"),      # trigrams: aba bab aba bab -> 2 distinct
            (2, "x y"),              # too short for trigrams
            (3, "one two three"),    # exactly one trigram
        ],
        "doc_id long, text string",
    )
    cols = ngram_repetition("text", 3)
    out = {
        r.doc_id: r
        for r in df.select(
            "doc_id",
            cols["ngram3_total"].alias("t"),
            cols["ngram3_distinct"].alias("d"),
        ).collect()
    }
    assert (out[1].t, out[1].d) == (4, 2)
    assert (out[2].t, out[2].d) == (0, 0)
    assert (out[3].t, out[3].d) == (1, 1)
