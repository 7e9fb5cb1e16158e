"""BM25 ranking: differential against a plain-Python reference."""

import math

from hybridbackend_spark.operators.ranking import bm25_topk


def _py_bm25(corpus, terms, k1=1.2, b=0.75):
    toks = {i: t.lower().split() for i, t in corpus.items()}
    n = len(corpus)
    avgdl = sum(len(v) for v in toks.values()) / n
    tf = {}
    for i, ws in toks.items():
        for w in ws:
            if w in terms:
                tf[(i, w)] = tf.get((i, w), 0) + 1
    df = {}
    for (_, w), _c in tf.items():
        df[w] = df.get(w, 0) + 1
    scores = {}
    for (i, w), f in tf.items():
        idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
        s = idf * (f * (k1 + 1)) / (f + k1 * (1 - b + b * len(toks[i]) / avgdl))
        scores[i] = scores.get(i, 0.0) + s
    return scores


def test_bm25_matches_python_reference(spark):
    corpus = {
        0: "spark shuffle join hash join",
        1: "hash table scan",
        2: "window sort merge join spark spark",
        3: "totally unrelated words here",
        4: "join join join join hash",
    }
    terms = ["spark", "join", "hash"]
    df = spark.createDataFrame(list(corpus.items()), ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["score"], r["n_hits"])
        for r in bm25_topk(df, "doc_id", "text", terms, k=10).collect()
    }
    want = _py_bm25(corpus, set(terms))
    assert set(got) == set(want)  # doc 3 absent
    for i, expected in want.items():
        assert abs(got[i][0] - expected) < 1e-6
    # more query-term occurrences with same length profile -> higher score
    assert got[4][0] > got[1][0]
    # n_hits counts distinct matched terms
    assert got[0][1] == 3 and got[1][1] == 1


def test_bm25_topk_cutoff_deterministic(spark):
    rows = [(i, "join " * (i % 5 + 1)) for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    a = [r["doc_id"] for r in bm25_topk(df, "doc_id", "text", ["join"], k=7).collect()]
    b = [
        r["doc_id"]
        for r in bm25_topk(
            df.repartition(13), "doc_id", "text", ["join"], k=7
        ).collect()
    ]
    assert a == b and len(a) == 7


def test_item_similarity_exact_cosine_and_topk(spark):
    from hybridbackend_spark.operators.ranking import item_similarity

    # users: 1 buys {a,b}, 2 buys {a,b}, 3 buys {a,c}
    # |Ua|=3 |Ub|=2 |Uc|=1; co(a,b)=2, co(a,c)=1, co(b,c)=0
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "b"), (3, "a"), (3, "c")]
    df = spark.createDataFrame(rows, ["u", "i"])
    out = {(r["item"], r["neighbor"]): (r["n_common"], r["sim"])
           for r in item_similarity(df, "u", "i", k=5).collect()}
    import math
    assert out[("a", "b")] == (2, round(2 / math.sqrt(3 * 2), 6))
    assert out[("a", "c")] == (1, round(1 / math.sqrt(3 * 1), 6))
    assert ("b", "c") not in out  # no co-purchase -> no pair


def test_item_similarity_degree_cap_drops_power_user(spark):
    from hybridbackend_spark.operators.ranking import item_similarity

    rows = [(1, "a"), (1, "b")]                       # normal user
    rows += [(9, x) for x in "abcdefgh"]              # power user, degree 8
    df = spark.createDataFrame(rows, ["u", "i"])
    capped = item_similarity(df, "u", "i", k=10, max_user_degree=4)
    pairs = {(r["item"], r["neighbor"]) for r in capped.collect()}
    assert pairs == {("a", "b"), ("b", "a")}  # only user 1's signal remains


def test_rrf_fuse_ranks_and_nulls(spark):
    from hybridbackend_spark.operators.ranking import rrf_fuse

    a = spark.createDataFrame(
        [(1, 9.0), (2, 8.0), (3, 8.0), (4, 1.0)], "doc_id long, score double"
    )
    b = spark.createDataFrame(
        [(3, 0.9), (5, 0.8), (1, 0.7)], "doc_id long, cos double"
    )
    got = {
        r.doc_id: r
        for r in rrf_fuse(a, b, "doc_id", "score", "cos", k=3, c=60).collect()
    }
    # top-3 of a: 1 (rank 1), then 8.0-tie broken by id: 2 (2), 3 (3);
    # doc 4 cut by k. top-3 of b: 3, 5, 1.
    assert (got[1].rank_a, got[1].rank_b) == (1, 3)
    assert (got[2].rank_a, got[2].rank_b) == (2, None)
    assert (got[3].rank_a, got[3].rank_b) == (3, 1)
    assert (got[5].rank_a, got[5].rank_b) == (None, 2)
    assert 4 not in got
    assert got[1].rrf_score == round(1 / 61 + 1 / 63, 6)
    assert got[2].rrf_score == round(1 / 62, 6)
    assert got[3].rrf_score == round(1 / 63 + 1 / 61, 6)
    # fused order puts the double-hit docs first
    ordered = sorted(got.values(), key=lambda r: -r.rrf_score)
    assert {ordered[0].doc_id, ordered[1].doc_id} == {1, 3}


def test_rrf_fuse_no_unpartitioned_window(spark):
    from pyspark.sql import functions as F

    from hybridbackend_spark.operators.ranking import rrf_fuse
    from hybridbackend_spark.plans.inspect import has_unpartitioned_window

    a = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).cast("double").alias("score")
    )
    b = spark.range(100).select(
        F.col("id").alias("doc_id"), (F.col("id") % 5).cast("double").alias("cos")
    )
    out = rrf_fuse(a, b, "doc_id", "score", "cos", k=10)
    assert not has_unpartitioned_window(out)
