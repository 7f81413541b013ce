"""RankingEvaluator vs hand-computed recall/precision/MRR/nDCG."""

import math

import pytest

from flink_ml_spark.evaluation import RankingEvaluator


def _dcg(rels):
    return sum(r / math.log2(i + 2) for i, r in enumerate(rels))


@pytest.fixture()
def frames(spark):
    # query 1: preds [d1, d2, d3]; relevant {d1: 2, d3: 1, d9: 3}
    # query 2: preds [d5, d6]; no relevant docs at all
    preds = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (1, 3, 3), (2, 5, 1), (2, 6, 2)],
        "query_id bigint, doc_id bigint, rank int")
    truth = spark.createDataFrame(
        [(1, 1, 2.0), (1, 3, 1.0), (1, 9, 3.0), (3, 7, 1.0)],
        "query_id bigint, doc_id bigint, relevance double")
    return preds, truth


def test_ranking_metrics_hand_computed(spark, frames):
    preds, truth = frames
    out = {r["query_id"]: r for r in
           RankingEvaluator(k=3).transform(*frames)[0].collect()}

    q1 = out[1]
    assert (q1["n_relevant"], q1["hits"]) == (3, 2)
    assert q1["recall"] == pytest.approx(2 / 3)
    assert q1["precision"] == pytest.approx(2 / 3)
    assert q1["mrr"] == pytest.approx(1.0)  # rank-1 hit
    # DCG: rel2 at rank1 + rel1 at rank3; IDCG: rels [3,2,1]
    dcg = 2 / math.log2(2) + 1 / math.log2(4)
    idcg = _dcg([3.0, 2.0, 1.0])
    assert q1["ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)

    q2 = out[2]
    assert (q2["n_relevant"], q2["hits"]) == (0, 0)
    assert (q2["recall"], q2["mrr"], q2["ndcg"]) == (0.0, 0.0, 0.0)


def test_ranking_cutoff_filters_rank(spark, frames):
    preds, truth = frames
    out = {r["query_id"]: r for r in
           RankingEvaluator(k=2).transform(preds, truth)[0].collect()}
    # k=2 drops the rank-3 hit: hits 1, recall 1/3, precision 1/2
    q1 = out[1]
    assert q1["hits"] == 1
    assert q1["recall"] == pytest.approx(1 / 3)
    assert q1["precision"] == pytest.approx(0.5)
    # IDCG truncates to top-2 ideal rels [3, 2]
    dcg = 2 / math.log2(2)
    idcg = _dcg([3.0, 2.0])
    assert q1["ndcg"] == pytest.approx(dcg / idcg, abs=1e-12)


def test_ranking_perfect_retrieval(spark):
    preds = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id bigint, doc_id bigint, rank int")
    truth = spark.createDataFrame(
        [(1, 10, 2.0), (1, 11, 1.0)],
        "query_id bigint, doc_id bigint, relevance double")
    r = RankingEvaluator(k=2).transform(preds, truth)[0].collect()[0]
    assert r["recall"] == pytest.approx(1.0)
    assert r["ndcg"] == pytest.approx(1.0)
    assert r["mrr"] == pytest.approx(1.0)


def test_ranking_zero_relevance_rows_ignored(spark):
    """relevance = 0 rows are NOT relevant (graded truth convention)."""
    preds = spark.createDataFrame(
        [(1, 10, 1)], "query_id bigint, doc_id bigint, rank int")
    truth = spark.createDataFrame(
        [(1, 10, 0.0), (1, 11, 1.0)],
        "query_id bigint, doc_id bigint, relevance double")
    r = RankingEvaluator(k=5).transform(preds, truth)[0].collect()[0]
    assert (r["n_relevant"], r["hits"]) == (1, 0)
    assert r["ndcg"] == 0.0


def test_ranking_truth_only_query_emits_zero_row(spark):
    """A query the retriever returned NOTHING for must still appear with
    zero scores — silently dropping it overstates every macro average."""
    preds = spark.createDataFrame(
        [(1, 10, 1)], "query_id bigint, doc_id bigint, rank int")
    truth = spark.createDataFrame(
        [(1, 10, 1.0), (2, 20, 1.0), (2, 21, 2.0)],
        "query_id bigint, doc_id bigint, relevance double")
    rows = {r["query_id"]: r for r in
            RankingEvaluator(k=5).transform(preds, truth)[0].collect()}
    assert set(rows) == {1, 2}
    q2 = rows[2]
    assert (q2["n_relevant"], q2["hits"]) == (2, 0)
    assert q2["recall"] == 0.0 and q2["precision"] == 0.0
    assert q2["mrr"] == 0.0 and q2["ndcg"] == 0.0
    assert rows[1]["recall"] == pytest.approx(1.0)


def test_reciprocal_rank_fusion(spark):
    from flink_ml_spark.evaluation import ReciprocalRankFusion
    bm = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, doc_id long, rank int")
    ann = spark.createDataFrame(
        [(1, 11, 1), (1, 13, 2), (1, 10, 3),
         (2, 22, 1), (2, 20, 2)],
        "query_id long, doc_id long, rank int")
    out = ReciprocalRankFusion(k=3).transform(bm, ann)[0]
    rows = {(r["query_id"], r["rank"]): (r["doc_id"], r["rrf"])
            for r in out.collect()}
    # q1: doc 11 fuses ranks (2,1) -> 1/62+1/61; doc 10 (1,3) -> 1/61+1/63;
    # doc 12 (3,-) -> 1/63; doc 13 (-,2) -> 1/62.  Order: 11, 10, 12|13?
    # 1/63 (~.01587) > 1/62 (~.01613)? no: 1/62 > 1/63, so 13 beats 12.
    assert rows[(1, 1)][0] == 11
    assert rows[(1, 2)][0] == 10
    assert rows[(1, 3)][0] == 13
    assert abs(rows[(1, 1)][1] - (1 / 62 + 1 / 61)) < 1e-9
    # q2: doc 20 fuses (1,2) -> top; 22 (ann rank 1, 1/61) beats 21
    # (bm rank 2, 1/62)
    assert rows[(2, 1)][0] == 20
    assert rows[(2, 2)][0] == 22
    assert rows[(2, 3)][0] == 21
    # fewer than 2 runs is an error
    import pytest as _pt
    with _pt.raises(ValueError):
        ReciprocalRankFusion().transform(bm)


def test_rrf_run_order_invariance(spark):
    from flink_ml_spark.evaluation import ReciprocalRankFusion
    import random
    rnd = random.Random(3)
    runs = []
    for _ in range(3):
        rows = [(q, d, r + 1)
                for q in (1, 2)
                for r, d in enumerate(rnd.sample(range(100, 120), 8))]
        runs.append(spark.createDataFrame(
            rows, "query_id long, doc_id long, rank int"))
    f = ReciprocalRankFusion(k=5)
    a = sorted(tuple(r) for r in f.transform(*runs)[0].collect())
    b = sorted(tuple(r) for r in f.transform(*reversed(runs))[0].collect())
    assert a == b  # fusion is symmetric in its input runs
    # rrfK monotonicity sanity: scores shrink as the damping grows
    hi = ReciprocalRankFusion(k=5, rrfK=600).transform(*runs)[0]
    assert max(r["rrf"] for r in hi.collect()) < \
        max(r["rrf"] for r in f.transform(*runs)[0].collect())
