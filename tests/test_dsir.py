"""DSIR importance resampling (operators.dsir) vs a brute-force Python
reference: hashed bigram features, Laplace-smoothed log ratios, per-doc
scores, deterministic Gumbel-top-k selection."""

import hashlib
import math
import re

import pytest
from pyspark.sql import Row

from companycatalogcrawlerparser_spark.operators import dsir as DS

B = 64  # tiny bucket space: forces collisions AND unseen buckets


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower()) if t is not None else None


def _py_features(text, n=2, num_buckets=B):
    if text is None:
        return []
    toks = _norm(text).split(" ")
    return [
        int(
            hashlib.md5(
                " ".join(toks[i : i + n]).encode()
            ).hexdigest()[:15],
            16,
        )
        % num_buckets
        for i in range(max(0, len(toks) - n + 1))
    ]


def _py_ratios(target, raw, alpha=0.5, num_buckets=B):
    tc, rc = [0] * num_buckets, [0] * num_buckets
    for _, t in target:
        for b in _py_features(t):
            tc[b] += 1
    for _, t in raw:
        for b in _py_features(t):
            rc[b] += 1
    T, R = sum(tc), sum(rc)
    return [
        math.log((tc[b] + alpha) / (T + alpha * num_buckets))
        - math.log((rc[b] + alpha) / (R + alpha * num_buckets))
        for b in range(num_buckets)
    ]


def _py_scores(docs, target, raw):
    lr = _py_ratios(target, raw)
    return {
        i: (sum(lr[b] for b in _py_features(t)), len(_py_features(t)))
        for i, t in docs
    }


def _py_gumbel(doc_id, salt=""):
    g = int(
        hashlib.md5(f"{doc_id}{salt}".encode()).hexdigest()[:8], 16
    ) % 10000
    u = (g + 0.5) / 10000.0
    return -math.log(-math.log(u))


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows], "doc_id long, text string"
    )


TARGET = [
    (0, "clean formal prose about science and method"),
    (1, "formal prose about careful science experiments"),
]
RAW = [
    (10, "clean formal prose about science and method today"),
    (11, "buy cheap pills now click here buy now"),
    (12, "careful science experiments with formal prose about science"),
    (13, "click click here cheap cheap pills pills"),
    (14, "short"),
    (15, None),
]


class TestDsir:
    def test_features_match_python(self, spark):
        got = {}
        for r in DS.dsir_features(_mk(spark, RAW), num_buckets=B).collect():
            got.setdefault(r["doc_id"], []).append(r["bucket"])
        for i, t in RAW:
            assert sorted(got.get(i, [])) == sorted(_py_features(t)), i

    def test_log_ratios_match_python(self, spark):
        ratios = {
            r["bucket"]: r["log_ratio"]
            for r in DS.dsir_log_ratios(
                _mk(spark, TARGET), _mk(spark, RAW), num_buckets=B
            ).collect()
        }
        exp = _py_ratios(TARGET, RAW)
        assert sorted(ratios) == list(range(B))  # ALL buckets present
        for b in range(B):
            assert ratios[b] == pytest.approx(exp[b], abs=1e-12), b

    def test_scores_match_python_and_total_decoration(self, spark):
        docs = _mk(spark, RAW)
        ratios = DS.dsir_log_ratios(docs.filter("doc_id < 0"), docs,
                                    num_buckets=B)
        # target = the TARGET corpus for the real check
        ratios = DS.dsir_log_ratios(_mk(spark, TARGET), docs, num_buckets=B)
        scored = {r["doc_id"]: r for r in
                  DS.dsir_scores(docs, ratios, num_buckets=B).collect()}
        exp = _py_scores(RAW, TARGET, RAW)
        assert set(scored) == {i for i, _ in RAW}  # total decoration
        for i, (s, nf) in exp.items():
            assert scored[i]["dsir_score"] == pytest.approx(s, abs=1e-9), i
            assert scored[i]["n_features"] == nf
        # featureless docs score 0 exactly
        assert scored[14]["dsir_score"] == 0.0 and scored[14]["n_features"] == 0
        assert scored[15]["dsir_score"] == 0.0

    def test_target_like_docs_rank_higher(self, spark):
        docs = _mk(spark, RAW)
        ratios = DS.dsir_log_ratios(_mk(spark, TARGET), docs, num_buckets=B)
        s = {r["doc_id"]: r["dsir_score"]
             for r in DS.dsir_scores(docs, ratios, num_buckets=B).collect()}
        # the two target-like docs beat the two spammy ones
        assert min(s[10], s[12]) > max(s[11], s[13])

    def test_select_topk_and_gumbel(self, spark):
        docs = _mk(spark, RAW)
        ratios = DS.dsir_log_ratios(_mk(spark, TARGET), docs, num_buckets=B)
        scored = DS.dsir_scores(docs, ratios, num_buckets=B)
        plain = DS.dsir_select(scored, 2, gumbel=False)
        # scores: 10 ≈ 0.61, featureless 14/15 = 0.0 (tie → lower id),
        # 12 ≈ −0.49 — plain argmax-2 is {10, 14}
        assert {r["doc_id"] for r in plain.collect()} == {10, 14}
        exp_scores = _py_scores(RAW, TARGET, RAW)
        want = sorted(
            ((exp_scores[i][0] + _py_gumbel(i), -i), i) for i, _ in RAW
        )[-3:]
        got = DS.dsir_select(scored, 3, gumbel=True)
        assert {r["doc_id"] for r in got.collect()} == {i for _, i in want}

    def test_partition_invariance(self, spark):
        docs = _mk(spark, RAW)
        ratios = DS.dsir_log_ratios(_mk(spark, TARGET), docs, num_buckets=B)
        a = DS.dsir_select(
            DS.dsir_scores(docs, ratios, num_buckets=B), 3
        )
        b = DS.dsir_select(
            DS.dsir_scores(docs.repartition(7), ratios, num_buckets=B), 3
        )
        assert {r["doc_id"] for r in a.collect()} == {
            r["doc_id"] for r in b.collect()
        }

    def test_ratio_plan_is_broadcast(self, spark):
        docs = _mk(spark, RAW)
        ratios = DS.dsir_log_ratios(_mk(spark, TARGET), docs, num_buckets=B)
        plan = DS.dsir_scores(docs, ratios, num_buckets=B)._jdf.queryExecution(
        ).executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
