"""Gopher/MassiveText repetition + format rules (textquality.gopher_*):
hand-computed fixtures, a pure-Python reference over random-ish docs, and
the threshold gate. The Spark implementation is the shuffle-free
sorted-array-run form; the reference here is the naive dict-count form —
two independent formulations of the pinned definitions (the DuckDB
relational twin is a third, hash-checked by the text_metrics driver row).
"""

import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.operators import textquality as TQ


def _norm(t):
    return re.sub(r"\s+", " ", (t or "").strip().lower())


def _words(t):
    return [w for w in _norm(t).split(" ") if w != ""]


def _lines(t):
    return [l.strip() for l in (t or "").split("\n") if l.strip() != ""]


def _grams(ws, n):
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def py_gopher(t):
    ls = _lines(t)
    lc = Counter(ls)
    n_lines = len(ls)
    dup_lines = sum(c for c in lc.values() if c > 1)
    line_chars = sum(len(l) for l in ls)
    dup_line_chars = sum(c * len(l) for l, c in lc.items() if c > 1)
    ws = _words(t)
    nl = max(len(_norm(t)), 1)
    out = {
        "dup_line_frac": round(dup_lines / max(n_lines, 1), 6),
        "dup_line_char_frac": round(dup_line_chars / max(line_chars, 1), 6),
    }
    for name, n in (("top2gram_frac", 2), ("top3gram_frac", 3)):
        gc = Counter(_grams(ws, n))
        if gc:
            # max count, ties -> lexicographically smallest gram
            best = min(gc.items(), key=lambda kv: (-kv[1], kv[0]))
            chars = best[1] * len(best[0])
        else:
            chars = 0
        out[name] = round(min(chars / nl, 1.0), 6)
    g5 = Counter(_grams(ws, 5))
    d5 = sum(c * len(g) for g, c in g5.items() if c > 1)
    out["dup5gram_frac"] = round(min(d5 / nl, 1.0), 6)
    raw = t or ""
    nsym = len(re.findall(r"#|\.{3}|…", raw))
    ntok = len(raw.split()) if raw.strip() else 0
    out["symbol_word_ratio"] = round(nsym / max(ntok, 1), 6)
    alpha = sum(1 for w in ws if re.search(r"[a-zа-яё]", w))
    out["alpha_word_frac"] = round(alpha / max(len(ws), 1), 6)
    return out


FIXTURES = [
    (1, "aaa line\naaa line\nbbb unique\n  \nccc here"),
    (2, "tok gram tok gram tok gram tail"),
    (3, "a b c d e a b c d e a b c d e"),
    (4, "no repeats at all in this one honestly"),
    (5, None),
    (6, ""),
    (7, "sym # test ... more … end"),
    (8, "снег идёт снег идёт снег идёт\nснег идёт снег идёт снег идёт"),
    (9, "x\n\n\nx\ny y y y y y y y y y y y y y y y y y y y"),
]


def _spark_metrics(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = TQ.gopher_metrics(F.col("text"))
    out = df.select("doc_id", *[v.alias(k) for k, v in m.items()])
    return {r["doc_id"]: r.asDict() for r in out.collect()}


class TestGopherMetrics:
    def test_matches_python_reference(self, spark):
        got = _spark_metrics(spark, FIXTURES)
        for doc_id, text in FIXTURES:
            want = py_gopher(text)
            have = {k: v for k, v in got[doc_id].items() if k != "doc_id"}
            assert have == want, (doc_id, have, want)

    def test_hand_computed(self, spark):
        got = _spark_metrics(spark, FIXTURES)
        # doc1: lines [aaa line x2, bbb unique, ccc here] -> 2/4 dup,
        # chars 16/34
        assert got[1]["dup_line_frac"] == 0.5
        assert got[1]["dup_line_char_frac"] == round(16 / 34, 6)
        # doc2: 'tok gram' x3 of len 8 over norm len 31
        assert got[2]["top2gram_frac"] == round(24 / 31, 6)
        # doc3: every 5-gram duplicated -> capped at 1
        assert got[3]["dup5gram_frac"] == 1.0
        # doc7: symbols #, ..., … = 3 over 7 words
        assert got[7]["symbol_word_ratio"] == round(3 / 7, 6)
        # null/empty docs: all-zero metrics, never NULL
        for d in (5, 6):
            assert all(
                v == 0.0 for k, v in got[d].items() if k != "doc_id"
            ), got[d]

    def test_deterministic_across_partitionings(self, spark):
        rows = [(i, f"w{i % 13} common word " * (i % 7 + 1)) for i in range(60)]
        df1 = spark.createDataFrame(rows, "doc_id long, text string")
        df2 = df1.repartition(17, "doc_id")
        m = TQ.gopher_metrics(F.col("text"))
        sel = lambda d: sorted(
            map(tuple, d.select("doc_id", *[v.alias(k) for k, v in m.items()])
                .collect())
        )
        assert sel(df1) == sel(df2)

    def test_gate(self, spark):
        clean = " ".join(f"word{i}" for i in range(80))  # no repeated gram
        rows = [
            (1, clean),
            (2, "spam spam spam spam spam " * 20),      # top2gram + dup5
            (3, "# " * 16 + clean),                     # symbol ratio > 0.1
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        m = TQ.gopher_metrics(F.col("text"))
        m["n_tokens"] = TQ.token_count(F.col("text"))
        out = {
            r["doc_id"]: r["p"]
            for r in df.select(
                "doc_id", TQ.gopher_gate(m).alias("p")
            ).collect()
        }
        assert out == {1: True, 2: False, 3: False}

    def test_gate_skips_missing_metrics(self, spark):
        df = spark.createDataFrame([(1, "ok " * 100)], "doc_id long, text string")
        # only one metric supplied: gate reduces to that single rule
        gate = TQ.gopher_gate({"symbol_word_ratio": F.lit(0.05)})
        assert df.select(gate.alias("p")).first()["p"] is True
