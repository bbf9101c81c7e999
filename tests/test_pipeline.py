"""curate_training_corpus: the composed curation chain as a product
surface — stage semantics, end-to-end determinism across partitionings,
and the optional atomic shard artifact."""

import hashlib

from companycatalogcrawlerparser_spark.plans.pipeline import (
    CurationConfig,
    curate_training_corpus,
    pages_to_docs,
)
from companycatalogcrawlerparser_spark.storage.snapshots import SnapshotStore

BASE = (
    "the quick brown fox jumps over the lazy dog while the crawler "
    "parses catalog pages and extracts company contact emails daily"
)


def _words(seed: str, n: int = 20) -> str:
    """n deterministic hex words — distinct char-5-shingle content per
    seed, so 'unique' docs are genuinely far apart in Jaccard space
    (a shared English preamble would near-dup-cluster them all)."""
    return " ".join(
        hashlib.md5(f"{seed}-{k}".encode()).hexdigest()[:8] for k in range(n)
    )


def _corpus(spark):
    rows = []
    for i in range(40):
        rows.append((i, f"document {i} {_words(str(i))}"))
    # an exact-dup chain: 100 == 101 == 102 (transitive cluster)
    rows += [(100, BASE), (101, BASE), (102, BASE)]
    # a doc carrying PII, textually unrelated to the dup cluster
    rows.append(
        (200, f"invoice notice {_words('pii')} reach admin@example.com "
              "or 495-123-45-67")
    )
    # a doc that IS a benchmark item (contaminated)
    rows.append((300, "benchmark evaluation prompt shared verbatim token"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bench(spark):
    return spark.createDataFrame(
        [(0, "benchmark evaluation prompt shared verbatim token")],
        "doc_id long, text string",
    )


CFG = CurationConfig(
    quality_min=0.0,          # tiny fixture: no quality drop
    sample_rates={"en": 10000},
    default_keep=10000,       # keep everything that survives
    shard_budget_tokens=100,
)


class TestCuratePipeline:
    def test_stage_semantics(self, spark, tmp_path):
        packed = curate_training_corpus(
            _corpus(spark), _bench(spark), CFG
        )
        rows = {r["doc_id"]: r for r in packed.collect()}
        # dedup: exactly one of the 100/101/102 cluster survives, and it
        # is the min-id representative
        assert 100 in rows and 101 not in rows and 102 not in rows
        # decontamination: the benchmark-identical doc is dropped
        assert 300 not in rows
        # PII: redacted in the output text
        assert "<EMAIL>" in rows[200]["text"]
        assert "<PHONE>" in rows[200]["text"]
        assert "admin@example.com" not in rows[200]["text"]
        # the 40 unique docs all survive
        assert all(i in rows for i in range(40))
        # train_pos is a 0..n-1 permutation; shard ids contiguous from 0
        pos = sorted(r["train_pos"] for r in rows.values())
        assert pos == list(range(len(rows)))
        sids = {r["shard_id"] for r in rows.values()}
        assert sids == set(range(max(sids) + 1))

    def test_deterministic_across_partitionings(self, spark):
        docs = _corpus(spark)
        a = curate_training_corpus(docs, _bench(spark), CFG)
        b = curate_training_corpus(
            docs.repartition(13, "doc_id"), _bench(spark), CFG
        )
        cols = ["doc_id", "lang", "n_tok", "train_pos", "shard_id"]
        assert sorted(map(tuple, a.select(cols).collect())) == sorted(
            map(tuple, b.select(cols).collect())
        )

    def test_shard_artifact(self, spark, tmp_path):
        store = SnapshotStore(spark, str(tmp_path / "store"))
        packed = curate_training_corpus(
            _corpus(spark), _bench(spark), CFG, store=store, round_id=7
        )
        n = packed.count()
        assert store.last_round() == 7
        sids = store.shard_ids(7)
        total = 0
        seen_pos = []
        for sid in sids:
            rows = store.read_shard(7, sid).collect()
            total += len(rows)
            seen_pos.extend(r["train_pos"] for r in rows)
        assert total == n
        # shard-sequential read is the global training order
        assert seen_pos == sorted(seen_pos)

    def test_gopher_stage(self, spark):
        import dataclasses

        docs = _corpus(spark).unionByName(
            spark.createDataFrame(
                [(400, "spam ham " * 40)], "doc_id long, text string"
            )
        )
        # fixture docs are short, so gate only on the repetition rule
        cfg = dataclasses.replace(
            CFG, gopher=True,
            gopher_thresholds={"dup5gram_frac": (None, 0.15)},
        )
        kept = {r["doc_id"] for r in
                curate_training_corpus(docs, None, cfg).collect()}
        assert 400 not in kept and 0 in kept and 100 in kept
        kept_off = {r["doc_id"] for r in
                    curate_training_corpus(docs, None, CFG).collect()}
        assert 400 in kept_off

    def test_exactsubstr_stage(self, spark):
        import dataclasses

        # two docs sharing a 6-token boilerplate run but otherwise far
        # apart in Jaccard space: both SURVIVE document-level dedup, and
        # the exactsubstr stage excises the shared run from BOTH
        boiler = "standard footer legal notice applies here"
        docs = _corpus(spark).unionByName(
            spark.createDataFrame(
                [
                    (500, f"{boiler} {_words('a')}"),
                    (501, f"{boiler} {_words('b')}"),
                    # boiler-only doc: far from 500/501 in Jaccard space
                    # (survives doc-level dedup) but excises to EMPTY —
                    # the pipeline must drop it
                    (502, boiler),
                ],
                "doc_id long, text string",
            )
        )
        cfg = dataclasses.replace(
            CFG, exactsubstr=True, exactsubstr_window=4
        )
        rows = {r["doc_id"]: r for r in
                curate_training_corpus(docs, _bench(spark), cfg).collect()}
        assert 500 in rows and 501 in rows
        assert 502 not in rows  # fully-excised doc dropped, not shipped empty
        for i in (500, 501):
            assert "footer" not in rows[i]["text"]
            assert rows[i]["text"].count(" ") == 19  # 20 hex words kept
            # pack budgets must see POST-removal token counts
            assert rows[i]["n_tok"] == 20
        # untouched docs keep their text (normalized form) and counts
        assert rows[0]["n_tok"] == 22
        # stage off → boilerplate retained
        rows_off = {r["doc_id"]: r for r in
                    curate_training_corpus(docs, _bench(spark), CFG)
                    .collect()}
        assert "footer" in rows_off[500]["text"]

    def test_domain_cap_stage(self, spark):
        import dataclasses

        rows = [
            (i, f"document {i} {_words(str(i))}",
             "mega.example" if i % 2 == 0 else f"tail{i % 5}.example")
            for i in range(60)
        ]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, domain string"
        )
        cfg = dataclasses.replace(
            CFG, domain_col="domain", domain_cap=10
        )
        out = curate_training_corpus(docs, None, cfg)
        got = out.collect()
        # helper rank column is internal; domain itself is carried
        assert "domain_rank" not in out.columns
        from collections import Counter

        per = Counter(r["domain"] for r in got)
        assert per["mega.example"] == 10  # 30 clean docs, capped
        assert all(
            per[f"tail{k}.example"] == 6 for k in range(5)
        )  # under cap: untouched
        # the capped survivor set is the md5-permutation prefix
        import hashlib

        mega = sorted(
            (i for i, _, d in rows if d == "mega.example"),
            key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
        )[:10]
        assert {r["doc_id"] for r in got if r["domain"] == "mega.example"
                } == set(mega)
        # cap off → everything survives
        assert curate_training_corpus(docs, None, CFG).count() == 60

    def test_dsir_stage(self, spark):
        import dataclasses

        docs = _corpus(spark)
        # target = the texts of docs 3 and 7 — those two docs (their
        # bigram distributions) must dominate the importance ranking
        target = spark.createDataFrame(
            [(0, f"document 3 {_words('3')}"),
             (1, f"document 7 {_words('7')}")],
            "doc_id long, text string",
        )
        cfg = dataclasses.replace(
            CFG, dsir_k=5, dsir_buckets=256, dsir_gumbel=False
        )
        out = curate_training_corpus(
            docs, None, cfg, dsir_target=target
        )
        got = {r["doc_id"]: r for r in out.collect()}
        assert len(got) == 5
        assert 3 in got and 7 in got
        assert "dsir_score" in out.columns
        assert min(got[3]["dsir_score"], got[7]["dsir_score"]) > max(
            r["dsir_score"] for i, r in got.items() if i not in (3, 7)
        )
        # stage off → no dsir column, nothing dropped by it
        off = curate_training_corpus(docs, None, CFG)
        assert "dsir_score" not in off.columns

    def test_lm_ppl_gate_stage(self, spark):
        import dataclasses

        import pytest

        docs = _corpus(spark)
        # reference = the texts of docs 0-9: those docs score head-ish
        # (their bigrams are IN the model); the md5-word docs beyond
        # share no bigrams and land in the tail
        ref = docs.filter("doc_id < 10").select("doc_id", "text")
        # measured per-token −logp under this ref: docs 0-9 = 4.594
        # (their bigrams ARE the model), md5-word docs 10-39 = 5.252,
        # BASE/pii/bench docs ≈ 5.36 — cutoffs sit mid-gap
        cfg = dataclasses.replace(
            CFG, lm_head_max=4.9, lm_tail_min=5.3, lm_keep=("head",)
        )
        out = curate_training_corpus(docs, None, cfg, lm_ref=ref)
        kept = {r["doc_id"] for r in out.select("doc_id").collect()}
        assert kept == set(range(10))
        # middle band = the out-of-model md5 docs; tail stays dropped
        cfg2 = dataclasses.replace(cfg, lm_keep=("head", "middle"))
        kept2 = {
            r["doc_id"]
            for r in curate_training_corpus(docs, None, cfg2, lm_ref=ref)
            .select("doc_id").collect()
        }
        assert kept2 == set(range(40))
        # helper columns don't leak into the packed frame
        assert not {"lm_logp", "n_lm_terms", "ppl", "__pb"} & set(
            out.columns
        )
        # per-language map (CCNet proper): 'en' covers the whole
        # fixture → same result as the scalar cutoffs
        cfg3 = dataclasses.replace(
            CFG, lm_cutoffs_by_lang={"en": (4.9, 5.3)}, lm_keep=("head",)
        )
        kept3 = {
            r["doc_id"]
            for r in curate_training_corpus(docs, None, cfg3, lm_ref=ref)
            .select("doc_id").collect()
        }
        assert kept3 == set(range(10))
        # a map that names NO present language and no scalar fallback →
        # every doc buckets 'middle' (kept by the default lm_keep)
        cfg4 = dataclasses.replace(
            CFG, lm_cutoffs_by_lang={"ru": (1.0, 2.0)}
        )
        n4 = curate_training_corpus(docs, None, cfg4, lm_ref=ref).count()
        assert n4 == curate_training_corpus(docs, None, CFG).count()
        # cutoffs are mandatory when the stage is enabled
        with pytest.raises(ValueError, match="lm_head_max"):
            curate_training_corpus(docs, None, CFG, lm_ref=ref)
        # stage off → nothing gated
        off = curate_training_corpus(docs, None, CFG)
        n_off = off.count()
        assert n_off > len(kept)

    def test_upsample_stage(self, spark):
        import dataclasses

        docs = _corpus(spark)
        cfg = dataclasses.replace(CFG, upsample_factor=2.0)
        out = curate_training_corpus(docs, None, cfg)
        base = curate_training_corpus(docs, None, CFG)
        n0 = base.count()
        rows = out.collect()
        assert len(rows) == 2 * n0
        # every kept doc appears with epochs {0, 1}, and train_pos is a
        # dense 0..2n-1 permutation (the copies got distinct positions)
        eps: dict = {}
        for r in rows:
            eps.setdefault(r["doc_id"], []).append(r["epoch"])
        assert all(sorted(v) == [0, 1] for v in eps.values())
        assert sorted(r["train_pos"] for r in rows) == list(
            range(2 * n0)
        )
        # copies scatter: at least one doc's two copies are not
        # adjacent in the stream
        gaps = [
            abs(a - b)
            for a, b in (
                tuple(
                    r["train_pos"] for r in rows if r["doc_id"] == d
                )
                for d in list(eps)[:10]
            )
        ]
        assert max(gaps) > 1
        assert "__mixkey" not in out.columns

    def test_html_to_shards_end_to_end(self, spark):
        """The full product story in one chain: crawled html pages →
        main-content extraction → the curation pipeline → packed
        training frame."""
        import dataclasses

        from companycatalogcrawlerparser_spark.sources import webgen

        rows = []
        for i in range(12):
            for p in webgen.generate_company_pages(i, filler_kb=1)[0]:
                if p["html"]:
                    rows.append((p["url"], p["html"]))
        pages = spark.createDataFrame(
            dict(rows).items(), "page_url string, html string"
        )
        docs = pages_to_docs(pages)
        # ids unique, text non-empty, boilerplate nav dropped
        n = docs.count()
        assert n > 0
        assert docs.select("doc_id").distinct().count() == n
        assert docs.filter("text = ''").count() == 0
        cfg = dataclasses.replace(CFG, jaccard_threshold=0.9)
        packed = curate_training_corpus(docs, None, cfg)
        out = packed.collect()
        assert len(out) > 0
        # the packed frame carries the trainer contract end-to-end
        assert sorted(r["train_pos"] for r in out) == list(
            range(len(out))
        )
        assert all(r["n_tok"] > 0 and r["shard_id"] >= 0 for r in out)

    def test_observations_wired(self, spark):
        from pyspark.sql import Observation

        obs = {"minhash": Observation(), "winnow": Observation()}
        packed = curate_training_corpus(
            _corpus(spark), None, CFG, observations=obs
        )
        packed.count()
        # metrics ride the producing jobs — both observable, no cap hit
        assert int(obs["minhash"].get["skipped_rows"] or 0) == 0
        assert int(obs["winnow"].get["skipped_rows"] or 0) == 0
