"""Crawl-ordering / URL-seen / email equality vs the oracle, plus
checkpoint-resume guarantees (BASELINE.json north_rule gates;
SURVEY.md §5 items 2/3/5).
"""

import pytest
from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.plans.crawl import (
    CrawlConfig,
    run_crawl,
)
from companycatalogcrawlerparser_spark.refsem import crawler as OC
from companycatalogcrawlerparser_spark.refsem.predicates import finalize_emails
from companycatalogcrawlerparser_spark.refsem.strings import canonicalize_url
from companycatalogcrawlerparser_spark.sources import webgen

N_COMPANIES = 40


def _oracle_corpus(pages_rows):
    return {
        p["url"]: OC.PageRec(
            html=p["html"].decode("utf-8") if p["html"] else None,
            status=p["status"],
            location=p["redirect_to"],
        )
        for p in pages_rows
    }


@pytest.fixture(scope="module")
def corpus():
    pages_rows, seeds_rows = webgen.build_corpus_local(N_COMPANIES)
    return pages_rows, seeds_rows


@pytest.fixture(scope="module")
def oracle_result(corpus):
    pages_rows, seeds_rows = corpus
    return OC.crawl(_oracle_corpus(pages_rows), seeds_rows)


@pytest.fixture(scope="module")
def spark_result(spark, corpus, tmp_path_factory):
    pages_rows, seeds_rows = corpus
    pages_df = spark.createDataFrame(pages_rows, schema=webgen.PAGES_SCHEMA)
    seeds_df = spark.createDataFrame(seeds_rows, schema=webgen.SEEDS_SCHEMA)
    out = str(tmp_path_factory.mktemp("crawl_out"))
    res = run_crawl(
        spark, pages_df, seeds_df, out,
        CrawlConfig(num_partitions=8, n_buckets=16),
    )
    return res


def _norm_trace(entries):
    """company_id → ordered [(priority, url, action)] (ordering, not raw
    seq values, is the pinned semantics — see admission.py docstring)."""
    by_company = {}
    for cid, prio, seq, url, action in entries:
        by_company.setdefault(cid, []).append((prio, seq, url, action))
    return {
        cid: [(p, u, a) for p, s, u, a in sorted(v, key=lambda t: (t[0], t[1]))]
        for cid, v in by_company.items()
    }


class TestCrawlEquality:
    def test_trace_equality(self, spark_result, oracle_result):
        got = _norm_trace(
            (r["company_id"], r["priority"], r["seq"], r["url"], r["action"])
            for r in spark_result["trace"].collect()
        )
        expected = _norm_trace(oracle_result.trace)
        assert set(got) == set(expected), "companies with fetch attempts differ"
        for cid in expected:
            assert got[cid] == expected[cid], f"trace mismatch for company {cid}"

    def test_url_seen_membership(self, spark_result, oracle_result):
        got = {
            (r["scope"], r["canonical_url"])
            for r in spark_result["url_seen"].collect()
        }
        expected = {("G", canonicalize_url(u)) for u in oracle_result.seen_seeds}
        for cid, urls in oracle_result.seen_extractor.items():
            expected |= {(str(cid), canonicalize_url(u)) for u in urls}
        assert got == expected

    def test_final_email_pairs(self, spark_result, oracle_result):
        got = {
            (r["company_id"], r["email"])
            for r in spark_result["email_pairs"].collect()
        }
        expected = set(finalize_emails(oracle_result.email_bag))
        assert got == expected

    def test_email_global_dedup_k5(self, spark_result, oracle_result):
        emails = spark_result["emails"].collect()
        texts = [r["email"] for r in emails]
        assert len(texts) == len(set(texts)), "emails dim must be unique on text"
        oracle_emails, oracle_links = OC.dedup_emails_global(
            finalize_emails(oracle_result.email_bag)
        )
        assert set(texts) == set(oracle_emails)
        # junction equality on (company, email-text)
        id2email = {r["email_id"]: r["email"] for r in emails}
        got_links = {
            (r["company_id"], id2email[r["email_id"]])
            for r in spark_result["company_email"].collect()
        }
        oid2email = {v: k for k, v in oracle_emails.items()}
        expected_links = {(cid, oid2email[eid]) for cid, eid in oracle_links}
        assert got_links == expected_links

    def test_flags_equality(self, spark_result, oracle_result):
        got = {
            r["company_id"]: (r["bad_url"], r["email_processed"], r["email_finded"])
            for r in spark_result["flags"].collect()
        }
        # oracle flags include skip-branch companies that the Spark plan
        # never selects (F9/A2 pruning happens before crawl) — compare on
        # the intersection of companies that actually crawled
        for cid, fl in got.items():
            assert fl == oracle_result.flags[cid], f"flags mismatch company {cid}"
        crawled = {cid for cid, *_ in oracle_result.trace}
        assert crawled <= set(got)

    def test_politeness_budget(self, spark_result):
        rows = spark_result["trace"].collect()
        by_host = {}
        for r in rows:
            by_host.setdefault((r["round"], r["host"]), []).append(
                (r["host_rank"], r["not_before"])
            )
        delay = CrawlConfig().delay_ms
        for (_, host), entries in by_host.items():
            entries.sort()
            for k, (rank, nb) in enumerate(entries):
                assert rank == k, f"host {host} ranks not dense"
                assert nb == k * delay, f"host {host} politeness stamp wrong"


class TestResume:
    def test_kill_and_resume_no_refetch(self, spark, corpus, tmp_path_factory):
        pages_rows, seeds_rows = corpus
        pages_df = spark.createDataFrame(pages_rows, schema=webgen.PAGES_SCHEMA)
        seeds_df = spark.createDataFrame(seeds_rows, schema=webgen.SEEDS_SCHEMA)
        out = str(tmp_path_factory.mktemp("crawl_resume"))

        # "kill" after round 0: run with max_depth=1 → only round 0 commits
        partial = run_crawl(
            spark, pages_df, seeds_df, out,
            CrawlConfig(max_depth=1, num_partitions=8, n_buckets=16),
        )
        round0_trace = [
            (r["company_id"], r["url"]) for r in partial["trace"].collect()
        ]

        # resume to full depth
        full = run_crawl(
            spark, pages_df, seeds_df, out,
            CrawlConfig(max_depth=2, num_partitions=8, n_buckets=16),
        )
        all_trace = [
            (r["round"], r["company_id"], r["url"]) for r in full["trace"].collect()
        ]
        # no URL fetched twice for the same company across the kill boundary
        pairs = [(c, u) for _, c, u in all_trace]
        assert len(pairs) == len(set(pairs)), "refetch across resume boundary"
        # round 0 was not recomputed: identical rows
        got_round0 = [(c, u) for rd, c, u in all_trace if rd == 0]
        assert sorted(got_round0) == sorted(round0_trace)

    def test_resumed_equals_uninterrupted(self, spark, corpus, spark_result, tmp_path_factory):
        pages_rows, seeds_rows = corpus
        pages_df = spark.createDataFrame(pages_rows, schema=webgen.PAGES_SCHEMA)
        seeds_df = spark.createDataFrame(seeds_rows, schema=webgen.SEEDS_SCHEMA)
        out = str(tmp_path_factory.mktemp("crawl_resume2"))
        run_crawl(spark, pages_df, seeds_df, out, CrawlConfig(max_depth=1, num_partitions=8, n_buckets=16))
        resumed = run_crawl(spark, pages_df, seeds_df, out, CrawlConfig(num_partitions=8, n_buckets=16))
        a = {(r["company_id"], r["email"]) for r in resumed["email_pairs"].collect()}
        b = {(r["company_id"], r["email"]) for r in spark_result["email_pairs"].collect()}
        assert a == b
