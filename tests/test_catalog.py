"""Catalog scrape plan tests — H1-H8 extraction through Spark UDTFs,
pagination explode, dedup, merge ops (SURVEY.md §3.1)."""

import hashlib

from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.plans import catalog as C
from companycatalogcrawlerparser_spark.operators import merge as M
from companycatalogcrawlerparser_spark.refsem import htmlparse as H
from companycatalogcrawlerparser_spark.sources import webgen


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, "url string, html binary, category_id long")


class TestCategoryExtract:
    def test_bizly_tree_parity(self, spark):
        html = webgen.bizly_catalog_page()
        df = _pages_df(spark, [("http://bizly.test/", html.encode(), 0)])
        got = [
            (r["category_id"], r["name"], r["parent_id"], r["href"], r["city_code"])
            for r in C.extract_categories(df, "bizly").collect()
        ]
        expected = H.get_div_row(H.parse_html(html))
        assert sorted(got) == sorted(expected)
        # structure: 2 roots, 2 sub-headers, 3 leaves with parent linkage
        roots = [r for r in got if r[0] < 1000]
        subs = [r for r in got if 1000 < r[0] < 100000]
        leaves = [r for r in got if r[0] > 100000]
        assert len(roots) == 2 and len(subs) == 2 and len(leaves) == 3
        assert all(l[2] in {s[0] for s in subs} for l in leaves)

    def test_company_extract_all_layouts(self, spark):
        cases = [
            ("bizly", webgen.bizly_company_page(), H.get_div_company),
            ("spravker", webgen.spravker_company_page(), H.get_div_companies),
            ("jsprav", webgen.jsprav_company_page(), H.get_nov_div_companies),
        ]
        for layout, html, oracle in cases:
            df = _pages_df(spark, [(f"http://{layout}.test/", html.encode(), 7)])
            key = lambda t: (t[0], t[1])  # noqa: E731 — None-safe sort key
            got = sorted(
                (
                    (r["company_seq"], r["category_id"], r["name"], r["address"],
                     r["phone"], r["timework"], r["site_url"])
                    for r in C.extract_companies(df, layout).collect()
                ),
                key=key,
            )
            expected = sorted(oracle(H.parse_html(html), 7), key=key)
            assert got == expected, layout

    def test_jsprav_quirk_q4_row_per_address_block(self, spark):
        html = webgen.jsprav_company_page()
        rows = H.get_nov_div_companies(H.parse_html(html), 1)
        # first org has TWO ul.address blocks → two rows; second has none → zero
        assert len(rows) == 2
        assert rows[0][0] == 1 and rows[1][0] == 1
        # base64 data-lnk overrides the visible url
        assert rows[0][6] == "http://jsp-firm.example.com"
        # second row accumulated the timework from the second block
        assert rows[1][5] == "8-17"

    def test_extracted_text_digest(self, spark):
        """Byte-identical extracted text per url (input_hint): the engine's
        text column equals the oracle InnerText digest."""
        pages_rows, _ = webgen.build_corpus_local(10)
        for p in pages_rows:
            oracle_text = H.parse_html(p["html"].decode()) .inner_text() if p["html"] else ""
            assert hashlib.sha256(p["text"].encode()).hexdigest() == hashlib.sha256(
                oracle_text.encode()
            ).hexdigest()


class TestPagination:
    def test_page_count_and_explode(self, spark):
        html = webgen.bizly_company_page(page=1, total_pages=4)
        df = _pages_df(spark, [("http://bizly.test/cat/x/", html.encode(), 3)])
        counts = C.extract_page_counts(df)
        assert counts.first()["page_count"] == 4
        urls = C.listing_urls(counts.withColumn("category_id", F.lit(3)))
        got = sorted(r["url"] for r in urls.collect())
        assert got == [
            "http://bizly.test/cat/x/page-2/",
            "http://bizly.test/cat/x/page-3/",
            "http://bizly.test/cat/x/page-4/",
        ]

    def test_querystring_template(self, spark):
        html = webgen.bizly_company_page(page=1, total_pages=2)
        df = _pages_df(spark, [("http://spr.test/cat/y", html.encode(), 3)])
        counts = C.extract_page_counts(df)
        urls = C.listing_urls(counts, template="?p-{n}")
        assert [r["url"] for r in urls.collect()] == ["http://spr.test/cat/y?p-2"]


class TestMergeOps:
    def test_insert_if_absent(self, spark):
        existing = spark.createDataFrame(
            [(1, "Ремонт", "77")], "id long, name string, city_code string"
        )
        new = spark.createDataFrame(
            [(2, "Ремонт", "77"), (3, "Торговля", "77"), (4, "Торговля", "77")],
            "id long, name string, city_code string",
        )
        out = M.insert_if_absent(existing, new, ["name", "city_code"])
        rows = {(r["name"], r["city_code"]): r["id"] for r in out.collect()}
        assert rows == {("Ремонт", "77"): 1, ("Торговля", "77"): 3}

    def test_upsert_emails_continues_ids(self, spark):
        emails = spark.createDataFrame(
            [(1, "a@b.com", False)], "email_id long, email string, bad_ignore_email boolean"
        )
        junction = spark.createDataFrame([(10, 1)], "company_id long, email_id long")
        pairs = spark.createDataFrame(
            [(10, "a@b.com"), (11, "a@b.com"), (11, "z@y.org")],
            "company_id long, email string",
        )
        e2, j2 = M.upsert_emails(emails, junction, pairs)
        em = {r["email"]: r["email_id"] for r in e2.collect()}
        assert em["a@b.com"] == 1 and em["z@y.org"] == 2
        got = {(r["company_id"], r["email_id"]) for r in j2.collect()}
        assert got == {(10, 1), (11, 1), (11, 2)}

    def test_update_flags(self, spark):
        comp = spark.createDataFrame(
            [(1, False, False), (2, False, False)],
            "company_id long, bad_url boolean, email_processed boolean",
        )
        upd = spark.createDataFrame(
            [(2, True, True)], "company_id long, bad_url boolean, email_processed boolean"
        )
        out = {r["company_id"]: (r["bad_url"], r["email_processed"]) for r in M.update_flags(comp, upd).collect()}
        assert out == {1: (False, False), 2: (True, True)}


class TestMailer:
    def test_resumable_batches(self, spark):
        from companycatalogcrawlerparser_spark.plans import mailer as ML

        emails = spark.createDataFrame(
            [(i, f"user{i}%40mail.test" if i == 3 else f"user{i}@mail.test", i == 5)
             for i in range(1, 8)],
            "email_id long, email string, bad_ignore_email boolean",
        )
        state = spark.createDataFrame([], "email_file_name string, last_id long")
        b1 = ML.next_batch(emails, state, "t.msg", batch_size=3).collect()
        assert [r["email_id"] for r in b1] == [1, 2, 3]
        assert b1[2]["send_address"] == "user3@mail.test"  # %40 fixup
        state = ML.commit_batch(state, spark, "t.msg", 3)
        b2 = ML.next_batch(emails, state, "t.msg", batch_size=3).collect()
        assert [r["email_id"] for r in b2] == [4, 6, 7]  # 5 is bad-flagged
