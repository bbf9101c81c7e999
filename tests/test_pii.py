"""PII detection/redaction: counts, redaction order, placeholder safety."""

from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.operators import pii as PII

DOCS = [
    (0, "reach Bob@Example.COM and sales@firm.co.uk for a quote"),
    (1, "call 495-123-45-67 or 812-555-01-02, server at 10.0.0.17"),
    (2, "no pii here at all, just text with numbers 12345"),
    (3, "mixed: a@b.io then 111-222-33-44 then 192.168.1.1 done"),
    # r7 forms: international +CC, paren-grouped, space-grouped
    (4, "intl +7 495-123-45-67 and +380-44-555-66-77 here"),
    (5, "office (812) 555-01-02 or (495)123-45-67 works"),
    (6, "spaced 495 123 45 67 rings too"),
    # r7 digit-boundary guards: sub-spans of longer runs must NOT match
    (7, "serial 1234.5.6.7890 and 1495-123-45-678 stay whole"),
    # r7 octet range: >255 or leading-zero octets are not IPv4
    (8, "bogus 999.1.1.1 and 256.1.1.1 and 010.0.0.1 but real 255.255.0.254"),
]


class TestPii:
    def _scores(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        return {
            r["doc_id"]: r
            for r in df.select(
                "doc_id",
                PII.pii_count(F.col("text"), "email").alias("e"),
                PII.pii_count(F.col("text"), "phone").alias("p"),
                PII.pii_count(F.col("text"), "ipv4").alias("i"),
                PII.redact_pii(F.col("text")).alias("red"),
            ).collect()
        }

    def test_counts(self, spark):
        got = self._scores(spark)
        assert (got[0]["e"], got[0]["p"], got[0]["i"]) == (2, 0, 0)
        assert (got[1]["e"], got[1]["p"], got[1]["i"]) == (0, 2, 1)
        assert (got[2]["e"], got[2]["p"], got[2]["i"]) == (0, 0, 0)
        assert (got[3]["e"], got[3]["p"], got[3]["i"]) == (1, 1, 1)

    def test_new_phone_forms(self, spark):
        got = self._scores(spark)
        # intl +CC: spaced and dashed groups both match
        assert got[4]["p"] == 2, got[4]
        # paren-grouped: with and without the space after ')'
        assert got[5]["p"] == 2, got[5]
        # space-grouped 3-3-2-2
        assert got[6]["p"] == 1, got[6]

    def test_digit_boundary_guards(self, spark):
        """ADVICE r6: sub-spans of longer digit runs must not be eaten —
        '1234.5.6.7890' used to redact '234.5.6.789' leaving stray
        digits around the placeholder."""
        got = self._scores(spark)
        assert (got[7]["p"], got[7]["i"]) == (0, 0), got[7]
        assert got[7]["red"] == DOCS[7][1]

    def test_ipv4_octet_range(self, spark):
        got = self._scores(spark)
        # 999.* / 256.* / leading-zero octets rejected; 255.255.0.254 kept
        assert got[8]["i"] == 1, got[8]
        assert "<IPV4>" in got[8]["red"] and "999.1.1.1" in got[8]["red"]
        assert "256.1.1.1" in got[8]["red"] and "010.0.0.1" in got[8]["red"]

    def test_redaction(self, spark):
        got = self._scores(spark)
        # case-insensitive via lowercasing; all spans replaced
        assert got[0]["red"] == (
            "reach <EMAIL> and <EMAIL> for a quote"
        )
        assert got[3]["red"] == (
            "mixed: <EMAIL> then <PHONE> then <IPV4> done"
        )
        # clean text passes through (lowercased) with nothing eaten
        assert got[2]["red"] == DOCS[2][1]
        # redacted output contains no residual matches of any pattern
        import re

        for r in got.values():
            for pat in PII.PII_PATTERNS.values():
                assert not re.search(pat, r["red"]), (pat, r["red"])
