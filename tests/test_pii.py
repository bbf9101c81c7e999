"""PII detection/redaction: counts, redaction order, placeholder safety."""

from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.operators import pii as PII

DOCS = [
    (0, "reach Bob@Example.COM and sales@firm.co.uk for a quote"),
    (1, "call 495-123-45-67 or 812-555-01-02, server at 10.0.0.17"),
    (2, "no pii here at all, just text with numbers 12345"),
    (3, "mixed: a@b.io then 111-222-33-44 then 192.168.1.1 done"),
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
