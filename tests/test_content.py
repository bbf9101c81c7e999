"""Main-content extraction (operators.content vs refsem.content).

The hard check is the driver row (x9_h8_probe kind='content': every
webgen corpus page's kept|blocks|md5 vs the stdlib twin); these pin
the block semantics on hand-crafted html so failures localize.
"""

from pyspark.sql import functions as F

from companycatalogcrawlerparser_spark.operators import content as C
from companycatalogcrawlerparser_spark.refsem import content as RC

PROSE = (
    "Компания выполняет работы по договору в установленный срок и "
    "несёт гарантийные обязательства перед заказчиком."
)
NAV = (
    '<a href="/">Home</a> <a href="/about">About</a> '
    '<a href="/contact">Contact</a> <a href="/news">News</a>'
)
HTML = (
    "<html><head><title>t</title>"
    "<style>p { color: red }</style></head><body>"
    f"<nav>{NAV}</nav>"
    f"<p>{PROSE}</p>"
    "<p>short</p>"
    "<!-- a comment with enough characters to pass the length gate -->"
    "<script>var x = 'plenty of characters here to pass the gate';"
    "</script>"
    f"<div>Подробнее: <a href=\"/more\">тут</a>. {PROSE}</div>"
    "</body></html>"
)


def _run(spark, html):
    df = spark.createDataFrame(
        [("u", html)], "page_url string, html string"
    )
    return C.main_content(df).collect()[0]


class TestMainContent:
    def test_keeps_prose_drops_nav_script_style_comment(self, spark):
        r = _run(spark, HTML)
        assert PROSE in r["main_text"]
        assert "Подробнее" in r["main_text"]
        # nav link farm, short block, script/style/comment all gone
        for bad in ("Home", "short", "color: red", "plenty of"):
            assert bad not in r["main_text"]
        assert 0 < r["n_kept"] < r["n_blocks"]

    def test_document_order_preserved(self, spark):
        html = f"<p>AAAA {PROSE}</p><p>ZZZZ {PROSE}</p><p>MMMM {PROSE}</p>"
        r = _run(spark, html)
        lines = r["main_text"].split("\n")
        assert [ln[:4] for ln in lines] == ["AAAA", "ZZZZ", "MMMM"]

    def test_total_decoration_empty_and_null(self, spark):
        df = spark.createDataFrame(
            [("a", ""), ("b", None), ("c", "<p>x</p>")],
            "page_url string, html string",
        )
        out = {r["page_url"]: r for r in C.main_content(df).collect()}
        assert set(out) == {"a", "b", "c"}
        for u in ("a", "b"):
            assert out[u]["main_text"] == "" and out[u]["n_kept"] == 0
        assert out["c"]["n_kept"] == 0  # 'x' is under min_chars

    def test_link_density_gate_boundary(self, spark):
        # exactly at the 35% boundary: kept (<=); just above: dropped.
        # anchor share includes the collapse-inserted space (the
        # documented approximation): alen = anchor_chars + 1
        at = f"<p><a href='/'>{'x' * 34}</a>{'y' * 65}</p>"     # 35/100
        above = f"<p><a href='/'>{'x' * 35}</a>{'y' * 64}</p>"  # 36/100
        df = spark.createDataFrame(
            [("at", at), ("above", above)], "page_url string, html string"
        )
        out = {r["page_url"]: r["n_kept"] for r in C.main_content(df).collect()}
        assert out == {"at": 1, "above": 0}

    def test_matches_python_twin_on_edge_html(self, spark):
        cases = [
            HTML,
            "",
            "no tags at all just a long enough run of plain text here",
            "<br><br><p></p>",
            f"<TABLE><TR><TD>{PROSE}</TD></TR></TABLE>",
            f"<p>{PROSE}<!--x--></p><script>{PROSE}</script>",
        ]
        df = spark.createDataFrame(
            [(str(i), h) for i, h in enumerate(cases)],
            "page_url string, html string",
        )
        got = {
            r["page_url"]: (r["main_text"], r["n_blocks"], r["n_kept"])
            for r in C.main_content(df).collect()
        }
        for i, h in enumerate(cases):
            assert got[str(i)] == RC.main_content(h), f"case {i}"

    def test_to_markdown_structure(self, spark):
        html = (
            "<h1>Title</h1><p>Intro <b>bold</b> and <em>italic</em>.</p>"
            '<ul><li>one</li><li><a href="/x">two</a></li></ul>'
            "<h3>Sub</h3><script>nope()</script>"
        )
        df = spark.createDataFrame(
            [("u", html)], "page_url string, html string"
        )
        got = df.select(
            C.to_markdown(F.col("html")).alias("m")
        ).collect()[0]["m"]
        assert got == RC.to_markdown(html)
        assert got.startswith("# Title")
        assert "**bold**" in got and "*italic*" in got
        assert "\n- one" in got and "- [two](/x)" in got
        assert "### Sub" in got and "nope" not in got

    def test_to_markdown_twin_on_corpus_edge_cases(self, spark):
        cases = [
            "",
            "<a href=unquoted>x</a> plain",   # non-double-quoted href
            "<p>a</p>\n\n\n\n<p>b</p>",       # newline collapse
            "<H2>UP</H2><LI>caps</LI>",       # case-insensitive tags
        ]
        df = spark.createDataFrame(
            [(str(i), h) for i, h in enumerate(cases)],
            "page_url string, html string",
        )
        got = {
            r["page_url"]: r["m"]
            for r in df.select(
                "page_url", C.to_markdown(F.col("html")).alias("m")
            ).collect()
        }
        for i, h in enumerate(cases):
            assert got[str(i)] == RC.to_markdown(h), f"case {i}"

    def test_plan_is_codegen_only(self, spark):
        df = spark.createDataFrame(
            [("u", HTML)] * 4, "page_url string, html string"
        )
        plan = (
            C.main_content(df)._jdf.queryExecution().executedPlan().toString()
        )
        # no Python in the path; one shuffle (the per-page reassembly)
        assert "EvalPython" not in plan
        assert plan.count("Exchange hashpartitioning") <= 2
