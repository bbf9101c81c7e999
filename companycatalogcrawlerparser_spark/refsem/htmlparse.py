"""DOM-walk extraction operators H1-H10 (SURVEY.md §2.9).

A minimal document-order DOM built on stdlib ``html.parser`` plus faithful
transcriptions of the reference's FSharp.Data walks
(``/root/reference/CrawlerParser/HtmlParsing.fs``). These functions are the
single source of truth for extraction: both the pytest oracle and the Spark
``mapInPandas`` extract stage call them, so extracted text is byte-identical
per url by construction (BASELINE.json input_hint).

Semantics pinned from FSharp.Data (public source):
- ``HasClass(c)`` / ``HasAttribute(n, v)`` — full attribute-value equality,
  case-insensitive (NOT token containment; the reference relies on this with
  multi-word classes like ``"list-item hover"``).
- ``InnerText()`` — concatenation of all descendant text nodes in document
  order, no separators; comments excluded.
- ``AttributeValue(n)`` — ``""`` when the attribute is absent.
- ``Descendants [tag]`` — document-order, the node itself excluded.
- ``Elements(tag)`` — direct children only.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Iterator, Optional

from .strings import decode_base64

_VOID_TAGS = {
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
}


@dataclass
class Node:
    tag: str  # "" for text nodes
    attrs: dict
    children: list = field(default_factory=list)
    text: str = ""

    # -- FSharp.Data-compatible accessors ---------------------------------
    def attribute_value(self, name: str) -> str:
        return self.attrs.get(name, "")

    def try_get_attribute(self, name: str) -> Optional[str]:
        return self.attrs.get(name)

    def has_attribute(self, name: str, value: str) -> bool:
        v = self.attrs.get(name)
        return v is not None and v.lower() == value.lower()

    def has_class(self, value: str) -> bool:
        return self.has_attribute("class", value)

    def has_id(self, value: str) -> bool:
        return self.has_attribute("id", value)

    def descendants(self, tag: str) -> Iterator["Node"]:
        for child in self.children:
            if child.tag == tag:
                yield child
            yield from child.descendants(tag)

    def elements(self, tag: str) -> list:
        return [c for c in self.children if c.tag == tag]

    def inner_text(self) -> str:
        parts = []

        def walk(n: "Node") -> None:
            if n.tag == "":
                parts.append(n.text)
                return
            for c in n.children:
                walk(c)

        walk(self)
        return "".join(parts)


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Node("#document", {})
        self.stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_startendtag(self, tag, attrs):
        node = Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self.stack[-1].children.append(node)

    def handle_endtag(self, tag):
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        self.stack[-1].children.append(Node("", {}, text=data))


def parse_html(html: str) -> Node:
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    return builder.root


# --------------------------------------------------------------------------
# H9 — (InnerText, href) pairs from a|link|area|base — Crawler.fs:17-28


def links(doc: Node, tag_name: str):
    out = []
    for x in doc.descendants(tag_name):
        href = x.try_get_attribute("href")
        if href is not None:
            out.append((x.inner_text(), href))
    return out


def href_links(doc: Node):
    return links(doc, "a") + links(doc, "link") + links(doc, "area") + links(doc, "base")


def search_link_results(doc: Node, base_url: str):
    """DOM twin of FindLinksRegExp — Crawler.fs:65-72."""
    from .extract import _distinct
    from .predicates import is_not_image_script_css_ext, not_social_network
    from .strings import convert_url, get_host

    if not base_url.endswith("/"):
        base_url = base_url + "/"
    host = get_host(base_url)
    pairs = [(name, convert_url(x, base_url)) for (name, x) in href_links(doc)]
    pairs = [
        (name, url)
        for (name, url) in pairs
        if host in url and not_social_network(url) and is_not_image_script_css_ext(url)
    ]
    return _distinct(pairs)


# --------------------------------------------------------------------------
# H1 — bizly-layout category tree — HtmlParsing.fs:10-40


def get_div_row(doc: Node):
    """Rows: (id, name, parent_id, href, city_code). Sequential counters:
    roots 1.., sub-headers 1001.., leaves 100001.. City code fixed "77"."""
    rows = []
    root_node_id = 0
    node_id = 1000
    node_href_id = 100000
    for x in doc.descendants("div"):
        if x.has_class("header"):
            att = x.try_get_attribute("class")
            if att == "header":
                root_node_id += 1
                rows.append((root_node_id, x.inner_text(), 0, None, "77"))
        if x.has_class("item") and x.inner_text().endswith(": "):
            node_id += 1
            rows.append((node_id, x.inner_text(), root_node_id, None, "77"))
        if x.has_class("item"):
            for a in x.descendants("a"):
                href = a.try_get_attribute("href")
                if href is not None:
                    node_href_id += 1
                    rows.append(
                        (node_href_id, a.inner_text().strip(), node_id, href.strip(), "77")
                    )
    return rows


# --------------------------------------------------------------------------
# H2 — jsprav-layout category tree — HtmlParsing.fs:42-84
# The nested show_all fetch is modeled via a `fetch` callback that returns a
# parsed sub-document for a URL (the corpus-lookup analogue of
# HtmlDocument.Load at HtmlParsing.fs:68).


def get_nov_category_links(doc: Node, base_url: str, city_code: str, fetch=None):
    rows = []
    root_node_id = 0
    node_href_id = 100000
    for x in doc.descendants("div"):
        if not x.has_class("cats-list row"):
            continue
        for c in x.descendants("div"):
            if not c.has_class("col-xs-12 col-sm-6 col-md-6 col-lg-4"):
                continue
            for h in c.descendants("h3"):
                for a in h.descendants("a"):
                    root_node_id += 1
                    rows.append((root_node_id, a.inner_text(), 0, None, city_code))
            for l in c.descendants("a"):
                node_href_id += 1
                rows.append(
                    (node_href_id, l.inner_text(), root_node_id, l.attribute_value("href"), city_code)
                )
                if l.has_class("show_all") and fetch is not None:
                    chref = l.attribute_value("href").strip().replace("//", "/")
                    if base_url.endswith("/"):
                        url = base_url.rstrip("/") + chref
                    else:
                        url = base_url + chref
                    sub = fetch(url)
                    if sub is None:
                        continue
                    for n in sub.descendants("div"):
                        if not n.has_class("cat-item"):
                            continue
                        for a in n.descendants("a"):
                            node_href_id += 1
                            candidate = (
                                node_href_id,
                                a.inner_text(),
                                root_node_id,
                                a.attribute_value("href"),
                                city_code,
                            )
                            # in-list dedup on (Name, CityCode, ParentId, Href)
                            exists = any(
                                r[1] == candidate[1]
                                and r[4] == candidate[4]
                                and r[2] == candidate[2]
                                and r[3] == candidate[3]
                                for r in rows
                            )
                            if not exists:
                                rows.append(candidate)
    return rows


# --------------------------------------------------------------------------
# H3 — spravker-layout category tree — HtmlParsing.fs:86-120


def get_category_links(doc: Node, base_url: str, city_code: str, fetch=None):
    rows = []
    root_node_id = 0
    node_with_link = 100000
    for x in doc.descendants("a"):
        if not x.has_class("header"):
            continue
        att = x.try_get_attribute("class")
        if att != "header":
            continue
        root_node_id += 1
        curl = x.try_get_attribute("href") or ""
        rows.append((root_node_id, x.inner_text(), 0, curl.strip(), city_code))
        if fetch is None:
            continue
        sub = fetch(base_url + curl.strip())
        if sub is None:
            continue
        for n in sub.descendants("div"):
            if not n.has_class("subcats"):
                continue
            for a in n.descendants("a"):
                href = a.try_get_attribute("href")
                if href is not None:
                    node_with_link += 1
                    rows.append(
                        (node_with_link, a.inner_text().strip(), root_node_id, href.strip(), city_code)
                    )
    return rows


# --------------------------------------------------------------------------
# H4 — bizly company card — HtmlParsing.fs:122-171

_GLYPH_FIELDS = [
    ("glyphicon glyphicon-map-marker", "address"),
    ("glyphicon glyphicon-phone-alt", "phone"),
    ("glyphicon glyphicon-time", "timework"),
    ("glyphicon glyphicon-share", "url"),
]


def get_div_company(doc: Node, category_id: int):
    """Rows: (company_seq_id, category_id, name, address, phone, timework, url)."""
    rows = []
    node_id = 0
    for x in doc.descendants("div"):
        if not (x.has_class("company") and x.try_get_attribute("class") == "company"):
            continue
        anchors = [
            (a.inner_text(), a.try_get_attribute("href"))
            for a in x.descendants("a")
            if a.try_get_attribute("href") is not None
        ]
        company = anchors[0][0] if anchors else None
        fields = {"address": None, "phone": None, "timework": None, "url": None}
        for li in x.descendants("li"):
            i_elems = li.elements("i")
            if not i_elems:
                continue  # reference Seq.head would throw; fixtures always have <i>
            first_i = i_elems[0]
            for cls, key in _GLYPH_FIELDS:
                if first_i.has_class(cls):
                    fields[key] = li.inner_text()
        node_id += 1
        rows.append(
            (
                node_id,
                category_id,
                company.strip() if company else company,
                fields["address"].strip() if fields["address"] else fields["address"],
                fields["phone"].strip() if fields["phone"] else fields["phone"],
                fields["timework"].strip() if fields["timework"] else fields["timework"],
                fields["url"].strip() if fields["url"] else fields["url"],
            )
        )
    return rows


# --------------------------------------------------------------------------
# H5 — spravker company card — HtmlParsing.fs:175-206


def get_div_companies(doc: Node, category_id: int):
    rows = []
    node_id = 0
    for x in doc.descendants("div"):
        if not x.has_class("list-item hover"):
            continue
        node_id += 1
        anchors = list(x.descendants("a"))
        name = anchors[-1].inner_text() if anchors else None
        company = {
            "name": name, "address": None, "phone": None, "timework": None, "url": None,
        }
        for n in x.descendants("div"):
            if not n.has_class("row"):
                continue
            key = None
            value = None
            for d in n.descendants("div"):
                if d.has_class("left"):
                    key = d.inner_text()
                if d.has_class("right"):
                    spans = list(d.descendants("span"))
                    if spans:
                        value = decode_base64(spans[-1].attribute_value("data-link"))
                    else:
                        value = d.inner_text()
            if key is not None and value is not None:
                if key == "Адрес:":
                    company["address"] = value
                elif key == "Телефон:":
                    company["phone"] = value
                elif key == "Часы работы:":
                    company["timework"] = value
                elif key == "Сайт:":
                    company["url"] = value
        rows.append(
            (node_id, category_id, company["name"], company["address"],
             company["phone"], company["timework"], company["url"])
        )
    return rows


# --------------------------------------------------------------------------
# H6 — jsprav company card — HtmlParsing.fs:208-246
# Quirk Q4: the row is appended once per `ul.address` block (0 blocks → no
# row, 2 blocks → 2 rows with cumulatively-updated fields).


def get_nov_div_companies(doc: Node, category_id: int):
    rows = []
    node_id = 0
    for x in doc.descendants("div"):
        if not x.has_class("org"):
            continue
        node_id += 1
        h3s = list(x.descendants("h3"))
        anchors = list(x.descendants("a"))
        name = h3s[-1].inner_text() if h3s else None
        company = {
            "name": name, "address": None, "phone": None, "timework": None,
            "url": anchors[-1].inner_text().strip() if anchors else None,
        }
        for n in x.descendants("ul"):
            if not n.has_class("address"):
                continue
            key = None
            value = None
            for p in n.descendants("p"):
                atrv = p.attribute_value("data-lnk")
                if atrv:
                    # .NET char-set trims: TrimStart("b'") = {b, '}, TrimEnd("'")
                    company["url"] = decode_base64(atrv.lstrip("b'").rstrip("'"))
                for sp in p.descendants("span"):
                    if sp.has_class("nm"):
                        key = sp.inner_text().strip()
                    if sp.has_class("value"):
                        value = sp.inner_text().strip()
                if key is not None and value is not None:
                    if key == "адрес:":
                        company["address"] = value
                    elif key == "телефон:":
                        company["phone"] = value
                    elif key == "график (часы) работы:":
                        company["timework"] = value
            rows.append(
                (node_id, category_id, company["name"], company["address"],
                 company["phone"], company["timework"], company["url"])
            )
    return rows


# --------------------------------------------------------------------------
# H8 — pagination max — HtmlParsing.fs:266-283


def get_page_number(doc: Node, tag: str) -> int:
    pagen = 0
    for x in doc.descendants(tag):
        if not x.has_class("pagination"):
            continue
        pairs = [
            (a.inner_text(), a.try_get_attribute("href"))
            for a in x.descendants("a")
            if a.try_get_attribute("href") is not None
        ]
        if pairs:
            pagen = int(pairs[-1][0])
    return pagen


# --------------------------------------------------------------------------
# H7 — dimension-table scrapes — HtmlParsing.fs:248-264,285-301,303-314,316-329

_CITIES_TABLE_STYLE = (
    "table-layout:fixed;font-size:10pt;font-family:arial,sans,sans-serif;"
    "width:0px;border-collapse:collapse;border:none"
)
_REGIONS_TABLE_STYLE = (
    "table-layout:fixed;font-size:13px;font-family:arial,sans,sans-serif;"
    "border-collapse:collapse;border:none"
)


def get_cities(doc: Node):
    """``getCities`` — HtmlParsing.fs:248-264: tables with ``dir=ltr`` and
    the exact fixed-layout style attr; rows styled ``height:21px`` with >2
    ``td`` DESCENDANTS contribute the third td's InnerText with EVERY
    ``"г."`` occurrence removed (Replace-all), trimmed. ``code`` = the
    1-based ordinal of the matching table (a sheet-export artifact the seed
    synthesis filters on, Program.fs:394). Returns
    (name, subordination, code, region) tuples."""
    out = []
    table_num = 0
    for x in doc.descendants("table"):
        if not (x.has_attribute("dir", "ltr") and x.has_attribute("style", _CITIES_TABLE_STYLE)):
            continue
        table_num += 1
        for tr in x.descendants("tr"):
            if not tr.has_attribute("style", "height:21px"):
                continue
            nodes = list(tr.descendants("td"))
            if len(nodes) > 2:
                name = nodes[2].inner_text().replace("г.", "").strip()
                out.append((name, None, str(table_num), None))
    return out


def get_country_list(doc: Node):
    """``getCountryList`` — HtmlParsing.fs:285-301: ``table.country-list``,
    skip the header row, td ELEMENTS 1..6 → (country_id=0, name, fname,
    capital, phone, domain, region). Indexing is unguarded like the
    reference (a short row raises)."""
    out = []
    for x in doc.descendants("table"):
        if not x.has_class("country-list"):
            continue
        trs = list(x.descendants("tr"))[1:]
        for tr in trs:
            td = tr.elements("td")
            out.append(
                (0, td[1].inner_text(), td[2].inner_text(), td[3].inner_text(),
                 td[4].inner_text(), td[5].inner_text(), td[6].inner_text())
            )
    return out


def get_russian_region_list(doc: Node):
    """``getRussionRegionList`` — HtmlParsing.fs:303-314: fixed-style 13px
    tables, EVERY row (no header skip), (code, name) = td[0], td[1]."""
    out = []
    for x in doc.descendants("table"):
        if not (x.has_attribute("dir", "ltr") and x.has_attribute("style", _REGIONS_TABLE_STYLE)):
            continue
        for tr in x.descendants("tr"):
            td = tr.elements("td")
            out.append((td[0].inner_text(), td[1].inner_text()))
    return out


def get_russian_cities_list(doc: Node):
    """``getRussionCitiesList`` — HtmlParsing.fs:316-329: table with
    ``id=table2`` and ``dir=LTR`` (attr compare is case-insensitive), skip
    the header row, keep only rows with EXACTLY 5 td elements →
    (name, subordination, code, region) = td[0..3] (td[4] unused)."""
    out = []
    for x in doc.descendants("table"):
        if not (x.has_id("table2") and x.has_attribute("dir", "LTR")):
            continue
        trs = list(x.descendants("tr"))[1:]
        for tr in trs:
            td = tr.elements("td")
            if len(td) == 5:
                out.append(
                    (td[0].inner_text(), td[1].inner_text(),
                     td[2].inner_text(), td[3].inner_text())
                )
    return out
