"""S1/S2/S3 — distributed HTML page source (SURVEY.md §2.1).

The reference enumerates page files (dir or zip), parses each with
BeautifulSoup into ``Property`` records, and fans out with joblib
(scraping.py:246-313). Spark-first shape:

    spark.read.format("binaryFile").load(dir)      # S1: distributed listing
      -> mapInPandas(_extract_batches)             # S2: UDTF, page -> N rows
      -> column-expression parse layer             # P1-P11 (plans/pipeline.py)

The UDTF emits RAW STRINGS only (the ``properties_raw_strings`` relation,
FIXTURES.md §2) — all value parsing happens downstream in native column
expressions so the Python boundary does the minimum work. Zip archives are
expanded inside the UDTF (one zip -> many pages) so a day's crawl zip is
still a single distributed read.

The DOM extraction targets the same structure the reference scrapes
(scraping.py:189-235): div.cassetteitem blocks with content-label/title,
detail-col1/2/3 lists, table.cassetteitem_other room rows. bs4 is not a
dependency — a ~60-line stdlib html.parser DOM suffices for this fixed
structure.
"""

from __future__ import annotations

import io
import re
import zipfile
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as sty

SUUMO_URL = "https://suumo.jp"

RAW_PAGE_SCHEMA = sty.StructType(
    [
        sty.StructField("source_file", sty.StringType()),
        sty.StructField("building_idx", sty.IntegerType()),
        sty.StructField("room_idx", sty.IntegerType()),
        sty.StructField("category_text", sty.StringType()),
        sty.StructField("title_text", sty.StringType()),
        sty.StructField("address_text", sty.StringType()),
        sty.StructField("transportation_texts", sty.ArrayType(sty.StringType())),
        sty.StructField("age_text", sty.StringType()),
        sty.StructField("floors_text", sty.StringType()),
        sty.StructField("rent_text", sty.StringType()),
        sty.StructField("admin_fee_text", sty.StringType()),
        sty.StructField("deposit_text", sty.StringType()),
        sty.StructField("gratuity_text", sty.StringType()),
        sty.StructField("layout_text", sty.StringType()),
        sty.StructField("area_text", sty.StringType()),
        sty.StructField("floor_text", sty.StringType()),
        sty.StructField("detail_href", sty.StringType()),
        sty.StructField("new_arrival", sty.BooleanType()),
        sty.StructField("banner_script", sty.StringType()),
        sty.StructField("last_modified_at", sty.DoubleType()),
    ]
)


class _Node:
    """DOM node tuned for the extraction hot loop: the class attribute is
    kept as a space-padded string (`" a b "`) so membership is one C-level
    substring test instead of a per-node set build; traversals are
    iterative pre-order (same visit order as the recursive formulation)."""

    __slots__ = ("tag", "cls_pad", "attrs", "children", "text_parts", "parent")

    def __init__(self, tag: str, attrs: list, parent: "_Node | None"):
        self.tag = tag
        cls = ""
        for k, v in attrs:
            if k == "class" and v:
                cls = v
                break
        self.cls_pad = f" {cls} " if cls else ""
        self.attrs = attrs
        self.children: list[_Node] = []
        self.text_parts: list[str] = []
        self.parent = parent

    def has_class(self, class_: str) -> bool:
        return f" {class_} " in self.cls_pad

    def attr(self, name: str) -> str | None:
        for k, v in self.attrs:
            if k == name:
                return v
        return None

    def text(self) -> str:
        # a node's own text_parts precede all descendant text (matches the
        # recursive definition this replaced)
        out: list[str] = []
        stack = [self]
        while stack:
            n = stack.pop()
            out.extend(n.text_parts)
            stack.extend(reversed(n.children))
        return "".join(out)

    def _match(self, tag: str | None, pad: str | None) -> bool:
        return (tag is None or self.tag == tag) and (pad is None or pad in self.cls_pad)

    def find_all(self, tag: str | None = None, class_: str | None = None) -> list["_Node"]:
        pad = f" {class_} " if class_ is not None else None
        hits = []
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if c._match(tag, pad):
                hits.append(c)
            stack.extend(reversed(c.children))
        return hits

    def find(self, tag: str | None = None, class_: str | None = None) -> "_Node | None":
        pad = f" {class_} " if class_ is not None else None
        stack = list(reversed(self.children))
        while stack:
            c = stack.pop()
            if c._match(tag, pad):
                return c
            stack.extend(reversed(c.children))
        return None


_VOID = {"br", "img", "meta", "link", "input", "hr", "area", "base", "col", "embed", "source", "track", "wbr"}


class _DomBuilder(HTMLParser):
    """Builds the _Node tree; also collects script elements and
    div.cassetteitem blocks AS THEY ARE CREATED (creation order ==
    pre-order document order), so extract_page never re-walks the whole
    tree to find them."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("__root__", [], None)
        self.cur = self.root
        self.scripts: list[_Node] = []
        self.buildings: list[_Node] = []

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, attrs, self.cur)
        self.cur.children.append(node)
        if tag == "script":
            self.scripts.append(node)
        elif tag == "div" and " cassetteitem " in node.cls_pad:
            self.buildings.append(node)
        if tag not in _VOID:
            self.cur = node

    def handle_endtag(self, tag):
        n = self.cur
        while n is not self.root and n.tag != tag:
            n = n.parent
        if n is not self.root:
            self.cur = n.parent

    def handle_data(self, data):
        self.cur.text_parts.append(data)


def parse_dom_stdlib(html: str) -> _Node:
    """Reference DOM build via the stdlib tokenizer — kept as the parity
    baseline for tests; ``parse_dom`` below produces the same tree ~3x
    faster on this page structure."""
    b = _DomBuilder()
    b.feed(html)
    return b.root


# ---------------------------------------------------------------------
# Fast tokenizer: a single scanner regex in C replaces html.parser's
# per-construct regex machinery (~3x on these pages). Semantics mirror
# HTMLParser(convert_charrefs=True) for well-formed markup: lowercased
# tag/attr names, entity-unescaped data and attribute values, raw-text
# (no unescape) script/style content, comments/decls/PIs dropped,
# self-closing tags -> start+end. tests/test_pipeline.py asserts
# node-for-node parity with the stdlib build over the fixture corpus.
# ---------------------------------------------------------------------

from html import unescape as _unescape  # stdlib html package, not this module

_RAWTEXT = {"script", "style"}

_MARKUP_RE = re.compile(
    r"""<(?:
          !--(?P<comment>.*?)--
        | !(?P<decl>[^>]*)
        | \?(?P<pi>[^>]*)
        | /(?P<end>[a-zA-Z][^\s>]*)\s*
        | (?P<start>[a-zA-Z][^\s/>]*)(?P<attrs>(?:"[^"]*"|'[^']*'|[^>])*)
    )>""",
    re.X | re.S,
)

_ATTR_RE = re.compile(
    r"""([^\s/>][^\s/=>]*)(?:\s*=\s*(?:"([^"]*)"|'([^']*)'|([^>\s]*)))?""",
    re.S,
)

_RAWTEXT_END = {
    t: re.compile(rf"</\s*{t}\s*>", re.I) for t in _RAWTEXT
}

_ATTRS_CACHE: dict[str, list] = {}


def _fast_feed(html: str, b: _DomBuilder) -> None:
    handle_data = b.handle_data
    pos, n = 0, len(html)
    while pos < n:
        lt = html.find("<", pos)
        if lt < 0:
            data = html[pos:]
            handle_data(_unescape(data) if "&" in data else data)
            break
        if lt > pos:
            data = html[pos:lt]
            handle_data(_unescape(data) if "&" in data else data)
        m = _MARKUP_RE.match(html, lt)
        if m is None:
            # stray '<' that opens no construct — treated as text, like the
            # stdlib tokenizer's goahead fallback
            handle_data("<")
            pos = lt + 1
            continue
        pos = m.end()
        start = m.group(5)
        if start is not None:
            tag = start.lower()
            blob = m.group(6) or ""
            selfclose = blob.rstrip().endswith("/")
            if selfclose:
                blob = blob.rstrip()[:-1]
            # crawl pages repeat a small set of attribute blobs thousands of
            # times (class="cassetteitem_price ..." etc.) — memoize the
            # parsed form; the lists are shared read-only across nodes
            attrs = _ATTRS_CACHE.get(blob)
            if attrs is None:
                attrs = []
                for am in _ATTR_RE.finditer(blob):
                    v = am.group(2)
                    if v is None:
                        v = am.group(3)
                    if v is None:
                        v = am.group(4)
                    if v is not None and "&" in v:
                        v = _unescape(v)
                    attrs.append((am.group(1).lower(), v))
                if len(_ATTRS_CACHE) < 4096:
                    _ATTRS_CACHE[blob] = attrs
            b.handle_starttag(tag, attrs)
            if selfclose:
                b.handle_endtag(tag)
            elif tag in _RAWTEXT:
                endm = _RAWTEXT_END[tag].search(html, pos)
                if endm is None:
                    handle_data(html[pos:])  # unterminated rawtext: rest is raw
                    pos = n
                else:
                    handle_data(html[pos : endm.start()])  # raw — no unescape
                    b.handle_endtag(tag)
                    pos = endm.end()
            continue
        end = m.group(4)
        if end is not None:
            b.handle_endtag(end.lower())
        # comments / declarations / processing instructions: dropped


def _parse_page(html: str) -> _DomBuilder:
    b = _DomBuilder()
    _fast_feed(html, b)
    return b


def parse_dom(html: str) -> _Node:
    return _parse_page(html).root


_BANNER_RE = re.compile(r"&times=(\d+)")


def extract_page(html: str, source_file: str, last_modified_at: float | None) -> list[dict]:
    """One results page -> raw-string room records (no value parsing)."""
    dom = _parse_page(html)

    banner_script = None
    for script in dom.scripts:
        txt = script.text()
        if _BANNER_RE.search(txt):
            banner_script = txt
            break

    rows: list[dict] = []
    for b_idx, b in enumerate(dom.buildings):
        hdr = _building_header(b)
        cat, title, addr, col2, col3, table = hdr
        transportation = [d.text() for d in col2.find_all("div")] if col2 else []
        col3_divs = col3.find_all("div") if col3 else []
        age_text = col3_divs[0].text() if len(col3_divs) > 0 else None
        floors_text = col3_divs[1].text() if len(col3_divs) > 1 else None

        room_tags = table.find_all("tbody") if table else []
        for r_idx, r in enumerate(room_tags):
            spans, tds, href_td, new_arrival = _room_scan(r)

            floor_text = None
            if len(tds) > 2:
                stripped = [s.strip() for s in tds[2].text().split("\n") if s.strip()]
                floor_text = stripped[0] if stripped else None
            href = None
            if href_td is not None:
                a = href_td.find("a")
                if a is not None:
                    href = a.attr("href")
            rows.append(
                {
                    "source_file": source_file,
                    "building_idx": b_idx,
                    "room_idx": r_idx,
                    "category_text": cat.text() if cat else None,
                    "title_text": title.text() if title else None,
                    "address_text": addr.text() if addr else None,
                    "transportation_texts": transportation,
                    "age_text": age_text,
                    "floors_text": floors_text,
                    "rent_text": spans.get("cassetteitem_price--rent"),
                    "admin_fee_text": spans.get("cassetteitem_price--administration"),
                    "deposit_text": spans.get("cassetteitem_price--deposit"),
                    "gratuity_text": spans.get("cassetteitem_price--gratuity"),
                    "layout_text": spans.get("cassetteitem_madori"),
                    "area_text": spans.get("cassetteitem_menseki"),
                    "floor_text": floor_text,
                    "detail_href": href,
                    "new_arrival": new_arrival,
                    "banner_script": banner_script,
                    "last_modified_at": last_modified_at,
                }
            )
    return rows


_B_SPECS = (
    ("div", " cassetteitem_content-label "),
    ("div", " cassetteitem_content-title "),
    ("li", " cassetteitem_detail-col1 "),
    ("li", " cassetteitem_detail-col2 "),
    ("li", " cassetteitem_detail-col3 "),
    ("table", " cassetteitem_other "),
)

_SPAN_CLASSES = (
    "cassetteitem_price--rent",
    "cassetteitem_price--administration",
    "cassetteitem_price--deposit",
    "cassetteitem_price--gratuity",
    "cassetteitem_madori",
    "cassetteitem_menseki",
)


def _building_header(b: _Node) -> list["_Node | None"]:
    """First pre-order match for each building-level (tag, class) — ONE
    subtree walk with early exit, replacing six independent find() scans
    (each of which traverses the room table too)."""
    found: list[_Node | None] = [None] * len(_B_SPECS)
    missing = len(_B_SPECS)
    stack = list(reversed(b.children))
    while stack and missing:
        c = stack.pop()
        if c.cls_pad:
            for i, (tag, pad) in enumerate(_B_SPECS):
                if found[i] is None and c.tag == tag and pad in c.cls_pad:
                    found[i] = c
                    missing -= 1
                    break
        stack.extend(reversed(c.children))
    return found


def _room_scan(r: _Node):
    """One pre-order walk per room row collecting everything the record
    needs: first span per price/layout/area class, tds in document order,
    the bold-midium href cell, and the new-arrival marker — replacing
    eight find/find_all scans of the same subtree."""
    spans: dict[str, str] = {}
    tds: list[_Node] = []
    href_td: _Node | None = None
    new_arrival = False
    stack = list(reversed(r.children))
    while stack:
        c = stack.pop()
        cp = c.cls_pad
        if c.tag == "td":
            tds.append(c)
            if href_td is None and cp and " ui-text--midium " in cp and " ui-text--bold " in cp:
                href_td = c
        elif c.tag == "span" and cp:
            for cls in _SPAN_CLASSES:
                if cls not in spans and f" {cls} " in cp:
                    spans[cls] = c.text()
        if not new_arrival and cp and " cassetteitem_other-checkbox--newarrival " in cp:
            new_arrival = True
        stack.extend(reversed(c.children))
    return spans, tds, href_td, new_arrival


def _extract_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas UDTF body: (path, content bytes, modificationTime) ->
    raw room rows; zips are expanded in place (S9's inverse)."""
    for pdf in it:
        out: list[dict] = []
        for path, content, mtime in zip(pdf["path"], pdf["content"], pdf["modificationTime"]):
            epoch = round(mtime.timestamp()) if mtime is not None else None
            if path.endswith(".zip"):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for info in sorted(zf.infolist(), key=lambda i: i.filename):
                        if not info.filename.endswith(".html"):
                            continue
                        import datetime

                        ts = round(datetime.datetime(*info.date_time).timestamp())
                        html = zf.read(info).decode("utf-8", errors="replace")
                        out.extend(extract_page(html, info.filename, float(ts)))
            else:
                html = bytes(content).decode("utf-8", errors="replace")
                out.extend(extract_page(html, path.rsplit("/", 1)[-1], float(epoch)))
        names = [f.name for f in RAW_PAGE_SCHEMA.fields]
        if out:
            # columnar construction: one list comprehension per column is
            # several times faster than pandas' from-records path
            yield pd.DataFrame({name: [r[name] for r in out] for name in names})
        else:
            yield pd.DataFrame({name: pd.Series(dtype="object") for name in names})


def read_raw_pages(spark: SparkSession, path: str) -> DataFrame:
    """S1+S2: distributed page scan -> raw-string room relation.

    ``path`` may be a directory of .html files, a glob, or .zip archives;
    binaryFile gives (path, modificationTime, content) per file and Spark
    parallelizes over files (the joblib fan-out, S3, for free).
    """
    files = spark.read.format("binaryFile").load(path)
    return files.select("path", "content", "modificationTime").mapInPandas(
        _extract_batches, schema=RAW_PAGE_SCHEMA
    )
