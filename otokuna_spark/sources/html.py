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
    __slots__ = ("tag", "classes", "attrs", "children", "text_parts", "parent")

    def __init__(self, tag: str, attrs: dict, parent: "_Node | None"):
        self.tag = tag
        self.attrs = attrs
        self.classes = set((attrs.get("class") or "").split())
        self.children: list[_Node] = []
        self.text_parts: list[str] = []
        self.parent = parent

    def text(self) -> str:
        out = list(self.text_parts)
        for c in self.children:
            out.append(c.text())
        return "".join(out)

    def find_all(self, tag: str | None = None, class_: str | None = None) -> list["_Node"]:
        hits = []
        for c in self.children:
            if (tag is None or c.tag == tag) and (class_ is None or class_ in c.classes):
                hits.append(c)
            hits.extend(c.find_all(tag, class_))
        return hits

    def find(self, tag: str | None = None, class_: str | None = None) -> "_Node | None":
        hits = self.find_all(tag, class_)
        return hits[0] if hits else None


_VOID = {"br", "img", "meta", "link", "input", "hr", "area", "base", "col", "embed", "source", "track", "wbr"}


class _DomBuilder(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node("__root__", {}, None)
        self.cur = self.root

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
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


def parse_dom(html: str) -> _Node:
    b = _DomBuilder()
    b.feed(html)
    return b.root


_BANNER_RE = re.compile(r"&times=(\d+)")


def extract_page(html: str, source_file: str, last_modified_at: float | None) -> list[dict]:
    """One results page -> raw-string room records (no value parsing)."""
    root = parse_dom(html)

    banner_script = None
    for script in root.find_all("script"):
        txt = script.text()
        if _BANNER_RE.search(txt):
            banner_script = txt
            break

    rows: list[dict] = []
    for b_idx, b in enumerate(root.find_all("div", class_="cassetteitem")):
        cat = b.find("div", class_="cassetteitem_content-label")
        title = b.find("div", class_="cassetteitem_content-title")
        addr = b.find("li", class_="cassetteitem_detail-col1")
        col2 = b.find("li", class_="cassetteitem_detail-col2")
        col3 = b.find("li", class_="cassetteitem_detail-col3")
        transportation = [d.text() for d in col2.find_all("div")] if col2 else []
        col3_divs = col3.find_all("div") if col3 else []
        age_text = col3_divs[0].text() if len(col3_divs) > 0 else None
        floors_text = col3_divs[1].text() if len(col3_divs) > 1 else None

        table = b.find("table", class_="cassetteitem_other")
        room_tags = table.find_all("tbody") if table else []
        for r_idx, r in enumerate(room_tags):
            def sp(cls):
                n = r.find("span", class_=cls)
                return n.text() if n else None

            tds = r.find_all("td")
            floor_text = None
            if len(tds) > 2:
                stripped = [s.strip() for s in tds[2].text().split("\n") if s.strip()]
                floor_text = stripped[0] if stripped else None
            href = None
            for td in tds:
                if "ui-text--midium" in td.classes and "ui-text--bold" in td.classes:
                    a = td.find("a")
                    if a is not None:
                        href = a.attrs.get("href")
                    break
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
                    "rent_text": sp("cassetteitem_price--rent"),
                    "admin_fee_text": sp("cassetteitem_price--administration"),
                    "deposit_text": sp("cassetteitem_price--deposit"),
                    "gratuity_text": sp("cassetteitem_price--gratuity"),
                    "layout_text": sp("cassetteitem_madori"),
                    "area_text": sp("cassetteitem_menseki"),
                    "floor_text": floor_text,
                    "detail_href": href,
                    "new_arrival": r.find(class_="cassetteitem_other-checkbox--newarrival") is not None,
                    "banner_script": banner_script,
                    "last_modified_at": last_modified_at,
                }
            )
    return rows


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
        yield pd.DataFrame(out, columns=[f.name for f in RAW_PAGE_SCHEMA.fields]) if out else pd.DataFrame(
            {f.name: pd.Series(dtype="object") for f in RAW_PAGE_SCHEMA.fields}
        )


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
