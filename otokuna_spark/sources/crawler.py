"""S10/S11 — crawler-side utilities (SURVEY.md §2.1).

These sit OUTSIDE the SQL engine (driver-side or ``foreachPartition``
fetchers, SURVEY §4): URL construction, pagination iteration, retrying GET.
Freshly implemented against the behavior of libs/otokuna/dumping.py:
43-138 (condition codes + query-param building) and :170-207 (pagination
with retry x3 and fixed backoff).

Network access is injected (``fetch_fn``) so tests run hermetically and a
Spark deployment can swap in a ``foreachPartition`` fetcher: partition the
ward list, each task crawls its wards' pages and writes
``page_NNNNNN.html`` files for sources/html.py to scan (the Step
Functions DumpMap fan-out, serverless.yml:127-147, becomes one job with
23 partition values).
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator
from urllib.parse import parse_qs, urlencode, urlparse, urlunparse

SUUMO_URL = "https://suumo.jp"

# base query per dumping.py:124-130: Tokyo (ta=13), rentals, no rent /
# area / walk-time / age bounds, 50 results per page
BASE_SEARCH_PATH = "/jj/chintai/ichiran/FR301FC001/"
BASE_QUERY = {
    "ar": ["030"],
    "bs": ["040"],
    "ta": ["13"],
    "cb": ["0.0"],
    "ct": ["9999999"],
    "mb": ["0"],
    "mt": ["9999999"],
    "et": ["9999999"],
    "cn": ["9999999"],
    "pc": ["50"],
}


def add_params(url: str, values_by_param: dict[str, list[str]]) -> str:
    """Add/replace query parameters (dumping.py:85-92 semantics)."""
    u = urlparse(url)
    query = parse_qs(u.query, keep_blank_values=True)
    query.update(values_by_param)
    return urlunparse(u._replace(query=urlencode(query, doseq=True)))


def remove_params(url: str, params: list[str]) -> str:
    """Remove query parameters if present (dumping.py:67-77)."""
    u = urlparse(url)
    query = parse_qs(u.query, keep_blank_values=True)
    for p in params:
        query.pop(p, None)
    return urlunparse(u._replace(query=urlencode(query, doseq=True)))


def remove_page_param(url: str) -> str:
    return remove_params(url, ["page"])


def add_results_per_page_param(url: str) -> str:
    return add_params(url, {"pc": ["50"]})


def build_search_url(condition_codes: dict[str, list[str]]) -> str:
    """S11 — compose the Tokyo search URL from pre-resolved condition
    codes ({'ts': [...building categories], 'sc': [...wards],
    'tc': [...special conditions]}), each list sorted for determinism
    (dumping.py:63). The reference scrapes the codes from the search form
    checkboxes at runtime (:43-64); here they are an input so the builder
    is hermetic — resolve them once with ``resolve_condition_codes``.
    """
    query = dict(BASE_QUERY)
    for cond_id, codes in condition_codes.items():
        query[cond_id] = sorted(codes)
    return urlunparse(urlparse(f"{SUUMO_URL}{BASE_SEARCH_PATH}")._replace(query=urlencode(query, doseq=True)))


def resolve_condition_codes(
    form_html: str,
    building_categories: list[str] | None = None,
    wards: list[str] | None = None,
    special_conditions: list[str] | None = None,
) -> dict[str, list[str]]:
    """Scrape checkbox codes from the search-form HTML (dumping.py:33-64):
    for each checkbox input of a condition group, the label text maps to
    the checkbox value. Unknown requested values raise."""
    from .html import parse_dom

    root = parse_dom(form_html)
    wanted = {"ts": building_categories, "sc": wards, "tc": special_conditions}
    labels_by_for = {}
    for label in root.find_all("label"):
        for_val = label.attr("for")
        if for_val is not None:
            strings = [s for s in label.text().split("\n") if s.strip()]
            if strings:
                labels_by_for[for_val] = strings[0].strip()
    out: dict[str, list[str]] = {}
    for cond_id, values in wanted.items():
        if values is None:
            continue
        codes_by_value = {}
        for box in root.find_all("input"):
            if box.attr("type") == "checkbox" and box.attr("name") == cond_id:
                value = labels_by_for.get(box.attr("id"))
                if value is not None:
                    codes_by_value[value] = box.attr("value")
        missing = set(values) - set(codes_by_value)
        if missing:
            raise ValueError(f"invalid values for condition {cond_id}: {missing}")
        out[cond_id] = sorted(codes_by_value[v] for v in values)
    return out


def iter_search_pages(
    search_url: str,
    fetch_fn: Callable[[str], str],
    sleep_time: float = 0.0,
    n_attempts: int = 3,
    backoff: float = 10.0,
    sleep_fn: Callable[[float], None] = time.sleep,
) -> Iterator[tuple[int, str]]:
    """S10 — paginate until the page has no 次へ (next) link
    (dumping.py:170-207): yields (page_number, html). Each GET retries
    ``n_attempts`` times with a fixed ``backoff`` sleep."""
    from .html import parse_dom

    page = 1
    while True:
        url = add_params(search_url, {"page": [str(page)]})
        last_err: Exception | None = None
        for _ in range(n_attempts):
            try:
                html = fetch_fn(url)
                last_err = None
                break
            except Exception as e:  # noqa: BLE001
                last_err = e
                sleep_fn(backoff)
        if last_err is not None:
            raise RuntimeError(f"Could not get: {url}") from last_err
        yield page, html

        root = parse_dom(html)
        has_next = False
        for div in root.find_all("div", class_="pagination"):
            if "次へ" in div.text():
                has_next = True
                break
        if not has_next:
            break
        page += 1
        sleep_fn(sleep_time)
