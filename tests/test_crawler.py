"""Crawler utility tests (S10/S11) — hermetic, injected fetch."""

from __future__ import annotations

import pytest

from otokuna_spark.sources import crawler

FORM_HTML = """
<html><body><form>
  <input type="checkbox" name="ts" id="ts1" value="1"><label for="ts1">賃貸マンション</label>
  <input type="checkbox" name="ts" id="ts2" value="2"><label for="ts2">アパート</label>
  <input type="checkbox" name="sc" id="sc13113" value="13113"><label for="sc13113">渋谷区</label>
  <input type="checkbox" name="sc" id="sc13111" value="13111"><label for="sc13111">大田区</label>
  <input type="checkbox" name="tc" id="tc1" value="0401303"><label for="tc1">本日の新着物件</label>
</form></body></html>
"""


def test_resolve_condition_codes():
    codes = crawler.resolve_condition_codes(
        FORM_HTML,
        building_categories=["賃貸マンション"],
        wards=["大田区", "渋谷区"],
        special_conditions=["本日の新着物件"],
    )
    assert codes == {"ts": ["1"], "sc": ["13111", "13113"], "tc": ["0401303"]}


def test_resolve_condition_codes_unknown_value():
    with pytest.raises(ValueError):
        crawler.resolve_condition_codes(FORM_HTML, wards=["存在しない区"])


def test_build_search_url():
    url = crawler.build_search_url({"ts": ["1"], "sc": ["13113", "13111"]})
    assert url.startswith("https://suumo.jp/jj/chintai/ichiran/FR301FC001/?")
    assert "pc=50" in url
    assert "ta=13" in url
    # codes sorted for determinism
    assert url.index("sc=13111") < url.index("sc=13113")


def test_param_helpers():
    u = "https://x.example/a?pc=25&page=3"
    assert "page" not in crawler.remove_page_param(u)
    assert "pc=50" in crawler.add_results_per_page_param(u)
    assert "pc=25" not in crawler.add_results_per_page_param(u)


def _page(n, last=False):
    nxt = "" if last else '<div class="pagination pagination_set-nav"><a href="/next">次へ</a></div>'
    return f"<html><body><p>page {n}</p>{nxt}</body></html>"


def test_iter_search_pages_pagination_and_retry():
    calls = []
    fail_once = {"done": False}

    def fetch(url):
        calls.append(url)
        if "page=2" in url and not fail_once["done"]:
            fail_once["done"] = True
            raise OSError("flaky network")
        n = int(url.split("page=")[1].split("&")[0])
        return _page(n, last=(n == 3))

    sleeps = []
    pages = list(
        crawler.iter_search_pages(
            "https://x.example/search?pc=50", fetch, sleep_time=1.5, backoff=10.0, sleep_fn=sleeps.append
        )
    )
    assert [p for p, _ in pages] == [1, 2, 3]
    # one retry happened (page=2 fetched twice) with a 10 s backoff sleep
    assert sum("page=2" in c for c in calls) == 2
    assert 10.0 in sleeps and 1.5 in sleeps


def test_iter_search_pages_gives_up_after_attempts():
    def always_fail(url):
        raise OSError("down")

    sleeps = []
    with pytest.raises(RuntimeError):
        list(
            crawler.iter_search_pages(
                "https://x.example/search", always_fail, n_attempts=3, sleep_fn=sleeps.append
            )
        )
    assert len(sleeps) == 3  # 3 backoffs then give up
