"""Synthetic Suumo-like results-page generator for scrape benchmarking.

Generates a crawl the shape of the reference's daily dump — ~1,500 pages
x 50 listings (README.md:191; ~92 MB of HTML, ml/dvc.lock:11) — so the
scrape pipeline's throughput is directly comparable to the reference's
scrape stage (~3.6 min single-node, svc/serverless.yml:98).
Content is deterministic (seeded) and passes the parse layer.
"""

from __future__ import annotations

import os
import random

_WARDS = [
    ("渋谷区", "恵比寿南"),
    ("大田区", "中央"),
    ("新宿区", "西新宿"),
    ("練馬区", "桜台"),
    ("世田谷区", "三軒茶屋"),
    ("杉並区", "高円寺南"),
    ("板橋区", "大山町"),
    ("足立区", "新田"),
]
_LAYOUTS = ["1K", "1DK", "2DK", "2LDK", "3LDK", "ワンルーム", "3DK", "4LDK"]
_LINES = ["ＪＲ山手線", "東京メトロ日比谷線", "都営大江戸線", "京王線", "東急東横線"]

_PAGE_HEAD = (
    '<!DOCTYPE html><html><head><title>r</title>'
    '<script>var ad="https://img.example/b?x=1&times={ms}&y=2";</script></head><body>'
)
_BUILDING = (
    '<div class="cassetteitem">'
    '<div class="cassetteitem_content-label">賃貸マンション</div>'
    '<div class="cassetteitem_content-title">{title}</div>'
    '<ul><li class="cassetteitem_detail-col1">東京都{ward}{district}{block}</li>'
    '<li class="cassetteitem_detail-col2">{trans}</li>'
    '<li class="cassetteitem_detail-col3"><div>築{age}年</div><div>{floors}階建</div></li></ul>'
    '<table class="cassetteitem_other">{rooms}</table></div>'
)
_ROOM = (
    "<tbody><tr><td>a</td><td>b</td><td>\n{floor}階\n</td>"
    '<td><span class="cassetteitem_price cassetteitem_price--rent">{rent}万円</span>'
    '<span class="cassetteitem_price cassetteitem_price--administration">{admin}円</span></td>'
    '<td><span class="cassetteitem_price cassetteitem_price--deposit">{rent}万円</span>'
    '<span class="cassetteitem_price cassetteitem_price--gratuity">-</span></td>'
    '<td><span class="cassetteitem_madori">{layout}</span>'
    '<span class="cassetteitem_menseki">{area}m2</span></td>'
    '<td class="ui-text--midium ui-text--bold"><a href="/chintai/jnc_{jnc:012d}/?bc=1002{jnc:08d}">d</a></td>'
    "</tr></tbody>"
)


def generate_crawl(out_dir: str, n_pages: int = 1500, rooms_per_page: int = 50, seed: int = 42) -> int:
    """Write n_pages HTML files (~10 buildings x 5 rooms each by default);
    returns total listings written."""
    rng = random.Random(seed)
    os.makedirs(out_dir, exist_ok=True)
    jnc = 0
    rooms_per_building = 5
    for p in range(n_pages):
        parts = [_PAGE_HEAD.format(ms=1609140469000 + p)]
        for b in range(max(rooms_per_page // rooms_per_building, 1)):
            ward, district = _WARDS[rng.randrange(len(_WARDS))]
            trans = "".join(
                f"<div>{_LINES[rng.randrange(len(_LINES))]}/駅{i} 歩{rng.randrange(1, 25)}分</div>"
                for i in range(rng.randrange(1, 4))
            )
            rooms = []
            for _ in range(rooms_per_building):
                jnc += 1
                rooms.append(
                    _ROOM.format(
                        floor=rng.randrange(1, 15),
                        rent=f"{rng.randrange(5, 30)}.{rng.randrange(0, 10)}",
                        admin=rng.randrange(0, 20) * 500,
                        layout=_LAYOUTS[rng.randrange(len(_LAYOUTS))],
                        area=f"{rng.randrange(15, 90)}.{rng.randrange(0, 10)}",
                        jnc=jnc,
                    )
                )
            parts.append(
                _BUILDING.format(
                    title=f"ビル{p}_{b}",
                    ward=ward,
                    district=district,
                    block=rng.randrange(1, 9),
                    trans=trans,
                    age=rng.randrange(0, 40),
                    floors=rng.randrange(2, 20),
                    rooms="".join(rooms),
                )
            )
        parts.append("</body></html>")
        with open(os.path.join(out_dir, f"page_{p:06d}.html"), "w", encoding="utf-8") as f:
            f.write("".join(parts))
    return jnc
