"""Synthetic Suumo-like page generator for pipeline tests.

Freshly written fixture (structure mirrors what the reference scrapes —
div.cassetteitem blocks — but content and code are original)."""

from __future__ import annotations

PAGE_TEMPLATE = """<!DOCTYPE html>
<html><head><title>search results</title>
<script>var ad = "https://img.example/banner?foo=1&times={banner_ms}&h=2";</script>
</head><body>
{buildings}
</body></html>
"""

BUILDING_TEMPLATE = """<div class="cassetteitem">
  <div class="cassetteitem_content-label">{category}</div>
  <div class="cassetteitem_content-title">{title}</div>
  <ul>
    <li class="cassetteitem_detail-col1">{address}</li>
    <li class="cassetteitem_detail-col2">{transportation}</li>
    <li class="cassetteitem_detail-col3"><div>{age}</div><div>{floors}</div></li>
  </ul>
  <table class="cassetteitem_other">
{rooms}
  </table>
</div>
"""

ROOM_TEMPLATE = """  <tbody>
    <tr>
      <td>stuff</td>
      <td>more</td>
      <td>
{floor}
      </td>
      <td><span class="cassetteitem_price cassetteitem_price--rent">{rent}</span>
          <span class="cassetteitem_price cassetteitem_price--administration">{admin}</span></td>
      <td><span class="cassetteitem_price cassetteitem_price--deposit">{deposit}</span>
          <span class="cassetteitem_price cassetteitem_price--gratuity">{gratuity}</span></td>
      <td><span class="cassetteitem_madori">{layout}</span>
          <span class="cassetteitem_menseki">{area}</span></td>
      <td class="ui-text--midium ui-text--bold"><a href="/chintai/jnc_{jnc_id}/?bc={bc}">detail</a></td>
      {newarrival}
    </tr>
  </tbody>
"""


def room(jnc_id, rent="7.2万円", admin="3000円", deposit="7.2万円", gratuity="-",
         layout="1K", area="21.5m2", floor="3階", new=False, bc="100000000001"):
    return ROOM_TEMPLATE.format(
        jnc_id=jnc_id, rent=rent, admin=admin, deposit=deposit, gratuity=gratuity,
        layout=layout, area=area, floor=floor, bc=bc,
        newarrival='<td><span class="cassetteitem_other-checkbox--newarrival">新着</span></td>' if new else "",
    )


def building(rooms, category="賃貸マンション", title="テスト荘", address="東京都渋谷区恵比寿南１",
             transportation=("ＪＲ山手線/恵比寿駅 歩5分", "東京メトロ日比谷線/恵比寿駅 歩7分"),
             age="築10年", floors="5階建"):
    trans = "".join(f"<div>{t}</div>" for t in transportation)
    return BUILDING_TEMPLATE.format(
        category=category, title=title, address=address, transportation=trans,
        age=age, floors=floors, rooms="".join(rooms),
    )


def page(buildings, banner_ms=1609140469000):
    return PAGE_TEMPLATE.format(banner_ms=banner_ms, buildings="".join(buildings))


LOCATION_CSV_ROWS = [
    ("東京都", "渋谷区", "恵比寿南一丁目", 35.644942, 139.709897),
    ("東京都", "渋谷区", "千駄ケ谷一丁目", 35.679752, 139.710687),
    ("東京都", "大田区", "中央一丁目", 35.573764, 139.716633),
    ("東京都", "新宿区", "西新宿", 35.689634, 139.692101),
]


def write_location_csv(path: str) -> None:
    header = "都道府県名,市区町村名,大字町丁目名,緯度,経度\n"
    rows = "".join(f"{p},{w},{d},{lat},{lon}\n" for p, w, d, lat, lon in LOCATION_CSV_ROWS)
    with open(path, "wb") as f:
        f.write((header + rows).encode("shift_jis"))
