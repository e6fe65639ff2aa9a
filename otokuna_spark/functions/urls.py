"""URL canonicalization — native Column expressions (SURVEY.md §2.13).

The C4/RefinedWeb-standard first dedup pass: most crawl duplication is
the same page behind URL noise (scheme variants, host case, ``www.``,
default ports, tracking params, param order, trailing slashes,
fragments). Everything here is pure ``pyspark.sql.functions`` regex /
array expressions — one codegen'd projection per URL, no Python UDF, no
shuffle — so canonicalization composes with any downstream keyed dedup
at full scan speed.

Canonical form (documented contract, scheme-insensitive):

    <host>(<path>)(?<kept-params sorted>)

- fragment stripped (``#...`` never reaches the server);
- scheme stripped (http/https variants of one page are one page — the
  aggressive-but-standard training-data choice; keep the scheme
  upstream if serving needs it);
- host lowercased, default ports ``:80``/``:443`` stripped, leading
  ``www.`` stripped;
- path: trailing ``/`` runs stripped (``/a/`` == ``/a``);
- query: params split on ``&``, tracking params (``utm_*``) and empties
  dropped, the rest byte-sorted (param ORDER is presentation noise) and
  rejoined; a fully-stripped query drops its ``?``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

# query-param prefixes that are tracking noise, never content identity
TRACKING_PREFIXES = ("utm_",)


def _strip_scheme_fragment(url: Column) -> Column:
    u = F.regexp_replace(url, r"#.*$", "")
    return F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")


def canonical_host(url: Column) -> Column:
    """Lowercased host with default ports (:80/:443) and a leading
    ``www.`` stripped."""
    u = _strip_scheme_fragment(url)
    host = F.lower(F.regexp_extract(u, r"^([^/?]+)", 1))
    host = F.regexp_replace(host, r":(80|443)$", "")
    return F.regexp_replace(host, r"^www\.", "")


def canonical_url(url: Column) -> Column:
    """The full canonical form ``host + path + ?kept-params`` (see the
    module docstring for each rule). Pure Column expressions."""
    u = _strip_scheme_fragment(url)
    rest = F.regexp_replace(u, r"^[^/?]+", "")
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.regexp_replace(path, r"/+$", "")
    qs = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.array_sort(
        F.filter(
            F.split(qs, "&"),
            lambda p: (p != "")
            & ~reduce(
                lambda a, b: a | b,
                [p.startswith(pre) for pre in TRACKING_PREFIXES],
            ),
        )
    )
    return F.concat(
        canonical_host(url),
        path,
        F.when(
            F.size(kept) > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )


def registered_domain(host: Column) -> Column:
    """Last two dot-labels of a host (``a.b.site.example.com`` ->
    ``example.com``) — the per-domain rollup key. A real crawl needs the
    Public Suffix List for ccTLD registries (``example.co.uk``); this is
    the PSL-free approximation suitable for synthetic/test domains.

    Any ``:port`` suffix is stripped first: ``canonical_host`` keeps
    non-default ports (they are distinct origins for dedup), but a
    rollup key must not split one registered domain into per-port
    groups."""
    host = F.regexp_replace(host, r":\d+$", "")
    return F.when(
        host.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(host)
