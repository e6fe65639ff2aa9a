"""Driver-attestation staleness report (judge ask, round 6 item 6).

With 133 registry queries and a 50-slot driver gate, full re-attestation
takes ~3 rounds; this report makes the staleness visible instead of
implicit in the rotation logic. It reuses the SAME committed-artifact
scan the rotation runs at import time (__spark_entry__._attestation_rounds)
and prints, per query: the latest round with a green driver row, plus the
projected window for the NEXT round (the first 50 names of the rotated
order) so reviewers can see what the coming gate will cover.

Usage:
    python tools/attestation_report.py [--json out.json]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

import __spark_entry__ as entry_mod  # noqa: E402


def build_report() -> dict:
    latest = entry_mod._attestation_rounds()
    ordered = entry_mod._gate_ordered_names()
    window = ordered[:50]
    per_query = {
        name: {
            "last_attested_round": latest.get(name, 0),
            "in_next_window": name in window,
        }
        for name in ordered
    }
    rounds = sorted({v for v in latest.values()})
    by_round = {
        r: sorted(n for n, v in latest.items() if v == r) for r in rounds
    }
    never = sorted(n for n in ordered if n not in latest)
    return {
        "registry_size": len(ordered),
        "attested_any_round": len(latest),
        "never_attested": never,
        "counts_by_last_round": {str(r): len(v) for r, v in by_round.items()},
        "next_window": window,
        "per_query": per_query,
    }


def main(argv: list[str]) -> int:
    out = None
    if "--json" in argv:
        out = argv[argv.index("--json") + 1]
    rep = build_report()
    print(f"registry: {rep['registry_size']} queries")
    print(
        f"driver-attested (any round): {rep['attested_any_round']}"
        f" | never: {len(rep['never_attested'])}"
        + (f" -> {', '.join(rep['never_attested'])}" if rep["never_attested"] else "")
    )
    print("last-attested round -> #queries:")
    for r, n in sorted(rep["counts_by_last_round"].items(), key=lambda kv: int(kv[0])):
        print(f"  r{int(r):02d}: {n}")
    stalest = [
        (v["last_attested_round"], n)
        for n, v in rep["per_query"].items()
    ]
    stalest.sort()
    print("next driver window (first 50 of rotated order):")
    for name in rep["next_window"]:
        last = rep["per_query"][name]["last_attested_round"]
        tag = "NEVER" if last == 0 else f"r{last:02d}"
        print(f"  {tag:>5}  {name}")
    if out:
        with open(out, "w") as fh:
            json.dump(rep, fh, indent=1, sort_keys=True)
        print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
