"""Bench regression diff: compare two bench JSON records (bench.py
output / BENCH_LOCAL.json / driver BENCH_r{N}.json tails) per query.

    python tools/bench_diff.py OLD.json NEW.json [--threshold 1.3]

Prints per-query ratios for everything slower than the threshold, the
biggest improvements, and queries present on only one side. Exit 1 when
regressions exceed the threshold — wire into the round loop to catch a
plan regression the shuffle-ceiling audit can't see (same plan, slower
constants).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    """Accept bench.py output, BENCH_LOCAL.json, or a driver BENCH_r{N}
    wrapper whose "tail" string holds (possibly front-truncated) stdout:
    query timings are recovered by regex, so a mid-JSON cut only loses
    the entries before the cut."""
    import re

    with open(path) as f:
        text = f.read()
    try:
        d = json.loads(text)
        if "queries" in d:
            return {k: float(v) for k, v in d["queries"].items()}
        text = str(d.get("tail", text))
    except json.JSONDecodeError:
        pass
    pairs = re.findall(
        r'"((?:q\d+_|scrape_|salted_)[a-zA-Z0-9_]*)":\s*([0-9]+(?:\.[0-9]+)?)', text
    )
    return {k: float(v) for k, v in pairs}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    threshold = 1.3
    if "--threshold" in sys.argv:
        i = sys.argv.index("--threshold")
        if i + 1 >= len(sys.argv):
            print("usage: bench_diff.py OLD NEW [--threshold X]", file=sys.stderr)
            return 2
        threshold = float(sys.argv[i + 1])
        args = [a for a in args if a != sys.argv[i + 1]]
    if len(args) != 2:
        print("usage: bench_diff.py OLD NEW [--threshold X]", file=sys.stderr)
        return 2
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new))
    ratios = {q: new[q] / old[q] if old[q] > 0 else float("inf") for q in common}
    regressions = {q: r for q, r in ratios.items() if r > threshold and new[q] - old[q] > 0.15}
    for q in sorted(regressions, key=lambda q: -ratios[q]):
        print(f"REGRESSION {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({ratios[q]:.2f}x)")
    wins = sorted((q for q in common if ratios[q] < 1 / threshold), key=lambda q: ratios[q])
    for q in wins[:10]:
        print(f"improved   {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({ratios[q]:.2f}x)")
    for q in sorted(set(new) - set(old)):
        print(f"new        {q}: {new[q]:.2f}s")
    for q in sorted(set(old) - set(new)):
        print(f"dropped    {q}")
    t_old = sum(old[q] for q in common)
    t_new = sum(new[q] for q in common)
    ratio = f"{t_new / t_old:.2f}x" if t_old > 0 else "n/a"
    print(f"common-query total: {t_old:.1f}s -> {t_new:.1f}s "
          f"({ratio}, {len(common)} queries); {len(regressions)} regressions")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main())
