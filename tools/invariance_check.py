"""Partitioning-invariance sweep: the full oracle gate under an
adversarial shuffle-partition count.

Every query's result must be a function of the DATA, not of how Spark
happened to partition it — the property that makes results reproducible
across cluster sizes (32 local threads today, 1000 executors at the
design point). Hash-comparison against DuckDB is order-insensitive, so
the residual risk is values that *depend* on partitioning: seeded
per-partition RNG, spark_partition_id leaking into results, driver-side
offsets computed per partition (the suffix-array dense rank), arrays
built from shuffle order. Running the identical oracle sweep with a
deliberately odd partition count (default 7, vs the session's 32)
flushes all of those out.

A second axis: session TIMEZONE. Every event-time query pins UTC
internally (plans.queries._events), but a query that touched ``ts``
outside that device would silently shift under a non-UTC session. Pass
``--tz <zone>`` to run the sweep under an adversarial session zone.

Third axis: ADAPTIVE EXECUTION. AQE rewrites plans at runtime (join
strategy swaps, partition coalescing, skew splits); results must not
depend on which physical plan won. ``--no-aqe`` runs the sweep with
``spark.sql.adaptive.enabled=false``.

Fourth axis: WHOLE-STAGE CODEGEN. ``--no-codegen`` forces the
interpreted expression path — generated and interpreted evaluators have
historically diverged on edge semantics, so the gate must not care
which one ran.

Fifth axis (``--streaming``): the STREAMING TWINS. The four batch axes
never execute the foreachBatch stores, which is exactly where
partitioning bugs hide (per-batch store reads, two-write contracts,
watermark bookkeeping). ``--streaming`` reruns the streaming
batch-equivalence test suite under the adversarial shuffle-partition
count and session timezone (via OTOKUNA_TEST_SHUFFLE_PARTITIONS /
OTOKUNA_TEST_TZ honored by tests/conftest.py) and writes
INVARIANCE_STREAMING.json.

Usage:
    python tools/invariance_check.py [n_partitions] [sf_dir]
                                     [--tz ZONE] [--no-aqe] [--no-codegen]
    python tools/invariance_check.py --streaming [n_partitions] [--tz ZONE]

Round-9 results at HEAD: the 7-partition batch sweep passes 143/143
oracle-paired queries at sf0.01 — including the new two-phase
prefix-sum queries (q71/q151), whose per-partition offset collection
is exactly the partition-dependence risk this sweep targets. The
streaming axis (--streaming, 7 partitions + Asia/Tokyo) passes the
full batch-equivalence suite 24/24, now including the
snapshot-novelty twin (INVARIANCE_STREAMING.json). Round-8 recorded
the same sweep green under Asia/Tokyo, --no-aqe, and --no-codegen.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from otokuna_spark import session  # noqa: E402

_ORIG = session.get_spark


def run_streaming(n_parts: int, tz: str | None) -> int:
    """Streaming axis: the batch-equivalence suite under adversarial
    shuffle partitioning (+ optional tz), recorded to a committed
    artifact. Runs pytest in a SUBPROCESS so the adversarial session is
    fully isolated from this process's Spark state."""
    import json
    import os
    import subprocess

    env = dict(os.environ)
    env["OTOKUNA_TEST_SHUFFLE_PARTITIONS"] = str(n_parts)
    if tz:
        env["OTOKUNA_TEST_TZ"] = tz
    cmd = [sys.executable, "-m", "pytest", "tests/test_streaming.py", "-q", "--tb=line"]
    print(f"streaming invariance: {' '.join(cmd)} @ {n_parts} partitions"
          + (f", tz {tz}" if tz else ""))
    proc = subprocess.run(cmd, env=env, capture_output=True, text=True)
    tail = proc.stdout.strip().splitlines()[-5:]
    print("\n".join(tail))
    doc = {
        "metric": "streaming_invariance",
        "shuffle_partitions": n_parts,
        "session_tz": tz,
        "suite": "tests/test_streaming.py",
        "exit_code": proc.returncode,
        "tail": tail,
    }
    with open("INVARIANCE_STREAMING.json", "w") as f:
        json.dump(doc, f, indent=1)
    print("wrote INVARIANCE_STREAMING.json")
    return proc.returncode


def main(argv: list[str]) -> int:
    tz = None
    no_aqe = "--no-aqe" in argv
    no_codegen = "--no-codegen" in argv
    streaming = "--streaming" in argv
    argv = [a for a in argv if a not in ("--no-aqe", "--no-codegen", "--streaming")]
    record = None
    if "--record" in argv:
        i = argv.index("--record")
        record = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    if "--tz" in argv:
        i = argv.index("--tz")
        tz = argv[i + 1]
        argv = argv[:i] + argv[i + 2 :]
    n_parts = int(argv[0]) if argv else 7
    sf_dir = argv[1] if len(argv) > 1 else "/root/testdata/sf0.01"
    if streaming:
        return run_streaming(n_parts, tz)

    def patched(app_name: str = "otokuna-spark", shuffle_partitions: int | None = None):
        sp = _ORIG(app_name, shuffle_partitions=n_parts)
        if tz:
            sp.conf.set("spark.sql.session.timeZone", tz)
        if no_aqe:
            sp.conf.set("spark.sql.adaptive.enabled", "false")
        if no_codegen:
            sp.conf.set("spark.sql.codegen.wholeStage", "false")
        return sp

    session.get_spark = patched
    import tools.check_oracle as co

    co.get_spark = patched
    from otokuna_spark.plans.queries import REGISTRY

    print(
        f"invariance sweep: {len(REGISTRY)} queries @ {n_parts} shuffle partitions"
        + (f", session tz {tz}" if tz else "")
        + (", AQE off" if no_aqe else "")
        + (", codegen off" if no_codegen else "")
    )
    failures = co.run(sf_dir, sorted(REGISTRY), record_path=None)
    if record:
        import json

        with open(record, "w") as f:
            json.dump(
                {
                    "metric": "batch_invariance",
                    "shuffle_partitions": n_parts,
                    "session_tz": tz,
                    "aqe_disabled": no_aqe,
                    "codegen_disabled": no_codegen,
                    "sf_dir": sf_dir,
                    "registry_size": len(REGISTRY),
                    "failures": failures,
                },
                f,
                indent=1,
            )
        print(f"wrote {record}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
