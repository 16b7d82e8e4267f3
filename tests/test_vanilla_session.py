"""Regression guard: the driver's correctness gate runs __spark_entry__
under its OWN vanilla SparkSession — none of session.py's builder confs
apply. Round 1 lost 9 of 50 gate queries to exactly this gap (events
TIMESTAMP(NANOS) reads need spark.sql.legacy.parquet.nanosAsLong, which
was only set in the factory). The fix lives at the scan choke points
(catalog.ensure_session_confs); this test proves it from a truly vanilla
session by running representative queries in a fresh subprocess — the
in-process test session is factory-built and can't exercise the gap.

One subprocess, several queries: JVM startup dominates, so batching keeps
the guard under a minute.
"""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap

# One query per formerly-broken family: a batch events read, a streaming
# events read (AvailableNow), a JSON-props read, and the flagship entry().
_PROBE = textwrap.dedent(
    """
    import json, sys
    sys.path.insert(0, "/root/repo")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("vanilla-gate-probe")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sf = "/root/testdata/sf0.001"
    out = {}
    for name in (
        "events_hourly",
        "events_props_avg",
        "stream_hourly",
        # round-7 families: sequence/make_interval fan-out, graph memo,
        # spatial md5 coords, ranged cumsum — all must survive vanilla
        "events_sliding_distinct",
        "user_triangles",
        "geo_close_pairs",
        "part_revenue_abc",
    ):
        out[name] = qs[name](spark, sf).count()
    out["entry"] = entry_mod.entry(spark).count()
    print("RESULT:" + json.dumps(out))
    spark.stop()
    """
)


def test_entry_runs_under_vanilla_session():
    proc = subprocess.run(
        [sys.executable, "-c", _PROBE],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = next(
        (ln for ln in proc.stdout.splitlines() if ln.startswith("RESULT:")),
        None,
    )
    assert line is not None, proc.stdout[-2000:]
    counts = json.loads(line[len("RESULT:") :])
    # Non-empty results from every formerly-broken read path.
    assert all(v > 0 for v in counts.values()), counts
