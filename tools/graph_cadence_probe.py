"""Round-14 re-probe of the graph-iterative checkpoint cadences
(VERDICT r13 item 7): time each fixed-point operator at several
localCheckpoint cadences on a healthy host, bench-protocol style
(fresh session, warmed readers/UDF workers, min-of-N noop sinks).

The §2.6 "overlap independent jobs" suggestion does not apply inside
these operators: every iteration's gather depends on the previous
iteration's ranks/labels/survivors, and the only extra jobs are the
eager checkpoints themselves, which sit on that same dependency chain —
there is no independent branch to run concurrently. What CAN move is
the cadence, so that is what this probe measures.

Usage: python tools/graph_cadence_probe.py [reps]
"""

from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _cpu_probe() -> float:
    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.time() - t0, 3)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    probe0 = _cpu_probe()

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    from floatchat_datapipeline_spark.catalog import load_table
    from floatchat_datapipeline_spark.operators import graph
    from floatchat_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="floatchat-cadence-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    _warm = F.pandas_udf(lambda x: x, LongType())
    spark.range(1000).repartition(64).select(_warm("id")).write.format(
        "noop"
    ).mode("overwrite").save()

    ev = load_table(spark, sf_dir, "events")
    edges = graph.coactivity_edges(ev, cache_key=sf_dir)  # memoized, warm
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pedges = graph.purchase_edges(orders, li, cache_key=sf_dir)

    def t(fn) -> float:
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        return round(best, 3)

    results: dict[str, float] = {}
    for cad in (2, 3, 5, 10):
        results[f"pagerank_ck{cad}"] = t(
            lambda c=cad: graph.pagerank_fixed_point(
                edges, iters=10, checkpoint_every=c
            )
        )
    seeds = (
        edges.select(F.col("src").alias("node")).distinct().orderBy("node").limit(5)
    )
    for cad in (2, 3, 5, 10):
        results[f"ppr_ck{cad}"] = t(
            lambda c=cad: graph.personalized_pagerank_fixed_point(
                edges, seeds, iters=10, checkpoint_every=c
            )
        )
    # hits_fixed_point hard-codes its measured every-2 cadence
    # (PLANS.md round-12: 77 s no-checkpoint / 8.3 s lazy / 5.6 s
    # eager-every-2); time it as-is for the table.
    results["hits_every2_asis"] = t(
        lambda: graph.hits_fixed_point(pedges, iters=4, pre_checkpointed=True)
    )
    print(
        json.dumps(
            {
                "results": results,
                "reps": reps,
                "sf_dir": sf_dir,
                "cpu_probe_start": probe0,
                "cpu_probe_end": _cpu_probe(),
                "load_1m": round(os.getloadavg()[0], 2),
            },
            indent=1,
        )
    )


if __name__ == "__main__":
    main()
