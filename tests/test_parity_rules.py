"""Cross-engine rounding-rule pins (see verify skill gotchas).

Spark's round() HALF_UPs the shortest decimal repr of a double;
DuckDB's rounds the binary value. They disagree exactly when a value's
shortest repr ends on a half boundary while its binary double sits one
ulp below — which quotients of short-decimal sums by integer counts hit
routinely (found live at sf0.1: 1512.12/32 = 47.25375). The engine rule
is therefore: round the SUM, emit the quotient RAW. This test builds the
boundary group explicitly so the rule cannot regress unnoticed."""

from __future__ import annotations

import duckdb
import pandas as pd
from pyspark.sql import functions as F


def test_hourly_avg_parity_on_constructed_half_boundary(spark, tmp_path):
    from floatchat_datapipeline_spark.operators.windows import hourly_rollup

    # 32 events in one hour whose 2dp sum is 1512.12 → avg 47.25375,
    # whose binary double is one ulp BELOW the decimal half boundary:
    # round(·, 4) flips the last digit between Spark and DuckDB.
    vals = [47.25] * 31 + [47.37]
    assert round(sum(vals), 2) == 1512.12
    rows = [
        (i, pd.Timestamp("2024-01-02 16:00:05") + pd.Timedelta(seconds=i), 7, "click", v, "{}")
        for i, v in enumerate(vals)
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)

    from floatchat_datapipeline_spark.catalog import normalize_event_time

    # pandas writes timestamp[ns]; route through the catalog choke point
    # exactly like any events consumer.
    df = normalize_event_time(spark.read.parquet(path))
    got = hourly_rollup(df).select("sum_value", "avg_value").first()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{path}'")
    want = con.execute(
        "SELECT round(sum(value), 2) AS sum_value, "
        "round(sum(value), 2) / count(*) AS avg_value "
        "FROM events GROUP BY date_trunc('hour', ts), event_type"
    ).df().iloc[0]

    assert got["sum_value"] == want["sum_value"] == 1512.12
    # bit-identical quotients — the property an outer round() would break
    assert got["avg_value"] == want["avg_value"]
    # and demonstrate the trap itself: the two engines' round() disagree
    # on this quotient, which is why the engine never rounds it.
    spark_rounded = spark.sql(
        f"SELECT round(CAST({got['avg_value']!r} AS DOUBLE), 4) AS r"
    ).first()["r"]
    duck_rounded = con.execute(
        f"SELECT round(CAST({want['avg_value']!r} AS DOUBLE), 4) AS r"
    ).df().iloc[0]["r"]
    assert spark_rounded != duck_rounded, (
        "engines now agree on boundary rounding — the raw-quotient rule "
        "may be droppable, revisit"
    )
