"""A15 — observed pipeline metrics: counters accumulate during the
action itself (no second scan) and match a direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from floatchat_datapipeline_spark.operators.cleaning import clean_argo
from floatchat_datapipeline_spark.plans.argo_views import argo_raw_df
from floatchat_datapipeline_spark.plans.metrics import observe_quality


def test_observed_metrics_match_direct_aggregation(spark, sf_dir):
    cleaned = clean_argo(argo_raw_df(spark, sf_dir))
    run = observe_quality(
        cleaned, numeric_cols=("temperature", "salinity"), name="q_test"
    )
    # Any action materializes the metrics; noop write = no driver data.
    run.df.write.format("noop").mode("overwrite").save()
    m = run.metrics()

    direct = cleaned.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("temperature").alias("t_nn"),
        F.min("temperature").alias("t_min"),
        F.max("temperature").alias("t_max"),
        F.count("salinity").alias("s_nn"),
    ).collect()[0]

    assert m["n_rows"] == direct["n_rows"] > 0
    assert m["temperature_non_null"] == direct["t_nn"]
    assert m["temperature_min"] == direct["t_min"]
    assert m["temperature_max"] == direct["t_max"]
    assert m["salinity_non_null"] == direct["s_nn"]


def test_observation_costs_no_extra_job(spark, sf_dir):
    """The observed plan runs ONE job: observe() must not add a scan.
    Asserted structurally — the observed DataFrame's plan contains the
    CollectMetrics node inline, not a separate aggregation subtree."""
    cleaned = clean_argo(argo_raw_df(spark, sf_dir))
    run = observe_quality(cleaned, numeric_cols=("pressure",), name="q_plan")
    plan = run.df._jdf.queryExecution().optimizedPlan().toString()
    assert "CollectMetrics" in plan, plan
