"""Physical-plan regression gate: the committed PLAN_AUDIT.md census is
a baseline; re-census every registry query and FAIL if an existing
query's shuffle (Exchange) or nested-loop/cartesian-join count GREW — a
deliberate pessimization (dropping an F.broadcast, adding an accidental
shuffle) must be caught by CI, not discovered at 100 TB. Improvements
and new queries don't fail; regenerate the baseline with
`python tools/plan_audit.py` after intentional plan changes.

The census only PLANS (executedPlan is stringified, never run), so the
whole 190+-query sweep is driver-side Catalyst work; queries with an
eager build phase (ANN training, streaming materialize-to-sink) execute
their one-time builds, same as the generator tool.
"""

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
import plan_audit  # noqa: E402


@pytest.fixture(scope="module")
def fresh_census(spark):
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    rows = plan_audit.census(spark, sf)
    return {r[0]: r for r in rows}


def test_baseline_exists_and_parses():
    committed = plan_audit.parse_committed()
    assert len(committed) >= 150, (
        "PLAN_AUDIT.md missing or unparseable; run python tools/plan_audit.py"
    )


def test_no_query_plans_with_more_shuffles_or_nl_joins(fresh_census):
    committed = plan_audit.parse_committed()
    regressions = []
    errors = []
    for name, row in fresh_census.items():
        if row[1] == "ERROR":
            errors.append((name, row[2]))
            continue
        base = committed.get(name)
        if base is None or not isinstance(base.get("shuffles"), int):
            continue  # new query (or baseline row was an error): no gate yet
        _, shuffles, _bc, _sj, nl, _py, _pd = row
        if shuffles > base["shuffles"]:
            regressions.append(
                f"{name}: shuffles {base['shuffles']} -> {shuffles}"
            )
        if isinstance(base.get("nl_joins"), int) and nl > base["nl_joins"]:
            regressions.append(
                f"{name}: NL/cartesian joins {base['nl_joins']} -> {nl}"
            )
    assert not errors, f"queries failed to plan: {errors[:5]}"
    assert not regressions, (
        "plan pessimization vs committed PLAN_AUDIT.md (if intentional, "
        "regenerate with python tools/plan_audit.py): "
        + "; ".join(regressions)
    )


def test_census_covers_registry(fresh_census):
    from floatchat_datapipeline_spark.queries import _base_registry

    missing = set(_base_registry()) - set(fresh_census)
    assert not missing, f"census skipped queries: {sorted(missing)[:5]}"


def test_gate_detects_a_pessimization(fresh_census):
    """Meta-test: the comparison logic itself flags a grown count (guards
    against a silently-vacuous gate if the table format drifts)."""
    committed = plan_audit.parse_committed()
    name = next(
        n
        for n, r in fresh_census.items()
        if r[1] != "ERROR"
        and n in committed
        and isinstance(committed[n].get("shuffles"), int)
    )
    worse = list(fresh_census[name])
    worse[1] = committed[name]["shuffles"] + 1
    base = committed[name]
    assert worse[1] > base["shuffles"], "synthetic pessimization must trip"
