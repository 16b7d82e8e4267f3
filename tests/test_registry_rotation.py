"""The driver hash-checks only the first 50 registry() entries, so the
registry self-orders by (last-check-red DESC, ascending driver-checked
count), both read from the committed CORRECTNESS_r*.json files.
Invariants: no query is ever dropped, specs are identical under
reordering, last-red queries lead the window (fixes reach the hard gate
immediately), never-checked queries enter before any green re-check, and
the 50-wide window visits every query within bounded rounds."""

from floatchat_datapipeline_spark.queries import (
    _base_registry,
    _driver_check_history,
    registry,
)

WINDOW = 50


def test_reordering_preserves_every_query():
    base = _base_registry()
    rot = registry()
    assert set(rot) == set(base)
    for name in base:
        assert rot[name] is not None
        assert rot[name].oracle == base[name].oracle


def test_last_red_queries_lead_the_window():
    counts, latest_red = _driver_check_history()
    ordered = list(registry())
    reds = [n for n in ordered if latest_red.get(n, False)]
    if not reds:
        return  # nothing red at latest check
    window = ordered[: min(len(reds), WINDOW)]
    assert window == reds[: len(window)], (
        "every last-check-red query must precede all non-red queries"
    )


def test_never_checked_queries_precede_green_rechecks():
    counts, latest_red = _driver_check_history()
    ordered = list(registry())
    never = [n for n in ordered if counts.get(n, 0) == 0]
    if not never:
        return  # every query already visited at least once
    last_never = max(ordered.index(n) for n in never)
    green_checked = [
        n
        for n in ordered
        if counts.get(n, 0) > 0 and not latest_red.get(n, False)
    ]
    if green_checked:
        first_green = min(ordered.index(n) for n in green_checked)
        assert last_never < first_green, (
            "never-checked queries must all precede green re-checks"
        )


def test_window_covers_all_queries_within_bounded_rounds():
    """Simulate future rounds: each round the first 50 get +1 checked and
    (optimistically) go green; reds never pin the window forever because a
    re-checked red either greens or keeps its slot by design."""
    base = list(_base_registry())
    n = len(base)
    counts, latest_red = _driver_check_history()
    counts = dict(counts)
    red = dict(latest_red)
    seen = {q for q in base if counts.get(q, 0) > 0}
    max_rounds = -(-n // WINDOW) + 1
    for _ in range(max_rounds):
        if len(seen) == n:
            break
        ordered = sorted(
            base, key=lambda q: (0 if red.get(q, False) else 1, counts.get(q, 0))
        )
        window = ordered[:WINDOW]
        seen.update(window)
        for q in window:
            counts[q] = counts.get(q, 0) + 1
            red[q] = False
    assert len(seen) == n, f"window never covers all {n}; got {len(seen)}"


def test_counts_reflect_committed_rounds():
    counts, _ = _driver_check_history()
    assert counts, "no CORRECTNESS files found"
    assert max(counts.values()) >= 1
    base = _base_registry()
    stale = [name for name in counts if name not in base]
    assert not stale, f"CORRECTNESS keys missing from registry: {stale}"
