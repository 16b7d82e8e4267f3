"""The driver hash-checks only the first 50 registry() entries, so the
registry self-orders by ascending driver-checked count (read from the
committed CORRECTNESS_r*.json files). Invariants: no query is ever
dropped, specs are identical under reordering, never-checked queries all
enter the window before any re-check, and the 50-wide window visits every
query within ceil(n/50) rounds."""

from floatchat_datapipeline_spark.queries import (
    _base_registry,
    _times_driver_checked,
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


def test_never_checked_queries_fill_window_first():
    counts = _times_driver_checked()
    ordered = list(registry())
    never = [n for n in ordered if counts.get(n, 0) == 0]
    if not never:
        return  # every query already visited at least once
    window = ordered[:WINDOW]
    # every never-checked query is ahead of every checked one, so the
    # window holds min(|never|, 50) of them
    expect_in_window = min(len(never), WINDOW)
    assert sum(1 for n in window if counts.get(n, 0) == 0) == expect_in_window


def test_window_covers_all_queries_within_bounded_rounds():
    """Simulate future rounds: each round the first 50 get +1 checked."""
    base = list(_base_registry())
    n = len(base)
    counts = dict(_times_driver_checked())
    seen = {q for q in base if counts.get(q, 0) > 0}
    max_rounds = -(-n // WINDOW) + 1
    for _ in range(max_rounds):
        if len(seen) == n:
            break
        ordered = sorted(base, key=lambda q: counts.get(q, 0))
        window = ordered[:WINDOW]
        seen.update(window)
        for q in window:
            counts[q] = counts.get(q, 0) + 1
    assert len(seen) == n, f"window never covers all {n}; got {len(seen)}"


def test_counts_reflect_committed_rounds():
    counts = _times_driver_checked()
    # rounds 1-4 checked the identical 50 queries
    assert counts, "no CORRECTNESS files found"
    assert max(counts.values()) >= 1
    base = _base_registry()
    stale = [name for name in counts if name not in base]
    assert not stale, f"CORRECTNESS keys missing from registry: {stale}"
