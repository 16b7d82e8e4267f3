"""The driver hash-checks only the first 50 registry() entries, so the
registry rotates deterministically per round (keyed off the committed
CORRECTNESS_r*.json count). Invariants: no query is ever dropped, specs
are identical under rotation, and the 50-wide window visits every query
within a bounded number of rounds."""

from floatchat_datapipeline_spark.queries import (
    _base_registry,
    _coverage_rotation_offset,
    registry,
)

WINDOW = 50


def test_rotation_preserves_every_query():
    base = _base_registry()
    rot = registry()
    assert set(rot) == set(base)
    for name in base:
        assert rot[name] is not None
        assert rot[name].oracle == base[name].oracle


def test_window_covers_all_queries_within_bounded_rounds():
    names = list(_base_registry())
    n = len(names)
    stride = 32
    seen: set[str] = set()
    rounds_needed = None
    for r in range(0, 20):
        k = (stride * r) % n
        rotated = names[k:] + names[:k]
        seen.update(rotated[:WINDOW])
        if len(seen) == n:
            rounds_needed = r
            break
    assert rounds_needed is not None and rounds_needed <= 4, (
        f"window never covers all {n} queries; covered {len(seen)}"
    )


def test_current_offset_is_valid():
    n = len(_base_registry())
    k = _coverage_rotation_offset(n)
    assert 0 <= k < n
