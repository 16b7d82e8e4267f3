"""The driver hash-checks only the first 50 registry() entries, so the
registry self-orders by (needs-the-gate DESC, latest-check-round ASC,
ascending driver-checked count), read from the committed
CORRECTNESS_r*.json files. "Needs the gate" = latest check failed, OR
latest check was a rows-only pass but the query has since grown an
oracle (its hash has never been checked). Greens cycle by OLDEST
EVIDENCE first (round of latest valid check), so no query's driver
hash goes unboundedly stale. Invariants: no query is ever dropped,
specs are identical under reordering, gate-needing queries lead the
window, never-checked queries enter before any green re-check,
permanently oracle-less queries cycle like greens (no permanent
red-pin), the window prefers stale evidence, and the 50-wide window
visits every query within bounded rounds."""

from floatchat_datapipeline_spark.queries import (
    _base_registry,
    _driver_check_history,
    query_fingerprint,
    registry,
)

WINDOW = 50


def _current_fps():
    return {n: query_fingerprint(s) for n, s in _base_registry().items()}


def _history():
    """The same fingerprint-filtered view registry() sorts on."""
    return _driver_check_history(_current_fps())


def _needs_gate_set():
    base = _base_registry()
    counts, latest_red, latest_rows_only, _latest_round = _history()
    return {
        n
        for n in base
        if latest_red.get(n, False)
        or (latest_rows_only.get(n, False) and base[n].oracle is not None)
    }


def test_reordering_preserves_every_query():
    base = _base_registry()
    rot = registry()
    assert set(rot) == set(base)
    for name in base:
        assert rot[name] is not None
        assert rot[name].oracle == base[name].oracle


def test_gate_needing_queries_lead_the_window():
    ordered = list(registry())
    need = [n for n in ordered if n in _needs_gate_set()]
    if not need:
        return  # nothing needs the gate
    window = ordered[: min(len(need), WINDOW)]
    assert window == need[: len(window)], (
        "every gate-needing query must precede all settled queries"
    )


def test_never_checked_queries_precede_green_rechecks():
    counts, latest_red, _, _ = _history()
    ordered = list(registry())
    need = _needs_gate_set()
    never = [n for n in ordered if counts.get(n, 0) == 0]
    if not never:
        return  # every query already visited at least once
    last_never = max(ordered.index(n) for n in never)
    settled_checked = [
        n for n in ordered if counts.get(n, 0) > 0 and n not in need
    ]
    if settled_checked:
        first_green = min(ordered.index(n) for n in settled_checked)
        assert last_never < first_green, (
            "never-checked queries must all precede green re-checks"
        )


def test_oracle_less_queries_do_not_red_pin():
    """A permanently oracle-less query whose latest driver row was a
    rows-only pass must NOT sort into the gate-needing tier — red-pinning
    it would park it at the head of the window forever, displacing real
    hash checks round after round."""
    base = _base_registry()
    _, latest_red, latest_rows_only, _ = _history()
    need = _needs_gate_set()
    for n in base:
        if base[n].oracle is None and latest_rows_only.get(n, False):
            assert n not in need, n
            assert not latest_red.get(n, True), (
                f"{n}: a rows-only pass must read as green"
            )


def test_rows_only_history_with_new_oracle_reenters_window():
    """A query whose latest check predates its oracle (recorded as
    err=no_oracle) must be treated as gate-needing — the hash check has
    never seen it."""
    base = _base_registry()
    _, _, latest_rows_only, _ = _history()
    stale = [
        n
        for n in base
        if latest_rows_only.get(n, False) and base[n].oracle is not None
    ]
    ordered = list(registry())
    for n in stale:
        assert ordered.index(n) < WINDOW, (
            f"{n} grew an oracle but would not be re-checked"
        )


def test_window_covers_all_queries_within_bounded_rounds():
    """Simulate future rounds with the REAL sort key: each round the
    first 50 get checked (latest_round advances) and optimistically
    settle; the window must reach every query."""
    base = _base_registry()
    names = list(base)
    n = len(names)
    counts, latest_red, latest_rows_only, latest_round = _history()
    counts = dict(counts)
    latest_round = dict(latest_round)
    rnd = max(latest_round.values(), default=0)
    need = _needs_gate_set()
    seen = {q for q in names if counts.get(q, 0) > 0}
    max_rounds = -(-n // WINDOW) + 1
    for _ in range(max_rounds):
        if len(seen) == n:
            break
        rnd += 1
        ordered = sorted(
            names,
            key=lambda q: (
                0 if q in need else 1,
                latest_round.get(q, 0),
                counts.get(q, 0),
            ),
        )
        window = ordered[:WINDOW]
        seen.update(window)
        for q in window:
            counts[q] = counts.get(q, 0) + 1
            latest_round[q] = rnd
            need.discard(q)
    assert len(seen) == n, f"window never covers all {n}; got {len(seen)}"


def test_window_prefers_stalest_evidence():
    """Greens must enter the window oldest-latest-check first: no green
    outside the window may have STALER evidence than a green inside it
    (VERDICT r8 item 2 — ascending-count ordering stranded the r4 tier,
    whose queries carry counts up to 4 from rounds 1-4 re-checking the
    same fixed 50, behind the once-checked r7/r8 tier)."""
    counts, _, _, latest_round = _history()
    need = _needs_gate_set()
    ordered = list(registry())
    greens = [n for n in ordered if n not in need and counts.get(n, 0) > 0]
    inside = [n for n in greens if ordered.index(n) < WINDOW]
    outside = [n for n in greens if ordered.index(n) >= WINDOW]
    if not inside or not outside:
        return
    worst_inside = max(latest_round[n] for n in inside)
    best_outside = min(latest_round[n] for n in outside)
    assert worst_inside <= best_outside, (
        f"a green inside the window has evidence from round {worst_inside} "
        f"while one outside is staler (round {best_outside})"
    )


def test_counts_reflect_committed_rounds():
    counts, _, _, _ = _driver_check_history()  # unfiltered: raw committed rows
    assert counts, "no CORRECTNESS files found"
    assert max(counts.values()) >= 1
    base = _base_registry()
    stale = [name for name in counts if name not in base]
    assert not stale, f"CORRECTNESS keys missing from registry: {stale}"


def test_edited_query_reenters_as_never_checked(tmp_path):
    """Edit-awareness: a green driver check whose committed fingerprint
    snapshot differs from the query's CURRENT source must be discarded —
    the edited query re-enters the rotation as never-checked instead of
    cycling as a stale green (the round-7 supplier_part_diversity trap)."""
    import json

    from floatchat_datapipeline_spark.queries import _EDIT_INVALIDATIONS

    base = _base_registry()
    fps = _current_fps()
    # pick queries with NO manual invalidation entry — an entry would
    # (correctly) discard the synthetic round-1 check for its own reason
    # and break this test's "untouched" premise
    clean = sorted(n for n in base if n not in _EDIT_INVALIDATIONS)
    edited, untouched = clean[0], clean[1]
    green_row = {
        "rows_match": True,
        "schema_match": True,
        "hash_match": True,
        "err": None,
        "spark_rows": 7,
    }
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps({edited: green_row, untouched: green_row})
    )
    (tmp_path / "FINGERPRINTS.json").write_text(
        json.dumps(
            {
                "rounds": {
                    "1": {
                        edited: "0" * 32,  # snapshot != current source
                        untouched: fps[untouched],
                    }
                }
            }
        )
    )
    counts, latest_red, _, _ = _driver_check_history(fps, root=str(tmp_path))
    assert counts.get(edited, 0) == 0, (
        "edited query's stale check must not count"
    )
    assert edited not in latest_red, "edited query must not carry stale color"
    assert counts.get(untouched) == 1, (
        "matching-fingerprint check must still count"
    )
    assert latest_red.get(untouched) is False


def test_round_without_snapshot_counts_as_valid(tmp_path):
    """Legacy rounds (no fingerprint snapshot committed) keep their
    checks — mass-invalidating seven rounds of history would churn the
    whole rotation."""
    import json

    from floatchat_datapipeline_spark.queries import _EDIT_INVALIDATIONS

    base = _base_registry()
    fps = _current_fps()
    # a manual invalidation entry would (correctly) discard the
    # synthetic legacy check for its own reason — pick a clean query
    q = sorted(n for n in base if n not in _EDIT_INVALIDATIONS)[0]
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                q: {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": True,
                    "err": None,
                    "spark_rows": 3,
                }
            }
        )
    )
    counts, _, _, _ = _driver_check_history(fps, root=str(tmp_path))
    assert counts.get(q) == 1


def test_upcoming_round_snapshot_is_current():
    """FINGERPRINTS.json must hold a snapshot for the UPCOMING driver
    round that matches every query's current source — otherwise the next
    round's checks could not be validated later. Regenerate with
    `python tools/gen_fingerprints.py` after editing any query."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
    import gen_fingerprints

    root = Path(__file__).resolve().parents[1]
    rnd = gen_fingerprints.next_round(str(root))
    import json

    data = json.loads((root / "FINGERPRINTS.json").read_text())
    snap = data.get("rounds", {}).get(str(rnd))
    assert snap is not None, (
        f"no fingerprint snapshot for upcoming round {rnd}; "
        "run python tools/gen_fingerprints.py"
    )
    current = _current_fps()
    stale = sorted(
        n for n in current if snap.get(n) != current[n]
    ) + sorted(n for n in snap if n not in current)
    assert not stale, (
        f"fingerprint snapshot for round {rnd} is stale for {stale[:5]}...; "
        "run python tools/gen_fingerprints.py"
    )
