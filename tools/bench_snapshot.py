"""Committed-bench hygiene: min-of-3 uncontended snapshot.

Round-7 postmortem: the driver bench ran at load_avg 5.46 and drifted
+15 % on UNCHANGED plans, making round-over-round totals noisy. The
committed BENCH_RESULT.json is the comparable series, so it must be
taken uncontended and de-noised:

- runs `python bench.py` N times (default 3) in fresh processes,
- refuses to write when contended: 1-minute load average > 2.0 at any
  run's start, or the fixed-work CPU probe > 0.5 s (this host's
  hypervisor-steal signal — load average alone reads phantom 2-3 with
  zero processes; the probe is the honest gauge),
- merges per-query MIN across runs into BENCH_RESULT.json and records
  the per-run probes/loads under "snapshot" so a reader can judge the
  conditions.

Usage: python tools/bench_snapshot.py [runs]
Env: BENCH_SNAPSHOT_FORCE=1 skips the contention gate (records it).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULT = os.path.join(ROOT, "BENCH_RESULT.json")

MAX_LOAD = 2.0
MAX_PROBE = 0.5


def _cpu_probe() -> float:
    import time

    t0 = time.time()
    s = 0
    for i in range(10_000_000):
        s += i
    return round(time.time() - t0, 3)


def _wait_for_healthy_cpu(max_wait_s: int = 1800) -> float:
    """Block until the steal probe clears MAX_PROBE (round-13 lesson:
    this host runs sustained >1 h windows at ~2.5× slowdown — probing
    only AFTER run 1 wastes a full bench pass per refusal). Returns the
    last probe; gives up after max_wait_s and lets the per-run gate
    decide."""
    import time

    waited = 0
    probe = _cpu_probe()
    while probe > MAX_PROBE and waited < max_wait_s:
        print(
            f"cpu probe {probe} s > {MAX_PROBE} s — steal window, "
            f"waiting ({waited}/{max_wait_s} s)",
            flush=True,
        )
        time.sleep(60)
        waited += 60
        probe = _cpu_probe()
    return probe


def main() -> None:
    import time

    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    force = os.environ.get("BENCH_SNAPSHOT_FORCE") == "1"
    if not force:
        _wait_for_healthy_cpu()
    merged: dict | None = None
    probes: list[float] = []
    loads: list[float] = []
    totals: list[float] = []
    for i in range(runs):
        load0 = round(os.getloadavg()[0], 2)
        if i > 0:
            # Between runs the 1-minute average still carries OUR OWN
            # previous bench (local[32] for ~3.5 min) — that is not
            # contention. Wait for it to decay instead of refusing.
            waited = 0
            while load0 > MAX_LOAD and waited < 300:
                time.sleep(20)
                waited += 20
                load0 = round(os.getloadavg()[0], 2)
        if load0 > MAX_LOAD and not force:
            print(
                f"refusing: load_avg {load0} > {MAX_LOAD} before run {i + 1} "
                "(BENCH_SNAPSHOT_FORCE=1 to override)"
            )
            sys.exit(1)
        if i > 0 and not force:
            # a steal window can open mid-snapshot; don't burn a run on it
            _wait_for_healthy_cpu(max_wait_s=900)
        rc = subprocess.run(
            [sys.executable, os.path.join(ROOT, "bench.py")],
            cwd=ROOT,
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        ).returncode
        if rc != 0:
            print(f"bench run {i + 1} failed rc={rc}")
            sys.exit(rc)
        with open(RESULT) as f:
            res = json.load(f)
        probe = res.get("cpu_probe_seconds", 0.0)
        probes.append(probe)
        loads.append(res.get("load_avg_start_1m", load0))
        totals.append(res.get("value", 0.0))
        print(
            f"run {i + 1}/{runs}: total {res.get('value')} s, "
            f"probe {probe} s, load_start {loads[-1]}"
        )
        if probe > MAX_PROBE and not force:
            print(
                f"refusing: cpu probe {probe} s > {MAX_PROBE} s (slow host "
                "window; BENCH_SNAPSHOT_FORCE=1 to override)"
            )
            sys.exit(1)
        if merged is None:
            merged = res
        else:
            q = merged["queries"]
            for name, sec in res.get("queries", {}).items():
                q[name] = min(q.get(name, sec), sec)
            merged["errors"] = {
                **res.get("errors", {}),
                **merged.get("errors", {}),
            } or None
            if not merged["errors"]:
                merged.pop("errors", None)
    assert merged is not None
    merged["value"] = round(
        sum(v for n, v in merged["queries"].items() if not n.endswith("_train")),
        3,
    )
    merged["one_time_train_seconds"] = round(
        sum(v for n, v in merged["queries"].items() if n.endswith("_train")), 3
    )
    merged["snapshot"] = {
        "runs": runs,
        "aggregation": "per-query min",
        "cpu_probes": probes,
        "load_starts": loads,
        "run_totals": totals,
        "forced": force,
    }
    with open(RESULT, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
        f.write("\n")
    print(
        f"wrote BENCH_RESULT.json: min-of-{runs} total {merged['value']} s "
        f"({len(merged['queries'])} rows)"
    )


if __name__ == "__main__":
    main()
