"""Snapshot per-query source fingerprints for the NEXT driver round.

The registry's edit-aware rotation (queries._driver_check_history)
discards a round's CORRECTNESS check for a query whose committed
fingerprint at that round differs from the query's current source —
an edited query re-enters the driver window as never-checked. This
tool writes the snapshot the NEXT round's checks will be matched
against: round = max committed CORRECTNESS_r*.json round + 1.

Run before the round's final commit (tests/test_registry_rotation.py
fails if the upcoming round's snapshot is stale). Earlier rounds'
entries are never modified.

Usage: python tools/gen_fingerprints.py   (writes FINGERPRINTS.json)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from floatchat_datapipeline_spark.queries import (  # noqa: E402
    _base_registry,
    query_fingerprint,
)


def next_round(root: str = ROOT) -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return (max(rounds) if rounds else 0) + 1


def current_fingerprints() -> dict[str, str]:
    return {
        name: query_fingerprint(spec)
        for name, spec in sorted(_base_registry().items())
    }


def main() -> None:
    path = os.path.join(ROOT, "FINGERPRINTS.json")
    try:
        with open(path) as f:
            data = json.load(f)
    except (OSError, ValueError):
        data = {}
    rounds = data.setdefault("rounds", {})
    rnd = next_round()
    rounds[str(rnd)] = current_fingerprints()
    with open(path, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"FINGERPRINTS.json: round {rnd}, {len(rounds[str(rnd)])} queries")


if __name__ == "__main__":
    main()
