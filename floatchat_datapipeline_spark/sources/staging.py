"""Driver-side file staging with idempotent caching (S5/S6/K9).

The reference's downloaders skip files that already exist on disk
(load_data.py:80-83, download.py:26-32) — a path-keyed cache. The engine
keeps the same contract: ``stage`` is given (name → producer) pairs and
invokes a producer ONLY for names missing from the staging dir, so
re-running an ingest never re-fetches. Network fetch itself is injected
by the caller (requests/urllib at deployment; deterministic local
producers in tests — this container has no network).

Scale note: staging is a driver/edge concern, not an engine operator —
at 100 TB files land via bulk transfer and the engine's entry point is
the binaryFile/streaming source over the landing directory.
"""

from __future__ import annotations

import os
from typing import Callable, Mapping


def stage(
    target_dir: str,
    producers: Mapping[str, Callable[[], bytes]],
) -> dict[str, bool]:
    """Materialize each named file unless already present. Returns
    {name: fetched?} — False means the cache satisfied it (K9)."""
    os.makedirs(target_dir, exist_ok=True)
    fetched: dict[str, bool] = {}
    for name, produce in producers.items():
        path = os.path.join(target_dir, name)
        if os.path.exists(path):
            fetched[name] = False
            continue
        data = produce()
        tmp = path + ".part"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)  # atomic: readers never see partial files
        fetched[name] = True
    return fetched
