"""Full-registry oracle verification: every declared query vs DuckDB.

Mirrors the driver's correctness gate (value compare via
tests/oracle_utils.compare) over ALL registry entries at the given SF
dir, in one Spark session. Prints one line per query and a final
summary; exit code 1 if anything mismatched.

Usage: python tools/verify_all.py [sf_dir] [only_csv]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    from oracle_utils import compare, duckdb_con

    from floatchat_datapipeline_spark.session import get_spark

    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="floatchat-verify-all",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    osql = entry_mod.oracle_sql()
    con = duckdb_con(sf_dir)
    bad: list[str] = []
    names = sorted(qs)
    if only:
        names = [n for n in names if n in only]
    for i, name in enumerate(names):
        t0 = time.time()
        try:
            compare(qs[name](spark, sf_dir), con, osql[name], name)
            print(f"[{i+1}/{len(names)}] {name} OK {time.time()-t0:.1f}s", flush=True)
        except Exception:
            bad.append(name)
            print(f"[{i+1}/{len(names)}] {name} FAIL {time.time()-t0:.1f}s", flush=True)
            traceback.print_exc()
    print(f"SUMMARY: {len(names) - len(bad)}/{len(names)} OK; failures: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
