"""Dump .explain("formatted") for named queries to
plans/$PLANS_ROUND/<name>_<tag>.txt (PLANS_ROUND default r14).

Usage: python tools/explain_dump.py <tag> q1,q2[,...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).

Plans are deterministic, so this is safe to run during a CPU-steal
window (unlike timings).
"""

from __future__ import annotations

import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    tag = sys.argv[1]
    names = [n for n in sys.argv[2].split(",") if n]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        ROOT, "plans", os.environ.get("PLANS_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)

    from floatchat_datapipeline_spark.session import get_spark

    spark = get_spark(
        app_name="floatchat-explain-dump",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_ex = plan.count("Exchange")
        print(f"{name}: {len(plan.splitlines())} lines, {n_ex} Exchange -> {path}",
              flush=True)


if __name__ == "__main__":
    main()
