"""Degenerate-input robustness sweep: run every registry query against
pathological tables and catch engine aborts.

Motivation: round-11 review found q_events_anova_f aborting with ANSI
DIVIDE_BY_ZERO on a moment row with zero within-group variance — a
whole CLASS of risk for the fixed-double-tree statistics queries, none
of which the sf0.01 driver gate can reach because the generated data is
never degenerate. This sweep makes the class testable: it generates two
schema-identical fixture variants and runs all of queries() against
each, recording every exception.

Variants (written under /tmp/degenerate_sweep/):
- tiny/     minimal row counts with edge rows: a single-word and an
            EMPTY document, a zero-norm embedding vector next to normal
            ones, 3 events for one user, 1-2 rows per TPC-H table.
- constant/ ~30 identical rows per fact table: one user, one event
            type, one VALUE, one timestamp (all windows tie), duplicate
            keys everywhere, identical docs, identical embeddings.

A query may legitimately return 0 rows on these inputs; it must not
abort. Exit code 1 when any query raises, with a per-query report on
stdout; nothing is written into the repo.

Usage: python tools/degenerate_sweep.py [tiny|constant] [--only q1,q2,...]
(default: both variants, all registry queries)
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

BASE = "/tmp/degenerate_sweep"
DIM = 64


def _write(path: str, df) -> None:
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    # pandas datetime64[ns] would write parquet TIMESTAMP(NANOS), which
    # the engine session reads as LONG nanos (nanosAsLong) — the real
    # testdata is TIMESTAMP(MICROS), so match it.
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), path)


def gen_tiny(d: str) -> None:
    import numpy as np
    import pandas as pd

    os.makedirs(d, exist_ok=True)
    ts = pd.Timestamp("2024-03-01 12:00:00")
    _write(
        os.path.join(d, "region.parquet"),
        pd.DataFrame(
            {"r_regionkey": np.int32([0]), "r_name": ["REGION0"]}
        ),
    )
    _write(
        os.path.join(d, "nation.parquet"),
        pd.DataFrame(
            {
                "n_nationkey": np.int32([0, 1]),
                "n_name": ["NATION0", "NATION1"],
                "n_regionkey": np.int32([0, 0]),
            }
        ),
    )
    _write(
        os.path.join(d, "customer.parquet"),
        pd.DataFrame(
            {
                "c_custkey": np.int64([1]),
                "c_name": ["Customer#1"],
                "c_nationkey": np.int32([0]),
                "c_acctbal": [0.0],
                "c_mktsegment": ["BUILDING"],
            }
        ),
    )
    _write(
        os.path.join(d, "supplier.parquet"),
        pd.DataFrame(
            {
                "s_suppkey": np.int64([1]),
                "s_name": ["Supplier#1"],
                "s_nationkey": np.int32([0]),
                "s_acctbal": [0.0],
            }
        ),
    )
    _write(
        os.path.join(d, "part.parquet"),
        pd.DataFrame(
            {
                "p_partkey": np.int64([1]),
                "p_name": ["green part"],
                "p_brand": ["Brand#1"],
                "p_type": ["PROMO CASE"],
                "p_size": np.int32([1]),
                "p_retailprice": [1.0],
            }
        ),
    )
    _write(
        os.path.join(d, "orders.parquet"),
        pd.DataFrame(
            {
                "o_orderkey": np.int64([1]),
                "o_custkey": np.int64([1]),
                "o_orderstatus": ["F"],
                "o_totalprice": [1.0],
                "o_orderdate": [ts],
                "o_orderpriority": ["1-URGENT"],
            }
        ),
    )
    _write(
        os.path.join(d, "lineitem.parquet"),
        pd.DataFrame(
            {
                "l_orderkey": np.int64([1]),
                "l_partkey": np.int64([1]),
                "l_suppkey": np.int64([1]),
                "l_linenumber": np.int32([1]),
                "l_quantity": [1.0],
                "l_extendedprice": [1.0],
                "l_discount": [0.0],
                "l_tax": [0.0],
                "l_returnflag": ["R"],
                "l_linestatus": ["F"],
                "l_shipdate": [ts],
            }
        ),
    )
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64([1, 2, 3]),
                "ts": [ts, ts + pd.Timedelta(hours=1), ts + pd.Timedelta(hours=2)],
                "user_id": np.int64([7, 7, 7]),
                "event_type": ["click", "click", "purchase"],
                "value": [0.0, 1.0, 1.0],
                "props": ['{"k": 0}', "{}", '{"k": 1}'],
            }
        ),
    )
    _write(
        os.path.join(d, "documents.parquet"),
        pd.DataFrame(
            {
                "doc_id": np.int64([1, 2, 3]),
                "text": ["hello", "", "hello world again and again"],
                "lang": ["en", "en", "en"],
                "source": ["src0", "src0", "src1"],
                "n_chars": np.int64([5, 0, 27]),
            }
        ),
    )
    vec = [0.5] * DIM
    _write(
        os.path.join(d, "embeddings.parquet"),
        pd.DataFrame(
            {
                "vec_id": np.int64([1, 2, 3]),
                "embedding": [
                    np.float32(vec),
                    np.float32([0.0] * DIM),  # zero-norm row
                    np.float32([float(i % 7) / 7 for i in range(DIM)]),
                ],
                "label": np.int32([0, 1, 2]),
            }
        ),
    )


def gen_constant(d: str) -> None:
    import numpy as np
    import pandas as pd

    os.makedirs(d, exist_ok=True)
    n = 30
    ts = pd.Timestamp("2024-03-01 12:00:00")
    _write(
        os.path.join(d, "region.parquet"),
        pd.DataFrame(
            {"r_regionkey": np.int32([0] * 2), "r_name": ["R"] * 2}
        ),
    )
    _write(
        os.path.join(d, "nation.parquet"),
        pd.DataFrame(
            {
                "n_nationkey": np.int32([0] * 5),
                "n_name": ["N"] * 5,
                "n_regionkey": np.int32([0] * 5),
            }
        ),
    )
    _write(
        os.path.join(d, "customer.parquet"),
        pd.DataFrame(
            {
                "c_custkey": np.int64([1] * n),
                "c_name": ["C"] * n,
                "c_nationkey": np.int32([0] * n),
                "c_acctbal": [5.0] * n,
                "c_mktsegment": ["BUILDING"] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "supplier.parquet"),
        pd.DataFrame(
            {
                "s_suppkey": np.int64([1] * n),
                "s_name": ["S"] * n,
                "s_nationkey": np.int32([0] * n),
                "s_acctbal": [5.0] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "part.parquet"),
        pd.DataFrame(
            {
                "p_partkey": np.int64([1] * n),
                "p_name": ["part"] * n,
                "p_brand": ["Brand#1"] * n,
                "p_type": ["PROMO CASE"] * n,
                "p_size": np.int32([1] * n),
                "p_retailprice": [1.0] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "orders.parquet"),
        pd.DataFrame(
            {
                "o_orderkey": np.int64([1] * n),
                "o_custkey": np.int64([1] * n),
                "o_orderstatus": ["F"] * n,
                "o_totalprice": [1.0] * n,
                "o_orderdate": [ts] * n,
                "o_orderpriority": ["1-URGENT"] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "lineitem.parquet"),
        pd.DataFrame(
            {
                "l_orderkey": np.int64([1] * n),
                "l_partkey": np.int64([1] * n),
                "l_suppkey": np.int64([1] * n),
                "l_linenumber": np.int32([1] * n),
                "l_quantity": [1.0] * n,
                "l_extendedprice": [1.0] * n,
                "l_discount": [0.0] * n,
                "l_tax": [0.0] * n,
                "l_returnflag": ["R"] * n,
                "l_linestatus": ["F"] * n,
                "l_shipdate": [ts] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "events.parquet"),
        pd.DataFrame(
            {
                "event_id": np.int64([1] * n),
                "ts": [ts] * n,
                "user_id": np.int64([7] * n),
                "event_type": ["click"] * n,
                "value": [1.0] * n,
                "props": ['{"k": 1}'] * n,
            }
        ),
    )
    _write(
        os.path.join(d, "documents.parquet"),
        pd.DataFrame(
            {
                "doc_id": np.int64([1] * n),
                "text": ["same text every time"] * n,
                "lang": ["en"] * n,
                "source": ["src0"] * n,
                "n_chars": np.int64([20] * n),
            }
        ),
    )
    _write(
        os.path.join(d, "embeddings.parquet"),
        pd.DataFrame(
            {
                "vec_id": np.int64([1] * n),
                "embedding": [np.float32([0.5] * DIM)] * n,
                "label": np.int32([0] * n),
            }
        ),
    )


def main() -> None:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    which = argv[0] if argv else "both"
    variants = []
    if which in ("tiny", "both"):
        variants.append(("tiny", gen_tiny))
    if which in ("constant", "both"):
        variants.append(("constant", gen_constant))

    from floatchat_datapipeline_spark.session import get_spark

    sys.path.insert(0, ROOT)
    import __spark_entry__ as entry_mod

    spark = get_spark(
        app_name="degenerate-sweep",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    qs = entry_mod.queries()
    if only is not None:
        missing = only - set(qs)
        if missing:
            raise SystemExit(f"--only names not in registry: {sorted(missing)}")
        qs = {k: v for k, v in qs.items() if k in only}
    failures: dict[str, dict[str, str]] = {}
    for vname, gen in variants:
        d = os.path.join(BASE, vname)
        gen(d)
        print(f"== {vname} ({d}) ==", flush=True)
        for name, fn in qs.items():
            t0 = time.time()
            try:
                n_rows = len(fn(spark, d).collect())
                status = f"ok {n_rows} rows"
            except Exception as exc:  # noqa: BLE001 — the sweep's point
                first = f"{type(exc).__name__}: {exc}".splitlines()[0][:200]
                failures.setdefault(vname, {})[name] = first
                status = f"FAIL {first}"
            print(f"  {name:38s} {status} ({time.time() - t0:.1f}s)", flush=True)
    total_fail = sum(len(v) for v in failures.values())
    print(f"\nfailures: {total_fail}")
    for vname, errs in failures.items():
        for name, msg in sorted(errs.items()):
            print(f"  [{vname}] {name}: {msg}")
    sys.exit(1 if total_fail else 0)


if __name__ == "__main__":
    main()
