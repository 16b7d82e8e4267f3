"""Id synthesis & extraction expressions (P8, C10).

The reference synthesizes ids from list positions (`profile_{i+1}`,
sync_supabase_to_chromadb.py:207) — nondeterministic under partition
parallelism. Engine policy (SURVEY.md §7.4.3): ids are ALWAYS content-
derived expressions, so re-running any stage on any partitioning yields
identical keys (idempotent sinks depend on this).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def float_id_from_filename(fname: Column | str) -> Column:
    """P8 — extract float id from names like 'nodc_D1900975_339.nc'
    (reference fastapi_app.py:660-675: strip the D/R descending/realtime
    prefix, keep digits)."""
    return F.regexp_extract(_c(fname), r"_[DR]?(\d+)_", 1)


def embedding_doc_id(float_id: Column | str, deploy_date: Column | str) -> Column:
    """C10 — `float_{id}_{yyyymmdd}` document key
    (reference preprocess_floats_to_chromadb.py:291-302)."""
    return F.concat(
        F.lit("float_"),
        _c(float_id),
        F.lit("_"),
        F.date_format(_c(deploy_date), "yyyyMMdd"),
    )


def content_uid(*cols: Column | str) -> Column:
    """C10 general form — deterministic uid from content columns: a stable
    replacement for the reference's positional / uuid4 ids
    (fastapi_app.py:399,639). sha2 over the concatenated natural key."""
    return F.sha2(F.concat_ws("\x1f", *[_c(c) for c in cols]), 256)
