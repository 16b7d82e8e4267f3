"""Z-order (Morton) clustering keys — multi-column data layout.

A single-column cluster sort (compact_table's `sort_by`) makes parquet
min/max stats selective on ONE column; queries filtering on a second
column still scan every file. Interleaving the bits of several columns
into one Morton key and sorting by IT bounds every file's span in ALL
interleaved dimensions at once — the Delta/Iceberg `OPTIMIZE ZORDER BY`
layout, here as a pure Catalyst expression usable in any sort,
range-partitioning, or bucketing clause.

Scale design: the key is a literal-folded expression tree
(bits × n_cols shift-mask-or terms, whole-stage-codegen'd, no UDF), so
computing it is map-only; `compact_table(zorder_by=...)` feeds it to
repartitionByRange + sortWithinPartitions — one range shuffle, after
which EVERY interleaved column's per-file min/max span shrinks by
~2^(bits/n) and multi-dimension predicates prune files instead of
scanning them. Quantization to the bit budget uses per-column min/max
from one aggregate pass over the input (two passes total — the same
trade Delta makes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ZORDER_BITS = 16


def quantize(col: Column | str, lo: Column, hi: Column, bits: int = ZORDER_BITS) -> Column:
    """Map a numeric column into [0, 2^bits) given its min/max: integer
    rank of the value within the range. Constant columns (hi == lo) map
    to 0. Floor arithmetic on doubles, then clamp — monotone, so z-order
    locality is preserved no matter the input distribution's scale."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    span = hi.cast("double") - lo.cast("double")
    scaled = F.floor(
        (c - lo.cast("double")) / span * F.lit(float(2**bits))
    ).cast("long")
    return F.when(span == 0, F.lit(0)).otherwise(
        F.least(F.greatest(scaled, F.lit(0)), F.lit(2**bits - 1))
    )


def zvalue(cols: list[Column], bits: int = ZORDER_BITS) -> Column:
    """Morton key: interleave the low `bits` bits of each (non-negative
    integral) column round-robin — bit b of column i lands at position
    b·n + i. Callers quantize first; inputs ≥ 2^bits would collide with
    neighbors, so they must already be in range."""
    n = len(cols)
    terms = []
    for b in range(bits):
        for i, c in enumerate(cols):
            terms.append(
                F.shiftleft(
                    F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
                    b * n + i,
                )
            )
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def zvalue_sql(cols_sql: list[str], bits: int = ZORDER_BITS) -> str:
    """The identical Morton expression as ANSI/DuckDB SQL (same shift/
    mask/add arithmetic) for value-level oracles."""
    n = len(cols_sql)
    terms = [
        f"((({c} >> {b}) & 1) << {b * n + i})"
        for b in range(bits)
        for i, c in enumerate(cols_sql)
    ]
    return "(" + " + ".join(terms) + ")"


def with_zorder_key(
    df: DataFrame,
    cols: tuple[str, ...],
    bits: int = ZORDER_BITS,
    key_name: str = "_zkey",
) -> DataFrame:
    """Attach the Morton key for `cols`, quantizing each column by its
    observed min/max (one extra aggregate pass, collected as literals so
    the key itself stays a map-only expression)."""
    stats = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    qcols = [
        quantize(
            c,
            F.lit(stats[f"_lo_{c}"]),
            F.lit(stats[f"_hi_{c}"]),
            bits,
        )
        for c in cols
    ]
    return df.withColumn(key_name, zvalue(qcols, bits))
