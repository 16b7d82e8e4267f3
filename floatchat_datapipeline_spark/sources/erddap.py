"""ERDDAP tabledap query builder — true source-side pushdown (S1/F8).

The reference encodes variable projection and region/time predicates
directly into the ERDDAP download URL (load_data.py:105-156: variable
list, then `&lat>=…&lat<=…&time>=…` constraints) — predicate and
projection pushdown to the server. This module is the engine's version of
that seam: a declarative request (columns + simple predicates) renders to
the tabledap URL; the same predicates are returned as a Spark Column so
the plan re-applies them after decode (defense in depth — the scan is
correct even against a server that ignores constraints).

No network IO happens here (and none is attempted in this container) —
fetching is a driver-side staging concern (see staging.py); this module
is pure URL/predicate construction, unit-testable exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from urllib.parse import quote

from pyspark.sql import Column
from pyspark.sql import functions as F

_OPS = {">=", "<=", ">", "<", "="}


@dataclass(frozen=True)
class ErddapRequest:
    """A tabledap subset request: dataset, projected variables, and
    constraints as (variable, op, value) triples."""

    dataset: str
    variables: tuple[str, ...]
    constraints: tuple[tuple[str, str, object], ...] = field(default_factory=tuple)
    server: str = "https://www.ifremer.fr/erddap"
    file_type: str = "nc"

    def url(self) -> str:
        """Render the download URL with projection + predicates pushed
        into the query string (reference load_data.py:105-156 shape)."""
        for _, op, _ in self.constraints:
            if op not in _OPS:
                raise ValueError(f"unsupported constraint op {op!r}")
        proj = ",".join(self.variables)
        cons = "".join(
            f"&{var}{op}{_render(value)}" for var, op, value in self.constraints
        )
        query = quote(proj + cons, safe="&=<>!,:")
        return f"{self.server}/tabledap/{self.dataset}.{self.file_type}?{query}"

    def residual_filter(self) -> Column | None:
        """The same predicates as a Spark Column, to re-apply post-decode."""
        expr = None
        for var, op, value in self.constraints:
            c = F.col(var)
            cond = {
                ">=": c >= value,
                "<=": c <= value,
                ">": c > value,
                "<": c < value,
                "=": c == value,
            }[op]
            expr = cond if expr is None else (expr & cond)
        return expr


def _render(value: object) -> str:
    if isinstance(value, str):
        return value if value.endswith("Z") else f'"{value}"'
    return repr(float(value)) if isinstance(value, float) else str(value)


def indian_ocean_request(
    dataset: str = "ArgoFloats",
    start: str = "2020-01-01T00:00:00Z",
    end: str = "2020-02-01T00:00:00Z",
) -> ErddapRequest:
    """The reference's default subset (Indian Ocean bounds,
    load_data.py:42-47) as a declarative request."""
    return ErddapRequest(
        dataset=dataset,
        variables=(
            "platform_number",
            "time",
            "latitude",
            "longitude",
            "pres",
            "temp",
            "psal",
        ),
        constraints=(
            ("latitude", ">=", -60.0),
            ("latitude", "<=", 30.0),
            ("longitude", ">=", 20.0),
            ("longitude", "<=", 120.0),
            ("time", ">=", start),
            ("time", "<=", end),
        ),
    )
