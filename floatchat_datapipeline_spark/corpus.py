"""The 79-query NL corpus, re-hosted (reference §5: test_advanced_
chromadb_queries.py runs 79 queries in 8 suites and only LOGS results —
no assertions). Our copy keeps the 8 categories and per-suite counts
(8/11/11/11/11/11/10/6 = 79) with independently written query texts, and
tests/test_query_corpus.py adds the structural assertions the reference
lacks: k results returned, scores monotone non-increasing, metadata
pre-filters honored.
"""

from __future__ import annotations

CORPUS: dict[str, tuple[str, ...]] = {
    "temperature": (
        "floats with warm tropical surface water",
        "coldest deep water temperature readings",
        "temperature above 25 degrees",
        "mild temperate water around 15 degrees",
        "extreme heat anomalies in surface measurements",
        "near freezing water masses",
        "steady temperature profiles with little variation",
        "warmest recorded float overall",
    ),
    "geographic": (
        "floats operating in the Indian Ocean",
        "measurements near the equator",
        "high latitude southern hemisphere floats",
        "floats in the tropical band",
        "eastern longitude deployments",
        "western hemisphere activity",
        "floats close to latitude 40 north",
        "southern ocean circumpolar floats",
        "floats between 60 and 80 east",
        "equatorial pacific measurements",
        "floats far from any coast",
    ),
    "salinity": (
        "high salinity water masses",
        "fresh water influence low salinity",
        "salinity near 35 psu",
        "extremely salty readings",
        "brackish anomalies",
        "uniform salinity with depth",
        "salinity fronts and gradients",
        "typical open ocean salinity",
        "salinity above 36 units",
        "low salt content polar water",
        "average salinity around 34",
    ),
    "temporal": (
        "floats deployed in 1995",
        "measurements from the late nineties",
        "most recent deployments",
        "long operating lifetime floats",
        "floats active during winter months",
        "summer season measurements",
        "data from the first quarter of the year",
        "multi year continuous records",
        "short lived deployments",
        "floats active in a specific month",
        "earliest deployments in the record",
    ),
    "depth": (
        "deep profiling floats below 2000 dbar",
        "shallow surface-only profiles",
        "full water column coverage",
        "mid depth measurements around 1000 dbar",
        "maximum pressure records",
        "thermocline depth structure",
        "profiles with many vertical levels",
        "bottom reaching measurements",
        "upper ocean stratification",
        "deepest float in the dataset",
        "pressure range spanning surface to abyss",
    ),
    "edge_cases": (
        "floats with missing temperature data",
        "single profile floats",
        "floats with unusual identifiers",
        "records with sparse measurements",
        "floats at exact boundary coordinates",
        "duplicate looking measurement sets",
        "floats with only salinity readings",
        "zero measurement floats",
        "floats with byte string identifiers",
        "maximum measurement count float",
        "floats with identical bounding boxes",
    ),
    "multi_parameter": (
        "warm and salty subtropical water",
        "cold fresh polar water",
        "deep cold high salinity masses",
        "warm shallow low salinity layers",
        "temperature and pressure jointly extreme",
        "moderate everything mid ocean floats",
        "high temperature with deep profiling",
        "low temperature with low pressure",
        "salinity and temperature both above average",
        "three parameter combined extremes",
    ),
    "negation": (
        "floats not in the tropics",
        "measurements excluding the Indian Ocean",
        "floats without deep profiles",
        "records not from 1995",
        "floats avoiding high salinity",
        "non polar deployments only",
    ),
}

assert sum(len(v) for v in CORPUS.values()) == 79
