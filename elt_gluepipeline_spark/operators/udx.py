"""User-defined aggregate / table function surface (SURVEY.md §2.9).

The reference's UDFs are all scalar row-functions, re-expressed here
as native expressions (U1-U5). These are the OTHER two UDF shapes
Spark offers, demonstrated with the same discipline the scalar ones
got — Arrow-vectorized, deterministic, oracle-checkable:

- ``median_udaf()``: a pandas grouped-AGGREGATE udf. The whole group
  arrives as one pandas Series; np.median sorts internally, so the
  result is independent of shuffle arrival order (a float SUM in the
  same position would not be — accumulation order varies run to run).
- ``kv_pairs_udtf()``: a UDTF (one input row → many output rows) that
  parses "k=v;k2=v2" option strings — the lateral-view shape for
  semi-structured columns that are NOT JSON (q23 covers JSON via
  get_json_object).

Both are factories (UDF registration parses the return type, which
needs an active SparkSession — a module-level decorator would demand
one at import time).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf, udtf


def median_udaf():
    """Exact median as a grouped-agg pandas UDF (np.median sorts —
    order-independent, matching DuckDB's quantile_cont(0.5))."""

    @pandas_udf("double")
    def median(v: pd.Series) -> float:
        return float(np.median(v.dropna().to_numpy(dtype="float64")))

    return median


def kv_pairs_udtf():
    """Explode a 'k=v;k2=v2' option string into (key, value) rows;
    malformed fragments (no '=') are skipped, empty input yields no
    rows."""

    @udtf(returnType="key: string, value: string")
    class KvPairs:
        def eval(self, s: str):  # noqa: D102 - contract documented above
            if not s:
                return
            for frag in s.split(";"):
                if "=" in frag:
                    k, _, val = frag.partition("=")
                    if k:
                        yield (k, val)

    return KvPairs
