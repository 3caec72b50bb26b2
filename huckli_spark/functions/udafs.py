"""Pandas GROUPED_AGG UDAFs (custom Arrow-batched aggregates).

Deliberately NO ``from __future__ import annotations`` here: pandas_udf
infers the aggregate contract from REAL type hints (Series -> scalar),
and postponed annotations stringify them into something its inspection
rejects. Keeping the UDAFs in this hint-friendly module avoids the
deprecated explicit PandasUDFType fallback.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def median_disc(v: pd.Series) -> float:
    """Exact lower-median: sorted[(n-1)//2] — coincides with DuckDB's
    quantile_disc(0.5), making it oracle-comparable (np.median would
    interpolate even-length groups)."""
    s = v.sort_values(ignore_index=True)
    return float(s.iloc[(len(s) - 1) // 2])


@pandas_udf("long")
def n_values(v: pd.Series) -> int:
    """Group size via the same Arrow batch (GROUPED_AGG UDFs cannot
    share an agg() with JVM aggregates)."""
    return len(v)
