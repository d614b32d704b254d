"""Arrow-native user-defined aggregates (the engine's extension
surface for numerical aggregates Spark lacks).

NO ``from __future__ import annotations`` in this module, ON PURPOSE:
these UDAFs use pyspark's type-hint registration (the current API —
``PandasUDFType`` is deprecated), and that inference resolves the
decorated function's annotations at decoration time. Stringified
annotations referencing module-local names (what the future-import
produces) would break the resolution, which is why the definitions
live here instead of next to their call sites.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def gini_udaf(v: pd.Series) -> float:
    """Gini concentration of a value multiset, as a grouped aggregate:
    Gini = Σ(2i − n − 1)·x(i) / (n·Σx) over ascending-sorted values —
    an order statistic, deterministic for a given multiset (float
    summation-order noise is absorbed by the caller's rounding)."""
    x = np.sort(v.to_numpy(dtype=np.float64))
    n = len(x)
    tot = float(x.sum())
    if n == 0 or tot == 0.0:
        return 0.0
    return float(((2.0 * np.arange(1, n + 1) - n - 1) * x).sum() / (n * tot))
