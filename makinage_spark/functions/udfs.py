"""Arrow-vectorized scalar UDFs — the sanctioned per-record Python escape
hatch (the reference's arbitrary lambdas, SURVEY §2.3 UDF surface).

NOTE: no ``from __future__ import annotations`` here — ``pandas_udf`` resolves
the real type hints at decoration time, and stringified annotations defeat it.
"""

import numpy as np
import pandas as pd
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def sigmoid100(v: pd.Series) -> pd.Series:
    """sigmoid(v/100), rounded to 6dp — numpy over Arrow batches."""
    return (1.0 / (1.0 + np.exp(-v / 100.0))).round(6)
