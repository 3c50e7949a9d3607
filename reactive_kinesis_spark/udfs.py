"""User-defined function surface (SURVEY.md §2.2 UDF/UDAF/UDTF row).

The engine's UDF policy, in order of preference:

1. **Don't.** Built-in ``pyspark.sql.functions`` stay inside whole-stage
   codegen; nearly everything in this repo is expressed that way.
2. **Arrow-vectorized** (``pandas_udf`` scalar / grouped-agg,
   ``mapInPandas``) when Python is unavoidable — batch transfer, 10-100×
   over row-at-a-time.
3. **Row-at-a-time ``udf``** only for tiny dimension-side data, never in a
   fact-table hot path.

This module provides the reference implementations of each tier (used by
tests and as documented templates), plus a Spark-native UDTF.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf, udf
from pyspark.sql.types import DoubleType, StringType


# --------------------------------------------------------------------------
# Tier 3: row-at-a-time UDF (dimension-side only)
# --------------------------------------------------------------------------


@udf(returnType=StringType())
def region_bucket(name):
    """Classic python UDF — fine on a 5-row region dim, wrong on lineitem."""
    if name is None:
        return None
    return "EASTERN" if name in ("ASIA", "MIDDLE EAST") else "WESTERN"


# --------------------------------------------------------------------------
# Tier 2: Arrow-vectorized scalar + grouped-aggregate pandas UDFs
# --------------------------------------------------------------------------


@pandas_udf(DoubleType())
def vec_l2_norm(embedding: pd.Series) -> pd.Series:
    """Vectorized L2 norm of an array<float> column (one Arrow batch per
    call; numpy over the batch)."""
    import numpy as np

    def norm(v):
        if v is None:
            return None
        a = np.asarray(v, dtype="float64")  # accumulate in f64 even for
        return float(np.sqrt(a @ a))  # float32 embedding columns

    return pd.Series([norm(v) for v in embedding])


@pandas_udf(DoubleType())
def gini_impurity(counts: pd.Series) -> float:
    """Grouped-aggregate pandas UDF: Gini impurity of a count distribution —
    an aggregation Catalyst has no built-in for. Used as
    ``df.groupBy(k).agg(gini_impurity(col))``."""
    import numpy as np

    arr = counts.to_numpy(dtype="float64")
    total = arr.sum()
    if total <= 0:
        return 0.0
    p = arr / total
    return float(1.0 - (p * p).sum())


# --------------------------------------------------------------------------
# UDTF: one row in, N typed rows out (Spark-native, arrow-optimized)
# --------------------------------------------------------------------------


class TokenizeUDTF:
    """Spark-native UDTF: (doc_id, text) → one row per token with its
    position — the UDTF-shaped twin of ``explode(split(...))``. Registered
    via ``spark.udtf.register("tokenize", tokenize_udtf)``; usable in SQL as
    ``SELECT * FROM tokenize(SELECT doc_id, text FROM docs)``."""

    def eval(self, doc_id: int, text: str):
        if text is None:
            return
        for pos, tok in enumerate(text.split()):
            yield doc_id, pos, tok


def make_tokenize_udtf():
    """Build the UDTF lazily (the ``udtf`` decorator needs a SparkSession-
    independent declaration but importing at module load keeps pyspark
    imports cheap)."""
    from pyspark.sql.functions import udtf

    return udtf(TokenizeUDTF, returnType="doc_id: long, pos: int, token: string")
