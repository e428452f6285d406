"""User map-reduce hook over browse/search hit sets.

≙ reference mapred/BoboMapFunctionWrapper.java:10-38 +
MapReduceResult.java:12 (a user callback invoked per matched doc /
per segment, results merged on the driver). Spark-native rendition:
the hit set is a DataFrame; the per-segment callback is an
Arrow-batched ``applyInPandas``/``mapInPandas``; the merge is a
reduce on the driver.
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame


def map_reduce(
    hits: DataFrame,
    map_fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: str,
    reduce_fn: Callable[[list], object] | None = None,
):
    """Run ``map_fn`` over Arrow batches of the hit set.

    map_fn: pandas batch -> pandas partial result (any shape matching
    ``out_schema``). Returns the mapped DataFrame, or — when
    ``reduce_fn`` is given — the driver-side reduction of the
    collected partials (≙ MapReduceResult)."""

    def run(batches):
        for pdf in batches:
            if len(pdf):
                yield map_fn(pdf)

    mapped = hits.mapInPandas(run, schema=out_schema)
    if reduce_fn is None:
        return mapped
    return reduce_fn(mapped.collect())
