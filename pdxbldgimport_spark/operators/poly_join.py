"""Polygon × polygon intersects join (J5): the footprint-dedup operator.

Re-expresses the reference's dedup-against-existing-OSM UPDATEs
(tasks/metro_bldgs.rake:51-69; update_database.sql:160-166) as a
cell-bucketed join:

1. both sides explode to cover cells (conservative bbox cover) — IDS
   ONLY: ring geometry never rides the per-cell shuffle (a polygon
   covering k cells would ship its rings k times; at metro scale the
   duplicated geometry, not the ids, dominates the exchange);
2. equi-join on cell, then candidate pairs de-duplicated while still
   just (a_id, b_id) rows;
3. geometry re-attached once per side to the deduped pairs, then the
   exact vectorized ``polys_intersect_pairs`` refine (edge crossings +
   mutual containment), per-batch factorized so each distinct polygon
   parses once per Arrow batch.

Returns distinct (a_id, b_id) intersecting pairs; callers turn that into
is_deleted marks (left-semi) and kept/suppressed splits (O4).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

from ..geo import cells as C
from ..geo.core import RingSet, polys_intersect_pairs
from .pip_join import polygon_cover_cells


def intersects_join(
    polys_a: DataFrame,
    polys_b: DataFrame,
    a_id: str,
    b_id: str,
    rings_col: str = "rings",
    res: int = C.RES_JOIN,
) -> DataFrame:
    """Distinct (a_id, b_id) pairs with ST_Intersects(a, b) true."""
    cov_a = polygon_cover_cells(polys_a, a_id, rings_col, res, include_rings=False)
    cov_b = polygon_cover_cells(polys_b, b_id, rings_col, res, include_rings=False)
    pairs = cov_a.join(cov_b, "cell").select(a_id, b_id).dropDuplicates([a_id, b_id])
    cand = pairs.join(
        polys_a.select(a_id, F.col(rings_col).alias("__rings_a")), a_id
    ).join(polys_b.select(b_id, F.col(rings_col).alias("__rings_b")), b_id)

    schema = T.StructType(
        [T.StructField(a_id, T.LongType()), T.StructField(b_id, T.LongType())]
    )

    def refine(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if pdf.empty:
                continue
            codes_a, _ = pd.factorize(pdf[a_id])
            codes_b, _ = pd.factorize(pdf[b_id])
            first_a = pd.Series(np.arange(len(pdf))).groupby(codes_a).min().to_numpy()
            first_b = pd.Series(np.arange(len(pdf))).groupby(codes_b).min().to_numpy()
            rs_a = RingSet.from_arrow_lists(pdf["__rings_a"].iloc[first_a])
            rs_b = RingSet.from_arrow_lists(pdf["__rings_b"].iloc[first_b])
            hit = polys_intersect_pairs(
                rs_a, rs_b, codes_a.astype(np.int64), codes_b.astype(np.int64)
            )
            yield pd.DataFrame(
                {a_id: pdf[a_id].to_numpy()[hit], b_id: pdf[b_id].to_numpy()[hit]}
            )

    return cand.mapInPandas(refine, schema)
