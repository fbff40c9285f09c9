"""asof_join semantics vs pandas.merge_asof (an independent reference
implementation of the same surface): backward / forward / nearest,
with and without a tolerance bound, plus the deterministic right-side
tie rule ADVICE r03 asked to pin."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

from sitecrawler_spark.operators.joins import asof_join


def _data(seed: int = 7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 10_000, 200),
            "lid": np.arange(200),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "rts": rng.integers(0, 10_000, 200),
            "rid": np.arange(200) + 1000,
        }
    )
    # tie-free on the right (the tie rule is pinned separately below);
    # merge_asof's duplicate-ts pick is frame-order-dependent, ours is
    # greatest-payload — they only agree when no ties exist
    right = right.drop_duplicates(["k", "rts"])
    return left, right


def _pandas_asof(left, right, direction, tolerance=None):
    out = pd.merge_asof(
        left.sort_values(["ts", "lid"]).reset_index(drop=True),
        right.sort_values(["rts", "rid"]).reset_index(drop=True),
        left_on="ts",
        right_on="rts",
        by="k",
        direction=direction,
        tolerance=tolerance,
        allow_exact_matches=True,
    )
    return {
        (r.k, r.lid): (None if pd.isna(r.rid) else int(r.rid))
        for r in out.itertuples()
    }


def _spark_asof(spark, left, right, direction, tolerance=None):
    l = spark.createDataFrame(left)
    r = spark.createDataFrame(right)
    out = asof_join(
        l, r, on="k", left_ts="ts", right_ts="rts",
        payload_cols=["rid"], direction=direction,
        tolerance_seconds=tolerance,
    ).toPandas()
    return {
        (r.k, r.lid): (None if pd.isna(r.r_rid) else int(r.r_rid))
        for r in out.itertuples()
    }


def test_asof_directions_match_pandas(spark):
    left, right = _data()
    for direction in ("backward", "forward", "nearest"):
        got = _spark_asof(spark, left, right, direction)
        want = _pandas_asof(left, right, direction)
        assert got == want, direction


def test_asof_tolerance_matches_pandas(spark):
    left, right = _data(seed=11)
    for direction in ("backward", "forward", "nearest"):
        got = _spark_asof(spark, left, right, direction, tolerance=250)
        want = _pandas_asof(left, right, direction, tolerance=250)
        assert got == want, direction
        # the tolerance must actually null out some far matches AND
        # keep some near ones, or this test proves nothing
        assert any(v is None for v in got.values())
        assert any(v is not None for v in got.values())


def test_asof_right_tie_prefers_greatest_payload(spark):
    """Several right rows sharing (key, right_ts): the greatest payload
    tuple wins, identically across runs and directions (ADVICE r03 —
    F.last over an orderBy without the payload picked an arbitrary
    one)."""
    left = pd.DataFrame({"k": [1, 1], "ts": [100, 50], "lid": [0, 1]})
    right = pd.DataFrame(
        {"k": [1, 1, 1, 1], "rts": [80, 80, 120, 120], "rid": [5, 9, 3, 7]}
    )
    for direction, want in (("backward", 9), ("forward", 7), ("nearest", 9)):
        for attempt in range(2):
            got = _spark_asof(spark, left, right, direction)
            assert got[(1, 0)] == want, (direction, got)
    # left row at ts=50: no backward match, forward hits the 80-tie
    got = _spark_asof(spark, left, right, "backward")
    assert got[(1, 1)] is None
    got = _spark_asof(spark, left, right, "forward")
    assert got[(1, 1)] == 9


def test_asof_nearest_distance_tie_prefers_backward(spark):
    left = pd.DataFrame({"k": [1], "ts": [100], "lid": [0]})
    right = pd.DataFrame({"k": [1, 1], "rts": [90, 110], "rid": [5, 6]})
    got = _spark_asof(spark, left, right, "nearest")
    assert got[(1, 0)] == 5  # equidistant → prior row, merge_asof's rule


def test_asof_fuzz_more_seeds(spark):
    """Randomized parity sweep vs merge_asof: more seeds × directions ×
    tolerance — the surface is tie-free by construction (tie rule pinned
    separately), so outputs must be EXACTLY equal."""
    for seed in (23, 41):
        left, right = _data(seed=seed)
        for direction in ("backward", "forward", "nearest"):
            for tol in (None, 400):
                got = _spark_asof(spark, left, right, direction, tol)
                want = _pandas_asof(left, right, direction, tol)
                assert got == want, (seed, direction, tol)
