"""Math/stat stream-evaluator tests vs in-process pandas/numpy oracles.

Reference: solrj-streaming io/eval (MovingAverageEvaluator, DiffEvaluator,
NormalizeEvaluator/zscores, DescribeEvaluator); behavior test
io/stream/MathExpressionTest.java. The SQL-expressible forms are also
oracle-gated via __spark_entry__ (eval_* entries); these tests pin the
window/group semantics at unit scale.
"""

import numpy as np
import pandas as pd
import pytest

from solr_spark import evaluators as ev


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(7)
    rows = []
    for g in ("a", "b"):
        vals = rng.normal(10.0 if g == "a" else 50.0, 3.0, size=40)
        rows += [(g, i, float(v)) for i, v in enumerate(vals)]
    pdf = pd.DataFrame(rows, columns=["grp", "t", "x"])
    return spark.createDataFrame(pdf).repartition(4), pdf


def test_moving_avg_matches_pandas_rolling(series_df):
    df, pdf = series_df
    got = (
        ev.moving_avg(df, "t", "x", n=5, by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    exp = (
        pdf.sort_values(["grp", "t"])
        .groupby("grp")["x"]
        .rolling(5, min_periods=1)
        .mean()
        .reset_index(drop=True)
    )
    assert np.allclose(got["moving_avg"].to_numpy(), exp.to_numpy())


def test_series_diff_first_point_null(series_df):
    df, pdf = series_df
    got = ev.series_diff(df, "t", "x", by="grp").orderBy("grp", "t").toPandas()
    exp = pdf.sort_values(["grp", "t"]).groupby("grp")["x"].diff()
    assert got["diff"].isna().sum() == 2  # one NULL head per group
    assert np.allclose(
        got["diff"].to_numpy(), exp.to_numpy(), equal_nan=True
    )


def test_zscores_grouped_standardization(series_df):
    df, pdf = series_df
    got = ev.zscores(df, "x", by="grp").orderBy("grp", "t").toPandas()
    z = (
        pdf.sort_values(["grp", "t"])
        .groupby("grp")["x"]
        .transform(lambda v: (v - v.mean()) / v.std(ddof=1))
    )
    assert np.allclose(got["zscore"].to_numpy(), z.to_numpy())
    # per-group standardized series: mean ~0, sample std ~1
    for _, sub in got.groupby("grp"):
        assert abs(sub["zscore"].mean()) < 1e-9
        assert abs(sub["zscore"].std(ddof=1) - 1.0) < 1e-9


def test_zscores_ungrouped(series_df):
    df, pdf = series_df
    got = ev.zscores(df, "x").orderBy("grp", "t").toPandas()
    z = (pdf.sort_values(["grp", "t"])["x"] - pdf["x"].mean()) / pdf["x"].std(ddof=1)
    assert np.allclose(got["zscore"].to_numpy(), z.to_numpy())
