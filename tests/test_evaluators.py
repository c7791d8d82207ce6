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


def test_ema_matches_reference_recurrence(series_df):
    # seed = mean of first `window`, then y = a*(x-y)+y with a=2/(w+1)
    # (ref: io/eval/ExponentialMovingAverageEvaluator.java:115-140)
    df, pdf = series_df
    w = 5
    a = 2.0 / (w + 1.0)
    got = (
        ev.ema(df, "t", "x", window=w, by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    exp_rows = []
    for g, gdf in pdf.sort_values(["grp", "t"]).groupby("grp"):
        xs = gdf["x"].to_numpy()
        y = xs[:w].mean()
        exp_rows.append((g, int(gdf["t"].iloc[w - 1]), y))
        for i in range(w, len(xs)):
            y = a * (xs[i] - y) + y
            exp_rows.append((g, int(gdf["t"].iloc[i]), y))
    assert len(got) == len(exp_rows)
    for (_, row), (g, t, y) in zip(got.iterrows(), exp_rows):
        assert row["grp"] == g and row["t"] == t
        assert abs(row["ema"] - y) < 1e-9


def test_ema_short_group_empty(spark):
    df = spark.createDataFrame([("a", i, float(i)) for i in range(3)], "grp string, t long, x double")
    assert ev.ema(df, "t", "x", window=5, by="grp").count() == 0


def test_welch_ttest_formula(series_df):
    df, pdf = series_df
    row = ev.welch_ttest(df, "x", "grp", "a", "b").collect()[0]
    xa = pdf[pdf.grp == "a"]["x"].to_numpy()
    xb = pdf[pdf.grp == "b"]["x"].to_numpy()
    va, vb = xa.var(ddof=1), xb.var(ddof=1)
    na, nb = len(xa), len(xb)
    se = va / na + vb / nb
    t = (xa.mean() - xb.mean()) / np.sqrt(se)
    dof = se * se / ((va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1))
    assert abs(row["t_stat"] - t) < 1e-9
    assert abs(row["df"] - dof) < 1e-7


def test_minmax_scale_bounds(series_df):
    df, pdf = series_df
    got = ev.minmax_scale(df, "x", lo=0.0, hi=10.0, by="grp").toPandas()
    for g, gdf in got.groupby("grp"):
        assert abs(gdf["scaled"].min() - 0.0) < 1e-9
        assert abs(gdf["scaled"].max() - 10.0) < 1e-9
    exp = pdf.groupby("grp")["x"].transform(lambda s: (s - s.min()) / (s.max() - s.min()) * 10.0)
    merged = got.sort_values(["grp", "t"]).reset_index(drop=True)
    pdf2 = pdf.assign(exp=exp).sort_values(["grp", "t"]).reset_index(drop=True)
    assert np.allclose(merged["scaled"].to_numpy(), pdf2["exp"].to_numpy())


def test_moving_median_matches_pandas(series_df):
    df, pdf = series_df
    got = (
        ev.moving_median(df, "t", "x", n=5, by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    exp = (
        pdf.sort_values(["grp", "t"])
        .groupby("grp")["x"]
        .rolling(5)          # full windows only (NaN head)
        .median()
        .dropna()
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(got["moving_median"].to_numpy(), exp.to_numpy())


def test_moving_mad_matches_reference_formula(series_df):
    # MAD = mean |x - window mean| over full windows
    # (ref: io/eval/MovingMADEvaluator.java:70-82)
    df, pdf = series_df
    got = (
        ev.moving_mad(df, "t", "x", n=5, by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    exp = (
        pdf.sort_values(["grp", "t"])
        .groupby("grp")["x"]
        .rolling(5)
        .apply(lambda w: np.mean(np.abs(w - w.mean())), raw=True)
        .dropna()
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert np.allclose(got["moving_mad"].to_numpy(), exp.to_numpy())
