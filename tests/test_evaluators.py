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


def test_rank_transform_average_ties(spark):
    rows = [("a", 5.0), ("a", 5.0), ("a", 1.0), ("a", 9.0), ("b", 2.0), ("b", 2.0)]
    df = spark.createDataFrame(rows, ["grp", "x"])
    got = ev.rank_transform(df, "x", by="grp").orderBy("grp", "x").toPandas()
    exp = (
        pd.DataFrame(rows, columns=["grp", "x"])
        .groupby("grp")["x"]
        .rank(method="average")
    )
    # pandas.rank(average) is the commons-math NaturalRanking tie policy
    assert np.allclose(sorted(got["rank"]), sorted(exp))


def test_spearman_matches_pandas(series_df):
    df, pdf = series_df
    pdf = pdf.assign(y=pdf["x"] ** 2 + np.sin(pdf["t"]))
    df2 = df.sparkSession.createDataFrame(pdf)
    got = (
        ev.spearman_corr(df2, "x", "y", by="grp").orderBy("grp").toPandas()
    )
    for _, row in got.iterrows():
        sub = pdf[pdf["grp"] == row["grp"]]
        # spearman = Pearson over average ranks (no scipy in sandbox)
        exp = sub["x"].rank(method="average").corr(sub["y"].rank(method="average"))
        assert abs(row["spearman"] - exp) < 1e-9


def test_mann_whitney_u_identities(series_df):
    df, pdf = series_df
    got = ev.mann_whitney(df, "x", "grp", "a", "b").collect()[0]
    n1 = (pdf["grp"] == "a").sum()
    n2 = (pdf["grp"] == "b").sum()
    # U1 + U2 == n1*n2; with disjoint ranges (a~10, b~50) U1 must be 0
    assert got["u1"] + got["u2"] == pytest.approx(n1 * n2)
    r = pdf["x"].rank(method="average")
    r1 = r[pdf["grp"] == "a"].sum()
    assert got["u1"] == pytest.approx(r1 - n1 * (n1 + 1) / 2)
    assert got["z"] < -5  # far in the left tail for disjoint samples


def test_chi_square_contingency(spark):
    rows = [("x", "p")] * 30 + [("x", "q")] * 10 + [("y", "p")] * 15 + [("y", "q")] * 25
    df = spark.createDataFrame(rows, ["a", "b"])
    got = ev.chi_square(df, "a", "b").collect()[0]
    obs = np.array([[30.0, 10.0], [15.0, 25.0]])
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    assert got["chi2"] == pytest.approx(((obs - e) ** 2 / e).sum())
    assert got["dof"] == 1.0 and got["n"] == 80.0


def test_chi_square_counts_unobserved_cells(spark):
    # cell (y, q) has zero observations -> contributes its expected count
    rows = [("x", "p")] * 8 + [("x", "q")] * 4 + [("y", "p")] * 6
    df = spark.createDataFrame(rows, ["a", "b"])
    got = ev.chi_square(df, "a", "b").collect()[0]
    obs = np.array([[8.0, 4.0], [6.0, 0.0]])
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    assert got["chi2"] == pytest.approx(((obs - e) ** 2 / e).sum())


def test_anova_one_way_f(series_df):
    df, pdf = series_df
    got = ev.anova1(df, "x", "grp").collect()[0]
    groups = [sub["x"].to_numpy() for _, sub in pdf.groupby("grp")]
    n, k = len(pdf), len(groups)
    grand = pdf["x"].mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert got["f_stat"] == pytest.approx(f)
    assert (got["df1"], got["df2"]) == (k - 1, n - k)


def test_moments_formulas(series_df):
    df, pdf = series_df
    got = ev.moments(df, "x", by="grp").orderBy("grp").toPandas()
    for _, row in got.iterrows():
        x = pdf[pdf["grp"] == row["grp"]]["x"].to_numpy()
        m = x.mean()
        m2, m3, m4 = [((x - m) ** p).mean() for p in (2, 3, 4)]
        assert row["skewness"] == pytest.approx(m3 / m2**1.5, rel=1e-6)
        assert row["kurtosis"] == pytest.approx(m4 / m2**2 - 3.0, rel=1e-6)
        assert row["geo_mean"] == pytest.approx(np.exp(np.log(x).mean()))
        assert row["harm_mean"] == pytest.approx(len(x) / (1.0 / x).sum())


def test_outliers_normal_matches_z_threshold(series_df):
    from statistics import NormalDist

    df, pdf = series_df
    got = ev.outliers_normal(df, "x", 0.10, 0.90, by="grp").toPandas()
    zlo, zhi = NormalDist().inv_cdf(0.10), NormalDist().inv_cdf(0.90)
    z = pdf.groupby("grp")["x"].transform(lambda v: (v - v.mean()) / v.std(ddof=1))
    exp = pdf[(z < zlo) | (z > zhi)]
    assert len(got) == len(exp) > 0
    assert sorted(got["t"]) == sorted(exp["t"])


def test_integrate_trapezoid_matches_numpy(series_df):
    df, pdf = series_df
    got = (
        ev.integrate_trapezoid(df, "t", "x", by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    for g, sub in pdf.groupby("grp"):
        sub = sub.sort_values("t")
        x, y = sub["t"].to_numpy(float), sub["x"].to_numpy(float)
        exp = np.concatenate([[0.0], np.cumsum(np.diff(x) * (y[1:] + y[:-1]) / 2)])
        assert np.allclose(got[got["grp"] == g]["integral"].to_numpy(), exp)


def test_convolve_matches_numpy_full(series_df):
    df, pdf = series_df
    kernel = [0.25, 0.5, 0.25]
    got = ev.convolve(df, "t", "x", kernel, by="grp").orderBy("grp", "t").toPandas()
    for g, sub in pdf.groupby("grp"):
        y = sub.sort_values("t")["x"].to_numpy(float)
        exp = np.convolve(y, kernel, mode="full")
        sub_got = got[got["grp"] == g]
        assert list(sub_got["t"]) == list(range(len(y) + len(kernel) - 1))
        assert np.allclose(sub_got["conv"].to_numpy(), exp)


def test_derivative_central_and_one_sided(series_df):
    df, pdf = series_df
    got = ev.derivative_fd(df, "t", "x", by="grp").orderBy("grp", "t").toPandas()
    for g, sub in pdf.groupby("grp"):
        sub = sub.sort_values("t")
        x, y = sub["t"].to_numpy(float), sub["x"].to_numpy(float)
        exp = np.empty_like(y)
        exp[1:-1] = (y[2:] - y[:-2]) / (x[2:] - x[:-2])   # central
        exp[0] = (y[1] - y[0]) / (x[1] - x[0])            # forward
        exp[-1] = (y[-1] - y[-2]) / (x[-1] - x[-2])       # backward
        assert np.allclose(got[got["grp"] == g]["derivative"].to_numpy(), exp)


def test_find_delay_matches_reference_convolution(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0.0, 1.0, 40)
    b = np.roll(a, 5)  # b lags a by 5
    rows = [(int(i), float(a[i]), float(b[i])) for i in range(40)]
    df = spark.createDataFrame(rows, "t long, a double, b double")
    got = ev.find_delay(df, "t", "a", "b").collect()[0]["delay"]
    conv = np.convolve(a, b[::-1])  # io/eval/FindDelayEvaluator.java:83
    exp = int(np.argmax(np.abs(conv))) + 1 - len(b)
    assert got == exp == -5


def test_find_delay_grouped(spark):
    rng = np.random.default_rng(13)
    rows = []
    for g, shift in (("p", 2), ("q", -3)):
        a = rng.normal(0.0, 1.0, 30)
        b = np.roll(a, shift)
        rows += [(g, int(i), float(a[i]), float(b[i])) for i in range(30)]
    df = spark.createDataFrame(rows, "grp string, t long, a double, b double")
    got = {r["grp"]: r["delay"] for r in ev.find_delay(df, "t", "a", "b", by="grp").collect()}
    assert got == {"p": -2, "q": 3}


def test_kendall_tau_b_with_ties(spark):
    # hand-checkable vectors including ties in x and in y
    x = [1.0, 1.0, 2.0, 3.0, 4.0, 4.0]
    y = [1.0, 2.0, 2.0, 3.0, 5.0, 4.0]
    df = spark.createDataFrame(list(zip(x, y)), "x double, y double")
    got = ev.kendall_tau(df, "x", "y").collect()[0]["kendall_tau"]
    C = D = tx = ty = 0
    n = len(x)
    for i in range(n):
        for j in range(i + 1, n):
            s = (x[i] - x[j]) * (y[i] - y[j])
            C += s > 0
            D += s < 0
            tx += x[i] == x[j]
            ty += y[i] == y[j]
    n0 = n * (n - 1) // 2
    exp = (C - D) / np.sqrt((n0 - tx) * (n0 - ty))
    assert got == pytest.approx(exp)


def test_kendall_tau_perfect_orderings(spark):
    xs = [float(i) for i in range(10)]
    df = spark.createDataFrame([(v, v * 2 + 1) for v in xs], "x double, y double")
    assert ev.kendall_tau(df, "x", "y").collect()[0]["kendall_tau"] == pytest.approx(1.0)
    df2 = spark.createDataFrame([(v, -v) for v in xs], "x double, y double")
    assert ev.kendall_tau(df2, "x", "y").collect()[0]["kendall_tau"] == pytest.approx(-1.0)


def test_corr_matrix_pairs_and_symmetry(series_df):
    df, pdf = series_df
    pdf = pdf.assign(y=pdf["x"] * 0.5 + np.cos(pdf["t"]), z=-pdf["x"])
    df2 = df.sparkSession.createDataFrame(pdf)
    got = ev.corr_matrix(df2, ["x", "y", "z"]).toPandas()
    assert len(got) == 6  # upper triangle incl. diagonal of 3x3
    by_pair = {(r["col_x"], r["col_y"]): r for _, r in got.iterrows()}
    assert by_pair[("x", "x")]["corr"] == pytest.approx(1.0)
    assert by_pair[("x", "z")]["corr"] == pytest.approx(-1.0)
    assert by_pair[("x", "y")]["corr"] == pytest.approx(pdf["x"].corr(pdf["y"]))
    assert by_pair[("x", "y")]["cov"] == pytest.approx(pdf["x"].cov(pdf["y"]))
    assert by_pair[("x", "x")]["cov"] == pytest.approx(pdf["x"].var(ddof=1))
