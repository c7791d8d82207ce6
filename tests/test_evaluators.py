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
from pyspark.sql import functions as F

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


def test_dft_matches_numpy_fft(series_df):
    df, pdf = series_df
    got = ev.dft_magnitude(df, "t", "x", by="grp").orderBy("grp", "k").toPandas()
    for g in ("a", "b"):
        y = pdf[pdf["grp"] == g].sort_values("t")["x"].to_numpy()
        exp = np.fft.fft(y)
        sub = got[got["grp"] == g]
        assert np.allclose(sub["re"].to_numpy(), exp.real)
        assert np.allclose(sub["im"].to_numpy(), exp.imag)
        assert np.allclose(sub["magnitude"].to_numpy(), np.abs(exp))


def test_frequency_table_cumulative(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [1, 1, 2, 3, 3, 3]], "grp string, x int"
    )
    got = {
        r["x"]: r
        for r in ev.frequency_table(df, "x", by="grp").orderBy("x").collect()
    }
    assert got[1]["count"] == 2 and got[1]["cum_freq"] == 2
    assert got[3]["count"] == 3 and got[3]["cum_freq"] == 6
    assert got[3]["cum_pct"] == pytest.approx(1.0)
    assert got[2]["pct"] == pytest.approx(1 / 6)


def test_mode_smallest_value_tiebreak(spark):
    df = spark.createDataFrame(
        [("a", v) for v in [5, 5, 3, 3, 9]] + [("b", 7)], "grp string, x int"
    )
    got = {r["grp"]: r for r in ev.mode_value(df, "x", by="grp").collect()}
    assert got["a"]["mode"] == 3 and got["a"]["mode_count"] == 2  # tie 3 vs 5
    assert got["b"]["mode"] == 7 and got["b"]["mode_count"] == 1


def test_distance_family_matches_numpy(series_df):
    df, pdf = series_df
    a_ = pdf[pdf["grp"] == "a"].sort_values("t")["x"].to_numpy()[:20]
    b_ = pdf[pdf["grp"] == "b"].sort_values("t")["x"].to_numpy()[:20]
    df2 = df.sparkSession.createDataFrame(
        pd.DataFrame({"a": a_, "b": b_})
    )
    r = ev.distance_family(df2, "a", "b").collect()[0]
    d = a_ - b_
    assert r["euclidean"] == pytest.approx(np.sqrt((d * d).sum()))
    assert r["manhattan"] == pytest.approx(np.abs(d).sum())
    assert r["chebyshev"] == pytest.approx(np.abs(d).max())
    assert r["canberra"] == pytest.approx(
        (np.abs(d) / (np.abs(a_) + np.abs(b_))).sum()
    )
    assert r["cosine_similarity"] == pytest.approx(
        (a_ * b_).sum() / (np.linalg.norm(a_) * np.linalg.norm(b_))
    )
    assert r["dot_product"] == pytest.approx((a_ * b_).sum())


def test_normalize_family_identities(series_df):
    df, pdf = series_df
    got = ev.normalize_family(df, "x", by="grp").orderBy("grp", "t").toPandas()
    for g in ("a", "b"):
        x = pdf[pdf["grp"] == g].sort_values("t")["x"].to_numpy()
        sub = got[got["grp"] == g]
        assert np.allclose(sub["l1_norm"], np.abs(x).sum())
        assert np.allclose(sub["l2_norm"], np.linalg.norm(x))
        assert np.allclose(sub["linf_norm"], np.abs(x).max())
        assert np.allclose(sub["normalize_sum"], x / x.sum())
        assert np.allclose(sub["unitize"], x / np.linalg.norm(x))
        assert np.allclose(sub["standardize"], (x - x.mean()) / x.std(ddof=1))
        assert np.linalg.norm(sub["unitize"]) == pytest.approx(1.0)


def test_polyfit2_matches_numpy(series_df):
    df, pdf = series_df
    pdf2 = pdf.assign(y=2.0 + 3.0 * pdf["t"] - 0.5 * pdf["t"] ** 2 + pdf["x"] * 0.01)
    df2 = df.sparkSession.createDataFrame(pdf2)
    got = {
        r["grp"]: r for r in ev.polyfit2(df2, "t", "y", by="grp").collect()
    }
    for g in ("a", "b"):
        sub = pdf2[pdf2["grp"] == g]
        c2, c1, c0 = np.polyfit(sub["t"], sub["y"], 2)
        assert got[g]["c0"] == pytest.approx(c0)
        assert got[g]["c1"] == pytest.approx(c1)
        assert got[g]["c2"] == pytest.approx(c2)
        assert got[g]["d0"] == pytest.approx(c1)
        assert got[g]["d1"] == pytest.approx(2 * c2)


def test_ks_two_sample_ecdf(spark):
    # hand-checkable: F1 steps at 1,2,3,4 / F2 steps at 3,4,5,6
    rows = [("g1", float(v)) for v in (1, 2, 3, 4)] + [
        ("g2", float(v)) for v in (3, 4, 5, 6)
    ]
    df = spark.createDataFrame(rows, "grp string, x double")
    r = ev.ks_two_sample(df, "x", "grp", "g1", "g2").collect()[0]
    assert (r["n1"], r["n2"]) == (4, 4)
    assert r["ks_d"] == pytest.approx(0.5)  # at v=2: F1=0.5, F2=0.0


def test_paired_ttest_formula(series_df):
    df, pdf = series_df
    a_ = pdf[pdf["grp"] == "a"].sort_values("t")["x"].to_numpy()
    b_ = a_ * 0.9 + 1.0
    df2 = df.sparkSession.createDataFrame(pd.DataFrame({"a": a_, "b": b_}))
    r = ev.paired_ttest(df2, "a", "b").collect()[0]
    d = a_ - b_
    assert r["n"] == len(d)
    assert r["mean_difference"] == pytest.approx(d.mean())
    assert r["sum_difference"] == pytest.approx(d.sum())
    assert r["t_stat"] == pytest.approx(
        d.mean() / (d.std(ddof=1) / np.sqrt(len(d)))
    )


def test_matrix_multiply_coo(spark):
    A = np.array([[1.0, 2.0], [0.0, 3.0], [4.0, 0.0]])
    B = np.array([[5.0, 0.0, 1.0], [2.0, 7.0, 0.0]])
    rows_a = [
        (i, k, float(A[i, k]))
        for i in range(3) for k in range(2) if A[i, k] != 0
    ]
    rows_b = [
        (k, j, float(B[k, j]))
        for k in range(2) for j in range(3) if B[k, j] != 0
    ]
    dfa = spark.createDataFrame(rows_a, "i int, k int, v double")
    dfb = spark.createDataFrame(rows_b, "k int, j int, v double")
    got = ev.matrix_multiply(dfa, dfb).collect()
    C = A @ B
    exp = {(i, j): C[i, j] for i in range(3) for j in range(3) if C[i, j] != 0}
    assert {(r["i"], r["j"]): r["v"] for r in got} == pytest.approx(exp)


def test_markov_transitions_row_stochastic(spark):
    chains = {1: "abab", 2: "aabb", 3: "ba"}
    rows = [
        (u, t, c) for u, s in chains.items() for t, c in enumerate(s)
    ]
    df = spark.createDataFrame(rows, "user int, t int, state string")
    got = ev.markov_transitions(df, "t", "state", seq_col="user").collect()
    counts = {(r["state"], r["next_state"]): r["transitions"] for r in got}
    # pairs: ab,ba,ab | aa,ab,bb | ba  ->  aa:1 ab:3 ba:2 bb:1
    assert counts == {("a", "b"): 3, ("b", "a"): 2, ("a", "a"): 1, ("b", "b"): 1}
    probs = {}
    for r in got:
        probs.setdefault(r["state"], 0.0)
        probs[r["state"]] += r["prob"]
    assert probs == pytest.approx({"a": 1.0, "b": 1.0})
    # row probs match counts / row totals
    by_pair = {(r["state"], r["next_state"]): r["prob"] for r in got}
    assert by_pair[("a", "b")] == pytest.approx(3 / 4)
    assert by_pair[("b", "a")] == pytest.approx(2 / 3)


def test_earth_movers_matches_recurrence(spark):
    a = [3.0, 0.0, 1.0, 2.0]
    b = [1.0, 2.0, 2.0, 1.0]
    df = spark.createDataFrame(
        [(i, a[i], b[i]) for i in range(4)], "t int, a double, b double"
    )
    got = ev.earth_movers(df, "t", "a", "b").collect()[0]["emd"]
    emd, total = 0.0, 0.0
    for x, y in zip(a, b):
        emd = x + emd - y
        total += abs(emd)
    assert got == pytest.approx(total)


def test_ols_regress2_matches_lstsq(spark):
    rng = np.random.default_rng(11)
    x1 = rng.normal(0, 1, 200)
    x2 = rng.normal(5, 2, 200)
    y = 2.0 + 0.5 * x1 - 1.5 * x2 + rng.normal(0, 0.3, 200)
    df = spark.createDataFrame(
        [(float(a), float(b), float(c)) for a, b, c in zip(x1, x2, y)],
        "x1 double, x2 double, y double",
    )
    got = ev.ols_regress2(df, "y", "x1", "x2").collect()[0]
    X = np.column_stack([np.ones_like(x1), x1, x2])
    beta, res, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert [got["b0"], got["b1"], got["b2"]] == pytest.approx(list(beta))
    sst = np.sum((y - y.mean()) ** 2)
    assert got["r_squared"] == pytest.approx(1.0 - res[0] / sst)


def test_predict_poly2_applies_coefficients(spark):
    pts = spark.createDataFrame([(float(x),) for x in range(5)], "x double")
    coef = spark.createDataFrame([(1.0, 2.0, 3.0)], "c0 double, c1 double, c2 double")
    got = {
        r["x"]: r["predicted"]
        for r in ev.predict_poly2(coef, pts, "x").collect()
    }
    assert got == pytest.approx({x: 1 + 2 * x + 3 * x * x for x in range(5)})


def test_matrix_ebe_sums(spark):
    A = np.array([[1.0, 2.0], [3.0, 0.0]])
    B = np.array([[5.0, 0.0], [7.0, 2.0]])  # stored transposed below
    dfa = spark.createDataFrame(
        [(i, j, float(A[i, j])) for i in range(2) for j in range(2) if A[i, j]],
        "i int, j int, v double",
    )
    dfb = spark.createDataFrame(  # B given as Bᵀ cells; op transposes it back
        [(j, i, float(B[i, j])) for i in range(2) for j in range(2) if B[i, j]],
        "i int, j int, v double",
    )
    got = {(r["i"], r["j"]): r for r in ev.matrix_ebe_sums(dfa, dfb).collect()}
    S = A + B
    for i in range(2):
        for j in range(2):
            r = got[(i, j)]
            assert r["add"] == pytest.approx(S[i, j])
            assert r["sub"] == pytest.approx(A[i, j] - B[i, j])
            assert r["mul"] == pytest.approx(A[i, j] * B[i, j])
            assert r["row_sum"] == pytest.approx(S[i].sum())
            assert r["col_sum"] == pytest.approx(S[:, j].sum())
            assert r["grand_sum"] == pytest.approx(S.sum())


def test_temporal_family_fields(spark):
    import datetime

    ts = datetime.datetime(2024, 5, 17, 13, 45, 7, 500000)
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    r = ev.temporal_family(df, "ts").collect()[0]
    assert (r["year"], r["quarter"], r["month"], r["day"]) == (2024, 2, 5, 17)
    assert r["day_of_year"] == 31 + 29 + 31 + 30 + 17
    assert r["day_of_quarter"] == 30 + 17  # Apr + 17 May
    assert (r["hour"], r["minute"], r["second"]) == (13, 45, 7)
    assert r["epoch"] == int(ts.replace(tzinfo=datetime.timezone.utc).timestamp())


def test_gtest_independent_table_near_zero(spark):
    # perfectly proportional table -> G == 0
    rows = []
    for a, b, n in [("x", "u", 10), ("x", "v", 20), ("y", "u", 5), ("y", "v", 10)]:
        rows += [(a, b)] * n
    df = spark.createDataFrame(rows, "a string, b string")
    r = ev.gtest(df, "a", "b").collect()[0]
    assert r["g_stat"] == pytest.approx(0.0, abs=1e-9)
    assert r["dof"] == 1.0 and r["n"] == 45


def test_gtest_matches_manual(spark):
    rows = [("x", "u")] * 30 + [("x", "v")] * 10 + [("y", "u")] * 15 + [("y", "v")] * 25
    df = spark.createDataFrame(rows, "a string, b string")
    r = ev.gtest(df, "a", "b").collect()[0]
    obs = np.array([[30.0, 10.0], [15.0, 25.0]])
    e = obs.sum(1)[:, None] * obs.sum(0)[None, :] / obs.sum()
    g = 2.0 * np.sum(obs * np.log(obs / e))
    assert r["g_stat"] == pytest.approx(g)


def test_knn_regress_mean_of_k_nearest(spark):
    rows = [(float(x), float(10 * x)) for x in range(10)]
    df = spark.createDataFrame(rows, "x double, y double")
    got = {
        r["query_x"]: r["predicted"]
        for r in ev.knn_regress(df, "x", "y", [2.0, 8.5], k=3).collect()
    }
    # at 2.0 -> x in {1,2,3}; at 8.5 -> x in {8,9,7} (dist .5,.5,1.5)
    assert got[2.0] == pytest.approx(np.mean([10, 20, 30]))
    assert got[8.5] == pytest.approx(np.mean([80, 90, 70]))


def test_corr_significance_t_stat(series_df):
    df, pdf = series_df
    wide = (
        df.where("grp = 'a'")
        .select(F.col("t").alias("t"), F.col("x").alias("xa"))
        .join(
            df.where("grp = 'b'").select(
                F.col("t").alias("t"), F.col("x").alias("xb")
            ),
            "t",
        )
    )
    r = ev.corr_significance(wide, "xa", "xb").collect()[0]
    pw = pdf.pivot_table(index="t", columns="grp", values="x")
    rho = pw["a"].corr(pw["b"])
    n = len(pw)
    assert r["corr"] == pytest.approx(rho)
    assert r["t_stat"] == pytest.approx(rho * np.sqrt((n - 2) / (1 - rho * rho)))


def test_cosine_similarity_matches_numpy(series_df):
    df, pdf = series_df
    wide = df.groupBy("t").pivot("grp", ["a", "b"]).agg(F.first("x"))
    got = ev.cosine_similarity(wide, "a", "b").collect()[0]
    pa = pdf[pdf.grp == "a"].sort_values("t").x.values
    pb = pdf[pdf.grp == "b"].sort_values("t").x.values
    exp = float(np.dot(pa, pb) / (np.linalg.norm(pa) * np.linalg.norm(pb)))
    assert got["n"] == 40
    assert got["cosine_sim"] == pytest.approx(exp, abs=1e-9)
    assert got["cosine_dist"] == pytest.approx(1.0 - exp, abs=1e-9)


def test_loess_smooth_matches_numpy_kernel(series_df):
    df, pdf = series_df
    h = 4.0
    got = (
        ev.loess_smooth(df, "t", "x", bandwidth=h, by="grp")
        .orderBy("grp", "t")
        .toPandas()
    )
    exp_rows = []
    for g, sub in pdf.groupby("grp"):
        xs, ys = sub.t.values.astype(float), sub.x.values
        for xi in xs:
            d = np.abs(xs - xi)
            w = np.where(d < h, (1 - (d / h) ** 3) ** 3, 0.0)
            exp_rows.append((g, xi, float((w * ys).sum() / w.sum())))
    exp = pd.DataFrame(exp_rows, columns=["grp", "t", "s"]).sort_values(["grp", "t"])
    assert len(got) == len(exp)
    np.testing.assert_allclose(got.smoothed.values, exp.s.values, atol=1e-9)


def test_loess_plan_has_no_cross_join(series_df):
    df, _ = series_df
    plan = ev.loess_smooth(df, "t", "x", bandwidth=4.0, by="grp")._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_poisson_pmf_closed_form(spark):
    import math

    df = spark.createDataFrame([(k,) for k in [0, 1, 2, 3, 5, 8]], "k int")
    got = {r["k"]: (r["lam"], r["pmf"]) for r in ev.poisson_pmf(df, "k").collect()}
    lam = np.mean([0, 1, 2, 3, 5, 8])
    for k in [0, 1, 2, 3, 5, 8]:
        exp = math.exp(-lam) * lam**k / math.factorial(k)
        assert got[k][0] == pytest.approx(lam, abs=1e-12)
        assert got[k][1] == pytest.approx(exp, rel=1e-10)


def test_lerp_exact_on_linear_series(spark):
    known = spark.createDataFrame(
        [("g", 0.0, 0.0), ("g", 2.0, 4.0), ("g", 4.0, 8.0)], "grp string, x double, y double"
    )
    grid = spark.createDataFrame(
        [("g", 1.0), ("g", 3.0), ("g", 5.0)], "grp string, gx double"
    )
    got = {r["gx"]: r["lerp_y"] for r in ev.lerp(known, grid, "x", "y", "gx", by="grp").collect()}
    # interpolates inside segments; 5.0 is past the last knot -> dropped
    assert got == {1.0: 2.0, 3.0: 6.0}


def test_kmeans_step_1d_lloyd_iteration(spark):
    vals = [1.0, 2.0, 3.0, 9.0, 10.0, 30.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    got = {r["cluster"]: (r["n"], r["new_centroid"]) for r in
           ev.kmeans_step_1d(df, "v", [2.0, 8.0, 15.0, 30.0]).collect()}
    assert got[0] == (3, pytest.approx(2.0))
    assert got[1] == (2, pytest.approx(9.5))
    assert got[3] == (1, pytest.approx(30.0))
    assert 2 not in got  # empty cluster emits no row (reference drops it too)


def test_kmeans_tie_goes_to_lowest_cluster(spark):
    df = spark.createDataFrame([(5.0,)], "v double")  # equidistant from 2 and 8
    got = ev.kmeans_step_1d(df, "v", [2.0, 8.0]).collect()
    assert got[0]["cluster"] == 0


def test_fuzzy_kmeans_step_matches_numpy(spark):
    vals = np.array([1.0, 2.0, 3.0, 9.0, 10.0, 30.0])
    cents = [2.0, 8.0, 15.0, 30.0]
    df = spark.createDataFrame([(float(v),) for v in vals], "v double")
    got = {r["cluster"]: (r["soft_n"], r["new_centroid"]) for r in
           ev.fuzzy_kmeans_step_1d(df, "v", cents, m=2.0).collect()}
    d = np.maximum(np.abs(vals[:, None] - np.array(cents)[None, :]), 1e-12)
    inv = d ** -2.0
    u = inv / inv.sum(axis=1, keepdims=True)
    for j in range(4):
        assert got[j][0] == pytest.approx(u[:, j].sum(), rel=1e-9)
        exp_c = (u[:, j] ** 2 * vals).sum() / (u[:, j] ** 2).sum()
        assert got[j][1] == pytest.approx(exp_c, rel=1e-9)


def test_harmonic_fit_recovers_known_wave(spark):
    omega = 2 * np.pi / 7
    xs = np.arange(0, 28, dtype=float)
    ys = 5.0 + 2.0 * np.sin(omega * xs) - 1.5 * np.cos(omega * xs)
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    r = ev.harmonic_fit(df, "x", "y", omega).collect()[0]
    assert r["fit_a"] == pytest.approx(5.0, abs=1e-9)
    assert r["fit_b"] == pytest.approx(2.0, abs=1e-9)
    assert r["fit_c"] == pytest.approx(-1.5, abs=1e-9)


def test_matrix_sums_coo(spark):
    df = spark.createDataFrame(
        [(0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0)], "i int, j int, v double"
    )
    got = {(r["axis"], r["idx"]): r["total"] for r in
           ev.matrix_sums(df, "i", "j", "v").collect()}
    assert got[("row", 0)] == 3.0 and got[("row", 1)] == 7.0
    assert got[("col", 0)] == 4.0 and got[("col", 1)] == 6.0
    assert got[("grand", None)] == 10.0


def test_ecdf_matches_numpy(series_df):
    df, pdf = series_df
    got = ev.ecdf(df, "x", by="grp").orderBy("grp", "x").toPandas()
    for g, sub in pdf.groupby("grp"):
        xs = np.sort(sub.x.values)
        mine = got[got.grp == g]
        # every distinct value present, cdf = rank/n, last point hits 1.0
        assert len(mine) == len(np.unique(xs))
        np.testing.assert_allclose(
            mine.cdf.values,
            [np.searchsorted(xs, v, side="right") / len(xs) for v in mine.x.values],
            atol=1e-12,
        )
        assert mine.cdf.values[-1] == pytest.approx(1.0)


def test_normal_cdf_matches_scipy_free_oracle(series_df):
    df, pdf = series_df
    got = ev.normal_cdf(df, "x", by="grp").orderBy("grp", "x").toPandas()
    import math

    for g, sub in pdf.groupby("grp"):
        mu, sd = sub.x.mean(), sub.x.std(ddof=1)
        mine = got[got.grp == g]
        exp = [0.5 * (1.0 + math.erf((v - mu) / (sd * math.sqrt(2)))) for v in mine.x]
        # A&S 7.1.26 approximation is good to 1.5e-7 vs true erf
        np.testing.assert_allclose(mine.cdf.values, exp, atol=2e-7)
        assert (np.diff(mine.sort_values("x").cdf.values) >= -1e-12).all()


def test_binomial_pmf_sums_to_one_and_matches_math(spark):
    import math

    pdf = pd.DataFrame({"g": ["a"] * 8, "k": list(range(8))})
    df = spark.createDataFrame(pdf)
    got = ev.binomial_pmf(df, "k", n_trials=7, by="g").orderBy("k").toPandas()
    p = got.p_hat.iloc[0]
    exp = [math.comb(7, k) * p**k * (1 - p) ** (7 - k) for k in range(8)]
    np.testing.assert_allclose(got.pmf.values, exp, rtol=1e-10)
    assert got.pmf.sum() == pytest.approx(1.0, abs=1e-9)


def test_dbscan_1d_matches_bruteforce(spark):
    rng = np.random.default_rng(3)
    # two dense blobs + sparse noise
    xs = np.concatenate(
        [rng.normal(0, 0.2, 30), rng.normal(10, 0.2, 25), rng.uniform(20, 40, 5)]
    )
    pdf = pd.DataFrame({"g": "a", "x": xs})
    eps, mp = 0.5, 4
    got = (
        ev.dbscan_1d(spark.createDataFrame(pdf), "x", eps=eps, min_pts=mp, by="g")
        .orderBy("x")
        .toPandas()
    )
    # brute-force: core = >=mp neighbours in +-eps (self incl.)
    ux = np.sort(np.unique(xs))
    core = np.array([(np.abs(xs - v) <= eps).sum() >= mp for v in ux])
    assert len(got) == len(ux)
    np.testing.assert_array_equal(got.is_core.values, core)
    # the two blobs land in different clusters; sparse tail is noise
    lbl = dict(zip(got.x, got.label))
    blob0 = {lbl[v] for v in ux[ux < 5]}
    blob1 = {lbl[v] for v in ux[(ux > 5) & (ux < 15)]}
    assert len(blob0) == 1 and len(blob1) == 1 and blob0 != blob1
    noise = [lbl[v] for v in ux[ux > 15] if not core[np.searchsorted(ux, v)]]
    # isolated points with no core within eps are -1
    for v in ux[ux > 15]:
        if not (np.abs(ux[core] - v) <= eps).any():
            assert lbl[v] == -1


def test_gauss_fit_recovers_known_gaussian(spark):
    # exact gaussian samples: fit must recover (mu, sigma, A) ~ exactly
    mu, sigma, amp = 5.0, 2.0, 100.0
    xs = np.linspace(-1, 11, 25)
    ys = amp * np.exp(-((xs - mu) ** 2) / (2 * sigma**2))
    pdf = pd.DataFrame({"x": xs, "y": ys})
    got = ev.gauss_fit(spark.createDataFrame(pdf), "x", "y").toPandas()
    assert got.mu.iloc[0] == pytest.approx(mu, abs=1e-8)
    assert got.sigma.iloc[0] == pytest.approx(sigma, abs=1e-8)
    assert got.amplitude.iloc[0] == pytest.approx(amp, rel=1e-8)


def test_dist_cdf_family_identities(series_df):
    df, pdf = series_df
    got = ev.dist_cdf_family(df.where(F.col("x") > 0), "x", by="grp").toPandas()
    for g, sub in got.groupby("grp"):
        x = sub["x"].to_numpy()
        mean = sub["mean"].iloc[0]
        assert np.allclose(sub["exp_cdf"], 1.0 - np.exp(-x / mean))
        assert np.allclose(sub["weibull_cdf"], 1.0 - np.exp(-((x / mean) ** 1.5)))
        # log-normal CDF: in (0,1), monotone in x
        s = sub.sort_values("x")
        ln_cdf = s["lognormal_cdf"].to_numpy()
        assert ((ln_cdf > 0) & (ln_cdf < 1)).all()
        assert (np.diff(ln_cdf) >= -1e-12).all()


def test_akima_exact_on_linear_series(spark):
    # collinear knots: every slope equal -> tie rule -> Hermite is the line
    pdf = pd.DataFrame(
        {"g": ["a"] * 10, "x": np.arange(10.0), "y": 3.0 * np.arange(10.0) + 1.0}
    )
    got = (
        ev.akima_midpoints(spark.createDataFrame(pdf), "x", "y", by="g")
        .orderBy("mid_x")
        .toPandas()
    )
    # interior intervals only: n-5 of them for n knots
    assert len(got) == 5
    assert np.allclose(got["mid_y"], 3.0 * got["mid_x"] + 1.0)


def test_akima_matches_numpy_reference(spark):
    # cross-check the windowed formula against a straight numpy restatement
    rng = np.random.default_rng(3)
    x = np.sort(rng.choice(np.arange(100.0), size=20, replace=False))
    y = rng.normal(0, 5, size=20)
    pdf = pd.DataFrame({"g": ["a"] * 20, "x": x, "y": y})
    got = (
        ev.akima_midpoints(spark.createDataFrame(pdf), "x", "y", by="g")
        .orderBy("mid_x")
        .toPandas()
    )
    m = np.diff(y) / np.diff(x)

    def slope(i):  # Akima slope at knot i (interior only)
        den = abs(m[i + 1] - m[i]) + abs(m[i - 1] - m[i - 2])
        if den == 0:
            return (m[i - 1] + m[i]) / 2.0
        return (abs(m[i + 1] - m[i]) * m[i - 1] + abs(m[i - 1] - m[i - 2]) * m[i]) / den

    exp = []
    for i in range(2, len(x) - 4 + 1):
        if i + 2 > len(m) - 1:
            break
        s0, s1 = slope(i), slope(i + 1)
        dx = x[i + 1] - x[i]
        exp.append(
            ((x[i] + x[i + 1]) / 2.0, (y[i] + y[i + 1]) / 2.0 + dx * (s0 - s1) / 8.0)
        )
    exp = pd.DataFrame(exp, columns=["mid_x", "mid_y"])
    assert len(got) == len(exp)
    assert np.allclose(got["mid_x"], exp["mid_x"])
    assert np.allclose(got["mid_y"], exp["mid_y"])


def test_idft_reconstructs_original_series(spark):
    rng = np.random.default_rng(11)
    y = rng.normal(0, 10, size=16)
    pdf = pd.DataFrame({"g": ["a"] * 16, "t": np.arange(16.0), "y": y})
    spec = ev.dft_magnitude(spark.createDataFrame(pdf), "t", "y", by="g")
    rec = (
        ev.idft_reconstruct(spec, "k", "re", "im", by="g")
        .orderBy("i")
        .toPandas()
    )
    assert np.allclose(rec["y"].to_numpy(), y, atol=1e-9)
    # cross-check the spectrum against numpy's FFT convention
    np_spec = np.fft.fft(y)
    got_spec = spec.orderBy("k").toPandas()
    assert np.allclose(got_spec["re"], np_spec.real, atol=1e-9)
    assert np.allclose(got_spec["im"], np_spec.imag, atol=1e-9)


def test_gamma_pdf_closed_form(series_df):
    import math

    df, _ = series_df
    got = ev.gamma_pdf(df.where(F.col("x") > 0), "x", shape=2.0, by="grp").toPandas()
    for _, r in got.head(20).iterrows():
        theta = r["mean"] / 2.0
        expect = (r["x"] ** 1.0) * math.exp(-r["x"] / theta) / (
            math.gamma(2.0) * theta ** 2.0
        )
        assert abs(r["pdf"] - expect) < 1e-12


def test_zipf_pmf_normalizes(spark):
    pdf = pd.DataFrame({"k": np.arange(1, 21)})
    got = ev.zipf_pmf(spark.createDataFrame(pdf), "k", n_ranks=20, s=1.1).toPandas()
    assert abs(got["pmf"].sum() - 1.0) < 1e-12
    assert (got.sort_values("k")["pmf"].diff().dropna() < 0).all()


def test_convex_hull_square_with_interior_points(spark):
    pts = [(0, 0.0, 0.0), (1, 10.0, 0.0), (2, 10.0, 10.0), (3, 0.0, 10.0)]
    rng = np.random.default_rng(5)
    pts += [
        (10 + i, float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(1, 9, size=(40, 2)))
    ]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["pid", "x", "y"])).repartition(4)
    got = sorted(r["pid"] for r in ev.convex_hull(df, "x", "y", "pid").collect())
    assert got == [0, 1, 2, 3]


def test_convex_hull_matches_full_edge_test(spark):
    rng = np.random.default_rng(9)
    xy = rng.normal(0, 5, size=(60, 2))
    df = spark.createDataFrame(
        pd.DataFrame(
            [(i, float(x), float(y)) for i, (x, y) in enumerate(xy)],
            columns=["pid", "x", "y"],
        )
    ).repartition(6)
    got = sorted(r["pid"] for r in ev.convex_hull(df, "x", "y", "pid").collect())

    # brute-force closed-side edge test over ALL points
    hull = set()
    n = len(xy)
    for a in range(n):
        for b in range(n):
            if a == b:
                continue
            crs = [
                (xy[b][0] - xy[a][0]) * (p[1] - xy[a][1])
                - (xy[b][1] - xy[a][1]) * (p[0] - xy[a][0])
                for i, p in enumerate(xy)
                if i not in (a, b)
            ]
            if min(crs) >= 0 or max(crs) <= 0:
                hull.add(a)
    assert got == sorted(hull)


def test_enclosing_disk_square(spark):
    import math

    pts = [(0, 0.0, 0.0), (1, 10.0, 0.0), (2, 10.0, 10.0), (3, 0.0, 10.0)]
    rng = np.random.default_rng(2)
    pts += [
        (10 + i, float(x), float(y))
        for i, (x, y) in enumerate(rng.uniform(2, 8, size=(30, 2)))
    ]
    df = spark.createDataFrame(pd.DataFrame(pts, columns=["pid", "x", "y"])).repartition(4)
    row = ev.enclosing_disk(df, "x", "y", "pid").collect()[0]
    assert abs(row["center_x"] - 5.0) < 1e-9
    assert abs(row["center_y"] - 5.0) < 1e-9
    assert abs(row["radius"] - math.sqrt(50.0)) < 1e-9


def test_oscillate_matches_numpy(spark):
    out = ev.oscillate(spark, 16, amplitude=2.5, angular_freq=0.4, phase=1.0).orderBy("i").collect()
    i = np.arange(16)
    expect = 2.5 * np.sin(0.4 * i + 1.0)
    np.testing.assert_allclose([r["wave"] for r in out], expect, rtol=1e-12)


def test_primes_first_values(spark):
    got = [r["c"] for r in ev.primes(spark, 50).collect()]
    assert got == [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47]


def test_montecarlo_converges_to_second_moment(spark):
    # E[X^2] for Exponential(lambda=0.5) is 2/lambda^2 = 8
    row = ev.montecarlo_exponential(spark, 50_000, lam=0.5, moment=2).collect()[0]
    assert row["n"] == 50_000
    assert abs(row["estimate"] - 8.0) < 0.3


def test_precision_matrix_is_covariance_inverse(spark):
    rng = np.random.default_rng(7)
    x = rng.normal(0, 2, 500)
    y = 0.5 * x + rng.normal(0, 1, 500)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y})).repartition(4)
    row = ev.precision_matrix(df, "x", "y").collect()[0]
    cov = np.cov(np.vstack([x, y]))  # sample covariance (ddof=1)
    inv = np.linalg.inv(cov)
    np.testing.assert_allclose(
        [row["p_xx"], row["p_xy"], row["p_yy"]],
        [inv[0, 0], inv[0, 1], inv[1, 1]], rtol=1e-9,
    )


def test_pair_sort_parallel_arrays(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 1.0, 2.0], [30.0, 10.0, 20.0])],
        "rid long, k array<double>, v array<double>",
    )
    row = ev.pair_sort(df, "k", "v").collect()[0]
    assert row["sorted_keys"] == [1.0, 2.0, 3.0]
    assert row["sorted_vals"] == [10.0, 20.0, 30.0]


def test_multi_kmeans_picks_lowest_wcss_restart(spark):
    vals = [1.0, 2.0, 3.0, 9.0, 10.0, 30.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    # restart 0 is a bad init (all mass near one centroid); restart 1 is
    # the good init used in the single-restart test.
    rows = ev.multi_kmeans_step_1d(
        df, "v", [[100.0, 200.0], [2.0, 9.5, 30.0]]
    ).collect()
    assert all(r["restart"] == 1 for r in rows)
    got = {r["cluster"]: (r["n"], r["new_centroid"]) for r in rows}
    assert got[0] == (3, pytest.approx(2.0))
    assert got[1] == (2, pytest.approx(9.5))
    assert got[2] == (1, pytest.approx(30.0))
    # WCSS of the winner: sum of squared dists to nearest good centroid
    import numpy as _np

    d = _np.abs(_np.array(vals)[:, None] - _np.array([2.0, 9.5, 30.0])).min(axis=1)
    assert rows[0]["wcss"] == pytest.approx(float((d * d).sum()))


def test_multi_kmeans_tie_goes_to_lowest_restart_and_drops_empty(spark):
    df = spark.createDataFrame([(5.0,)], "v double")
    rows = ev.multi_kmeans_step_1d(df, "v", [[5.0, 99.0], [5.0, 99.0]]).collect()
    assert [r["restart"] for r in rows] == [0]  # identical WCSS -> restart 0
    assert [r["cluster"] for r in rows] == [0]  # empty cluster 1 dropped


# --- round-5: O(n log n) Kendall + FFT findDelay vs their pair-join twins


def _no_pair_join(df):
    """The de-quadratic invariant: the executed plan must contain no
    join of the series against itself (VERDICT r4 item 5)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for op in ("CartesianProduct", "BroadcastNestedLoopJoin",
               "SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"):
        assert op not in plan, f"{op} in plan:\n{plan}"
    return True


def test_kendall_knight_matches_pair_join_twin(spark):
    rng = np.random.default_rng(29)
    rows = []
    for g in ("a", "b", "c"):
        n = int(rng.integers(20, 60))
        x = rng.integers(0, 8, n).astype(float)   # heavy x ties
        y = x * rng.normal(1.0, 0.5, n) + rng.integers(0, 4, n)  # y ties too
        rows += [(g, float(x[i]), float(round(y[i], 1))) for i in range(n)]
    df = spark.createDataFrame(rows, "grp string, x double, y double")
    fast = ev.kendall_tau(df, "x", "y", by="grp")
    slow = ev.kendall_tau_pairs(df, "x", "y", by="grp")
    got = {r["grp"]: r["kendall_tau"] for r in fast.collect()}
    exp = {r["grp"]: r["kendall_tau"] for r in slow.collect()}
    assert set(got) == set(exp)
    for g in exp:
        assert got[g] == pytest.approx(exp[g], abs=1e-12), g
    assert _no_pair_join(fast)


def test_find_delay_fft_matches_pair_join_twin(spark):
    rng = np.random.default_rng(31)
    rows = []
    for g, shift in (("p", 7), ("q", -4), ("r", 0)):
        a = rng.integers(0, 50, 64).astype(float)  # count-like series
        b = np.roll(a, shift)
        rows += [(g, int(i), float(a[i]), float(b[i])) for i in range(64)]
    df = spark.createDataFrame(rows, "grp string, t long, a double, b double")
    fast = ev.find_delay(df, "t", "a", "b", by="grp")
    slow = ev.find_delay_pairs(df, "t", "a", "b", by="grp")
    got = {r["grp"]: r["delay"] for r in fast.collect()}
    exp = {r["grp"]: r["delay"] for r in slow.collect()}
    assert got == exp == {"p": -7, "q": 4, "r": 0}
    assert _no_pair_join(fast)


def test_find_delay_fft_exact_tiebreak(spark):
    # constant series: every lag of the overlap has a distinct exact r,
    # with near-ties at the ends — the exact re-score must pick the
    # reference's first-max (|r| desc, t asc)
    n = 32
    rows = [(int(i), 1.0, 1.0) for i in range(n)]
    df = spark.createDataFrame(rows, "t long, a double, b double")
    got = ev.find_delay(df, "t", "a", "b").collect()[0]["delay"]
    conv = np.convolve(np.ones(n), np.ones(n))
    exp = int(np.argmax(np.abs(conv))) + 1 - n  # == 0 (full overlap)
    assert got == exp == 0


def test_quadratic_twins_refuse_large_inputs(spark):
    from pyspark.sql import functions as F

    big = spark.range(100_001).select(
        F.col("id").alias("t"),
        F.lit("g").alias("grp"),
        F.rand(7).alias("a"),
        F.rand(8).alias("b"),
    )
    with pytest.raises(ValueError, match="oracle twin"):
        ev.find_delay_pairs(big, "t", "a", "b")
    with pytest.raises(ValueError, match="oracle twin"):
        ev.kendall_tau_pairs(big, "a", "b", by="grp")
