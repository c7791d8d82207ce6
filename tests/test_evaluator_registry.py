"""Registry evaluators vs plain Python/numpy ground truth.

Reference: io/eval/*.java (surface names from io/Lang.java), test
io/stream/MathExpressionTest.java — same inputs/outputs, computed here
as JVM Column expressions instead of driver-side tuple lambdas."""

import datetime
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from solr_spark.evaluator_registry import EVALUATORS, ev
from tests.conftest import spark  # noqa: F401


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def test_scalar_arithmetic(spark):
    got = spark.range(1).select(
        ev("add", 1.5, 2.0, 3.0).alias("add"),
        ev("sub", 5.0, 1.5).alias("sub"),
        ev("mult", 2.0, 3.0, 4.0).alias("mult"),
        ev("div", 7.0, 2.0).alias("div"),
        ev("mod", 7.0, 3.0).alias("mod"),
        ev("pow", 2.0, 10.0).alias("pow"),
        ev("cbrt", 27.0).alias("cbrt"),
        ev("log10", 1000.0).alias("log10"),
        ev("factorial", 5).alias("fact"),
        ev("binomialCoefficient", 10, 3).alias("binom"),
        ev("binomialCoefficient", 10, 0).alias("binom0"),
        ev("convert", "miles", "kilometers", 1.0).alias("mi_km"),
    ).collect()[0]
    assert got["add"] == 6.5 and got["sub"] == 3.5 and got["mult"] == 24.0
    assert got["div"] == 3.5 and got["mod"] == 1.0 and got["pow"] == 1024.0
    assert got["cbrt"] == pytest.approx(3.0) and got["log10"] == pytest.approx(3.0)
    assert got["fact"] == 120.0 and got["binom"] == 120.0 and got["binom0"] == 1.0
    assert got["mi_km"] == pytest.approx(1.609344)


def test_round_is_math_round_not_half_up(spark):
    # Math.round(-2.5) == -2 (floor(x+0.5)), unlike SQL HALF_UP's -3
    assert one(spark, ev("round", F.lit(-2.5))) == -2
    assert one(spark, ev("round", F.lit(2.5))) == 3


def test_boolean_string(spark):
    got = spark.range(1).select(
        ev("if", ev("gt", 3, 2), "yes", "no").alias("iff"),
        ev("eor", True, True).alias("eor"),
        ev("matches", "hello42", r"h.*\d+").alias("m"),
        ev("trunc", "abcdef", 3).alias("tr"),
        ev("concat", "a", "-", "b").alias("cc"),
    ).collect()[0]
    assert got["iff"] == "yes" and got["eor"] is False
    assert got["m"] is True and got["tr"] == "abc" and got["cc"] == "a-b"


def test_temporal_fields(spark):
    ts = datetime.datetime(2024, 5, 17, 13, 45, 9)
    df = spark.createDataFrame([(ts,)], "ts timestamp")
    got = df.select(
        *[ev(n, F.col("ts")).alias(n) for n in
          ("year", "month", "day", "dayOfYear", "dayOfQuarter", "hour",
           "minute", "second", "week", "quarter")]
    ).collect()[0]
    assert (got["year"], got["month"], got["day"]) == (2024, 5, 17)
    assert got["dayOfYear"] == ts.timetuple().tm_yday
    # Q2 starts Apr 1: Apr(30) + 17
    assert got["dayOfQuarter"] == 47
    assert (got["hour"], got["minute"], got["second"]) == (13, 45, 9)
    assert got["week"] == ts.isocalendar()[1] and got["quarter"] == 2


def test_array_ops(spark):
    v = [3.0, 1.0, 4.0, 1.0, 5.0]
    df = spark.createDataFrame([(v,)], "v array<double>")
    got = df.select(
        ev("rev", "v").alias("rev"),
        ev("copyOf", "v", 3).alias("cpo"),
        ev("copyOfRange", "v", 1, 4).alias("cor"),
        ev("valueAt", "v", 2).alias("at2"),
        ev("indexOf", "v", 4.0).alias("idx"),
        ev("indexOf", "v", 99.0).alias("idxmiss"),
        ev("asc", "v").alias("asc"),
        ev("length", "v").alias("len"),
        ev("ltrim", "v").alias("lt"),
        ev("rtrim", "v").alias("rt"),
        ev("sequence", 4, 10, 2).alias("seq"),
        ev("zeros", 3).alias("z"),
        ev("repeat", 7.5, 2).alias("rep"),
        ev("precision", ev("normalizeSum", "v"), 4).alias("nsum"),
        ev("precision", ev("unitize", "v"), 4).alias("unit"),
        ev("minMaxScale", "v").alias("mms"),
    ).collect()[0]
    assert got["rev"] == v[::-1] and got["cpo"] == v[:3] and got["cor"] == v[1:4]
    assert got["at2"] == 4.0 and got["idx"] == 2 and got["idxmiss"] == -1
    assert got["asc"] == sorted(v) and got["len"] == 5
    assert got["lt"] == v[1:] and got["rt"] == v[:-1]
    assert got["seq"] == [10, 12, 14, 16]
    assert got["z"] == [0.0, 0.0, 0.0] and got["rep"] == [7.5, 7.5]
    s = sum(v)
    assert got["nsum"] == [round(x / s, 4) for x in v]
    n = math.sqrt(sum(x * x for x in v))
    assert got["unit"] == [round(x / n, 4) for x in v]
    assert got["mms"] == [(x - 1.0) / 4.0 for x in v]


def test_vector_distances_vs_numpy(spark):
    a = np.array([1.0, -2.0, 3.0, 0.5])
    b = np.array([0.0, 2.0, 1.0, -0.5])
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "a array<double>, b array<double>"
    )
    got = df.select(
        ev("dotProduct", "a", "b").alias("dot"),
        ev("cosineSimilarity", "a", "b").alias("cos"),
        ev("cosine", "a", "b").alias("cosd"),
        ev("euclidean", "a", "b").alias("euc"),
        ev("manhattan", "a", "b").alias("man"),
        ev("canberra", "a", "b").alias("can"),
        ev("chebyshev", "a", "b").alias("che"),
        ev("l1norm", "a").alias("l1"),
        ev("l2norm", "a").alias("l2"),
        ev("linfnorm", "a").alias("linf"),
    ).collect()[0]
    assert got["dot"] == pytest.approx(float(a @ b))
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert got["cos"] == pytest.approx(cos)
    assert got["cosd"] == pytest.approx(1 - cos)
    assert got["euc"] == pytest.approx(float(np.linalg.norm(a - b)))
    assert got["man"] == pytest.approx(float(np.abs(a - b).sum()))
    can = float(
        sum(abs(x - y) / (abs(x) + abs(y)) for x, y in zip(a, b) if abs(x) + abs(y))
    )
    assert got["can"] == pytest.approx(can)
    assert got["che"] == pytest.approx(float(np.abs(a - b).max()))
    assert got["l1"] == pytest.approx(float(np.abs(a).sum()))
    assert got["l2"] == pytest.approx(float(np.linalg.norm(a)))
    assert got["linf"] == pytest.approx(float(np.abs(a).max()))
    # canberra 0/0 coordinate contributes 0 (commons-math semantics)
    z = spark.createDataFrame([([0.0, 1.0], [0.0, 3.0])],
                              "a array<double>, b array<double>")
    assert z.select(ev("canberra", "a", "b").alias("c")).collect()[0]["c"] == \
        pytest.approx(0.5)


def test_matrix_ops_vs_numpy(spark):
    m = np.array([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    b = np.array([[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    df = spark.createDataFrame(
        [(m.tolist(), b.tolist())],
        "m array<array<double>>, b array<array<double>>",
    )
    got = df.select(
        ev("transpose", "m").alias("t"),
        ev("sumRows", "m").alias("sr"),
        ev("sumColumns", "m").alias("sc"),
        ev("grandSum", "m").alias("gs"),
        ev("scalarMultiply", 2.0, "m").alias("sm"),
        ev("ebeAdd", ev("rowAt", "m", 0), ev("rowAt", "m", 1)).alias("ebe"),
        ev("matrixMult", "m", "b").alias("mm"),
        ev("colAt", "m", 1).alias("col1"),
        ev("rowCount", "m").alias("rc"),
        ev("columnCount", "m").alias("cc"),
    ).collect()[0]
    assert got["t"] == m.T.tolist()
    assert got["sr"] == m.sum(axis=1).tolist()
    assert got["sc"] == m.sum(axis=0).tolist()
    assert got["gs"] == pytest.approx(float(m.sum()))
    assert got["sm"] == (2 * m).tolist()
    assert got["ebe"] == (m[0] + m[1]).tolist()
    assert got["mm"] == (m @ b).tolist()
    assert got["col1"] == m[:, 1].tolist()
    assert (got["rc"], got["cc"]) == (2, 3)


def test_unknown_evaluator_raises():
    with pytest.raises(KeyError, match="unknown evaluator"):
        ev("noSuchThing", 1)


def test_registry_size_documents_breadth():
    # the registry alone covers 100+ reference evaluator surface names
    assert len(EVALUATORS) >= 95
