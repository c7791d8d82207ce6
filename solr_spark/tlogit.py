"""tlogit — text logistic regression (distributed batch gradient descent).

The analog of the reference's ``search/TextLogisticRegressionQParserPlugin
.java`` (test ``TestTextLogisticRegressionQParserPlugin`` via streaming's
``features()``/``train()`` expressions): train a logistic-regression
classifier whose features are term frequencies of a feature-term list,
and score/classify documents with the learned weights.

Spark-first restatement: the reference iterates SGD per shard and merges
weight vectors per iteration; here each iteration is ONE distributed
aggregation (mean gradient over all docs — map-side combined, numerically
the classic full-batch GD), with the driver holding only the (m+1)-vector
of weights. Feature extraction is a JVM ``size(filter(tokens, ...))``
expression — no Python in the per-doc path. The tf features are frozen
(raw counts), matching the reference's ``TrainingParams`` default.

Training is iterative but DETERMINISTIC given a frozen epoch count and
the per-epoch weight rounding (see ``tlogit_train``), so the driver
entry is hash-checked against an unrolled-epoch DuckDB oracle — each
epoch is one CTE computing the same rounded gradient step. Convergence /
recovery of a planted signal is additionally pytest-gated
(tests/test_tlogit.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from solr_spark.analysis import CODE_CHAIN, AnalyzerChain


def _feature_cols(text_col: str, terms: list[str], chain: AnalyzerChain) -> list[Column]:
    toks = chain.tokens(text_col)

    def tf(t: str) -> Column:
        # NOTE: a `lambda x, t=t:` default-arg capture would make pyspark
        # treat this as a 2-arg (element, index) lambda — hence the factory
        return F.size(F.filter(toks, lambda x: x == F.lit(t))).cast("double")

    return [tf(t).alias(f"f{i}") for i, t in enumerate(terms)]


def tlogit_train(
    df: DataFrame,
    text_col: str,
    label_col: Column,
    terms: list[str],
    chain: AnalyzerChain = CODE_CHAIN,
    iters: int = 20,
    lr: float = 1.0,
    round_digits: int | None = 8,
) -> list[float]:
    """Train logistic regression (bias + one weight per feature term).

    ``label_col``: boolean/0-1 Column. Returns [w0, w1..wm] after
    ``iters`` full-batch GD steps (one distributed aggregation each).

    ``round_digits`` freezes each epoch's weights to a fixed decimal
    grid (default 1e-8). Full-batch GD is then REPLAYABLE bit-for-bit by
    any engine: the only cross-engine nondeterminism is the summation
    order inside ``avg`` (~1e-13 absolute here), which the rounding
    absorbs, while the per-row arithmetic (+,*, the frozen left-fold z)
    is IEEE-deterministic. This is what lets the driver hash-check the
    trained entry against an unrolled-epoch DuckDB oracle. Pass ``None``
    for raw float weights.
    """
    m = len(terms)
    data = df.select(
        label_col.cast("double").alias("y"), *_feature_cols(text_col, terms, chain)
    ).localCheckpoint(eager=True)  # tokenize once, not once per iteration
    w = [0.0] * (m + 1)
    for _ in range(iters):
        z = F.lit(w[0])
        for j in range(m):
            z = z + F.lit(w[j + 1]) * F.col(f"f{j}")
        err = F.col("y") - F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        row = data.agg(
            F.avg(err).alias("g0"),
            *[F.avg(err * F.col(f"f{j}")).alias(f"g{j + 1}") for j in range(m)],
        ).collect()[0]
        w = [w[j] + lr * float(row[f"g{j}"]) for j in range(m + 1)]
        if round_digits is not None:
            w = [round(x, round_digits) for x in w]
    return w


def tlogit_classify(
    df: DataFrame,
    text_col: str,
    weights: list[float],
    terms: list[str],
    chain: AnalyzerChain = CODE_CHAIN,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Score docs with trained weights: (keep_cols…, prob double,
    predicted int). The q-time half of the tlogit parser (docs whose
    probability clears 0.5)."""
    feats = _feature_cols(text_col, terms, chain)
    z = F.lit(float(weights[0]))
    scored = df.select(*(keep_cols or df.columns), *feats)
    for j in range(len(terms)):
        z = z + F.lit(float(weights[j + 1])) * F.col(f"f{j}")
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return scored.select(
        *(keep_cols or df.columns),
        prob.alias("prob"),
        (prob >= 0.5).cast("int").alias("predicted"),
    )
