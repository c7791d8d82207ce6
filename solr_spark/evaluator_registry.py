"""The long tail of the reference's stream-evaluator library — scalar,
boolean, string, temporal, array, vector-distance and matrix evaluators
(``solr/solrj-streaming/src/java/org/apache/solr/client/solrj/io/eval/``,
surface names registered in ``io/Lang.java:338-560``) — restated as
PySpark Column **expression builders**.

The reference evaluates these driver-side, tuple at a time, inside the
``let``/``select`` lambda layer. At 100 TB that is exactly backwards, so
here every evaluator is a JVM Column expression (whole-stage codegen,
zero Python in the hot path): array and matrix evaluators use Spark's
higher-order functions (``transform``/``aggregate``/``zip_with``), so
they compose into any DataFrame plan and execute distributed.

The registry is table-driven: ``EVALUATORS`` maps the reference's
streaming-expression surface name (``add``, ``cbrt``, ``dayOfQuarter``,
``ebeMultiply``, ``matrixMult`` …) to a builder
``Callable[..., Column]``; ``ev(name, *args)`` applies one. For
numeric/array/temporal/matrix evaluators a str arg is a COLUMN NAME;
for string evaluators (upper/concat/…), comparison right-hand sides
and if/coalesce branches, str args are literals. Array
evaluators take ``array<double>`` Columns; matrix evaluators take
``array<array<double>>`` Columns. Indices follow the REFERENCE
convention (0-based — ``valueAt(v, 0)`` is the first element) even
though Spark's own element_at is 1-based.

Deliberate divergences (documented, not silent):
- ``copyOf(v, n)`` truncates but does not zero-pad past the end
  (java.util.Arrays.copyOf pads; the reference's uses are truncations).
- ``uuid`` is nondeterministic by nature — excluded from oracle gating.
"""

from __future__ import annotations

from functools import reduce
from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    """Literal lifter: non-Columns become literals (string evaluators and
    comparison right-hand sides take genuine string literals)."""
    return x if isinstance(x, Column) else F.lit(x)


def _a(x) -> Column:
    """Column lifter for numeric/array/temporal/matrix operands: a str is
    a COLUMN NAME (these evaluators never take string literals), anything
    else a literal — so ``ev("rev", "v")`` reads column v."""
    if isinstance(x, Column):
        return x
    if isinstance(x, str):
        return F.col(x)
    return F.lit(x)


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, e: acc + e
    )


def _l2(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, e: acc + e * e))


def _asum(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, e: acc + e)


def _binom(n, k) -> Column:
    """BinomialCoefficientEvaluator: exact for results < 2^53 — running
    product prod_{i=1..k} (n-k+i)/i stays integral at every step."""
    n, k = _a(n).cast("double"), _a(k).cast("int")
    prod = F.aggregate(
        F.sequence(F.lit(1), k),
        F.lit(1.0),
        lambda acc, i: acc * (n - k.cast("double") + i.cast("double")) / i.cast("double"),
    )
    return F.when(k <= 0, F.lit(1.0)).otherwise(F.round(prod, 0))


def _day_of_quarter(ts) -> Column:
    ts = _a(ts)
    return F.dayofyear(ts) - F.dayofyear(F.date_trunc("quarter", ts)) + 1


def _convert(frm: str, to: str, x) -> Column:
    """ConversionEvaluator: length-unit conversion via meters."""
    meters = {
        "inches": 0.0254, "feet": 0.3048, "yards": 0.9144, "miles": 1609.344,
        "millimeters": 0.001, "centimeters": 0.01, "meters": 1.0,
        "kilometers": 1000.0,
    }
    if frm not in meters or to not in meters:
        raise ValueError(f"convert: unknown unit {frm!r} or {to!r}")
    return _a(x) * F.lit(meters[frm] / meters[to])


def _transpose(m: Column) -> Column:
    cols = F.sequence(F.lit(1), F.size(F.element_at(m, 1)))
    return F.transform(cols, lambda j: F.transform(m, lambda r: F.element_at(r, j)))


EVALUATORS: dict[str, Callable[..., Column]] = {
    # --- arithmetic (AddEvaluator, SubtractEvaluator, ... io/eval/) ---
    "abs": lambda x: F.abs(_a(x)),
    "add": lambda *xs: reduce(lambda a, b: a + b, map(_a, xs)),
    "sub": lambda a, b: _a(a) - _a(b),
    "mult": lambda *xs: reduce(lambda a, b: a * b, map(_a, xs)),
    "div": lambda a, b: _a(a) / _a(b),
    "mod": lambda a, b: _a(a) % _a(b),
    "pow": lambda a, b: F.pow(_a(a), _a(b)),
    "ceil": lambda x: F.ceil(_a(x)),
    "floor": lambda x: F.floor(_a(x)),
    # RoundEvaluator = Math.round = floor(x + 0.5) (NOT half-up: -2.5 -> -2)
    "round": lambda x: F.floor(_a(x) + F.lit(0.5)).cast("long"),
    "sqrt": lambda x: F.sqrt(_a(x)),
    "cbrt": lambda x: F.cbrt(_a(x)),
    "log": lambda x: F.log(_a(x)),
    "log10": lambda x: F.log10(_a(x)),
    "sin": lambda x: F.sin(_a(x)),
    "asin": lambda x: F.asin(_a(x)),
    "sinh": lambda x: F.sinh(_a(x)),
    "cos": lambda x: F.cos(_a(x)),
    "acos": lambda x: F.acos(_a(x)),
    "cosh": lambda x: F.cosh(_a(x)),
    "tan": lambda x: F.tan(_a(x)),
    "atan": lambda x: F.atan(_a(x)),
    "tanh": lambda x: F.tanh(_a(x)),
    "factorial": lambda x: F.factorial(_a(x).cast("int")).cast("double"),
    "binomialCoefficient": _binom,
    "double": lambda x: _a(x).cast("double"),
    "long": lambda x: _a(x).cast("long"),
    "convert": _convert,
    # --- boolean / comparison (EqualTo, GreaterThan, ... io/eval/) ---
    "and": lambda *xs: reduce(lambda a, b: a & b, map(_a, xs)),
    "or": lambda *xs: reduce(lambda a, b: a | b, map(_a, xs)),
    "not": lambda x: ~_a(x),
    "eor": lambda a, b: _a(a) != _c(b),  # ExclusiveOrEvaluator
    "eq": lambda a, b: _a(a) == _c(b),
    "gt": lambda a, b: _a(a) > _c(b),
    "gteq": lambda a, b: _a(a) >= _c(b),
    "lt": lambda a, b: _a(a) < _c(b),
    "lteq": lambda a, b: _a(a) <= _c(b),
    "if": lambda c, a, b: F.when(_a(c), _c(a)).otherwise(_c(b)),
    "coalesce": lambda *xs: F.coalesce(*map(_c, xs)),
    "isNull": lambda x: _a(x).isNull(),
    "notNull": lambda x: _a(x).isNotNull(),
    # --- string (Upper, Lower, Trim, Concat, Matches, Trunc io/eval/) ---
    "upper": lambda x: F.upper(_c(x)),
    "lower": lambda x: F.lower(_c(x)),
    "trim": lambda x: F.trim(_c(x)),
    "concat": lambda *xs: F.concat(*map(_c, xs)),
    "split": lambda x, sep: F.split(_c(x), sep),
    "matches": lambda x, pat: _c(x).rlike(pat),
    "trunc": lambda x, n: _c(x).substr(F.lit(1), _c(n)),
    "uuid": lambda: F.expr("uuid()"),
    # --- temporal (TemporalEvaluator*.java; week = ISO week-of-year,
    #     epoch = millis since epoch at UTC) ---
    "year": lambda ts: F.year(_a(ts)),
    "month": lambda ts: F.month(_a(ts)),
    "day": lambda ts: F.dayofmonth(_a(ts)),
    "dayOfYear": lambda ts: F.dayofyear(_a(ts)),
    "dayOfQuarter": _day_of_quarter,
    "hour": lambda ts: F.hour(_a(ts)),
    "minute": lambda ts: F.minute(_a(ts)),
    "second": lambda ts: F.second(_a(ts)),
    # NTZ inputs are interpreted at UTC (sessions here pin
    # spark.sql.session.timeZone=UTC), matching the reference's
    # LocalDateTime.atZone(UTC).toInstant().toEpochMilli()
    "epoch": lambda ts: F.unix_millis(_a(ts).cast("timestamp")),
    "week": lambda ts: F.weekofyear(_a(ts)),
    "quarter": lambda ts: F.quarter(_a(ts)),
    # --- array (Array, Reverse, Append, CopyOf(Range), ValueAt, IndexOf,
    #     Asc, Sequence, Zeros/Ones/Repeat, LeftShift/RightShift,
    #     Precision, NormalizeSum, Unit, Normalize, MinMaxScale io/eval/;
    #     reference indices are 0-based) ---
    "array": lambda *xs: F.array(*map(_c, xs)),
    "rev": lambda v: F.reverse(_a(v)),
    "append": lambda *vs: F.concat(*map(_a, vs)),
    "copyOf": lambda v, n: F.slice(_a(v), 1, _a(n).cast("int")),
    "copyOfRange": lambda v, a, b: F.slice(
        _a(v), _a(a).cast("int") + 1, (_a(b) - _a(a)).cast("int")
    ),
    "valueAt": lambda v, i: F.element_at(_a(v), _a(i).cast("int") + 1),
    "indexOf": lambda v, x: F.array_position(_a(v), _a(x)).cast("int") - 1,
    "asc": lambda v: F.array_sort(_a(v)),
    "length": lambda v: F.size(_a(v)),
    "sequence": lambda n, start, stride: F.sequence(
        _a(start),
        _a(start) + (_a(n).cast("int") - 1) * _a(stride),
        _a(stride),
    ),
    "zeros": lambda n: F.array_repeat(F.lit(0.0), _a(n).cast("int")),
    "ones": lambda n: F.array_repeat(F.lit(1.0), _a(n).cast("int")),
    "repeat": lambda x, n: F.array_repeat(_a(x), _a(n).cast("int")),
    "ltrim": lambda v: F.slice(_a(v), 2, F.size(_a(v)) - 1),  # LeftShift
    "rtrim": lambda v: F.slice(_a(v), 1, F.size(_a(v)) - 1),  # RightShift
    "precision": lambda v, d: F.transform(_a(v), lambda e: F.round(e, d)),
    "normalizeSum": lambda v: F.transform(_a(v), lambda e: e / _asum(_a(v))),
    "unitize": lambda v: F.transform(_a(v), lambda e: e / _l2(_a(v))),
    "standardize": lambda v: F.transform(
        _a(v),
        lambda e: (e - _asum(_a(v)) / F.size(_a(v)))
        / F.sqrt(
            F.aggregate(
                _a(v),
                F.lit(0.0),
                lambda acc, x: acc
                + (x - _asum(_a(v)) / F.size(_a(v)))
                * (x - _asum(_a(v)) / F.size(_a(v))),
            )
            / (F.size(_a(v)) - 1)
        ),
    ),
    "minMaxScale": lambda v, lo=0.0, hi=1.0: F.transform(
        _a(v),
        lambda e: F.lit(lo)
        + (e - F.array_min(_a(v)))
        * (F.lit(hi) - F.lit(lo))
        / (F.array_max(_a(v)) - F.array_min(_a(v))),
    ),
    # --- vector distances / norms (Euclidean, Manhattan, Canberra,
    #     Chebyshev(Distance), CosineDistance, DotProduct, Norm,
    #     LInfNorm io/eval/) ---
    "dotProduct": _dot,
    "cosineSimilarity": lambda a, b: _dot(_a(a), _a(b)) / (_l2(_a(a)) * _l2(_a(b))),
    "cosine": lambda a, b: F.lit(1.0) - _dot(_a(a), _a(b)) / (_l2(_a(a)) * _l2(_a(b))),
    "euclidean": lambda a, b: F.sqrt(
        F.aggregate(
            F.zip_with(_a(a), _a(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
    ),
    "manhattan": lambda a, b: _asum(F.zip_with(_a(a), _a(b), lambda x, y: F.abs(x - y))),
    "canberra": lambda a, b: _asum(
        F.zip_with(
            _a(a),
            _a(b),
            lambda x, y: F.when(F.abs(x) + F.abs(y) == 0, F.lit(0.0)).otherwise(
                F.abs(x - y) / (F.abs(x) + F.abs(y))
            ),
        )
    ),
    "chebyshev": lambda a, b: F.array_max(
        F.zip_with(_a(a), _a(b), lambda x, y: F.abs(x - y))
    ),
    "l1norm": lambda v: _asum(F.transform(_a(v), F.abs)),
    "l2norm": _l2,
    "linfnorm": lambda v: F.array_max(F.transform(_a(v), F.abs)),
    # --- element-by-element vector ops (EBE*.java) ---
    "ebeAdd": lambda a, b: F.zip_with(_a(a), _a(b), lambda x, y: x + y),
    "ebeSubtract": lambda a, b: F.zip_with(_a(a), _a(b), lambda x, y: x - y),
    "ebeMultiply": lambda a, b: F.zip_with(_a(a), _a(b), lambda x, y: x * y),
    "ebeDivide": lambda a, b: F.zip_with(_a(a), _a(b), lambda x, y: x / y),
    # --- matrix (Matrix, Transpose, SumRows/SumColumns, GrandSum,
    #     Scalar*, MatrixMultiply, RowAt/ColumnAt, RowCount/ColumnCount
    #     io/eval/; m is array<array<double>>) ---
    "matrix": lambda *rows: F.array(*map(_c, rows)),
    "transpose": _transpose,
    "sumRows": lambda m: F.transform(_a(m), _asum),
    "sumColumns": lambda m: F.transform(_transpose(_a(m)), _asum),
    "grandSum": lambda m: _asum(F.transform(_a(m), _asum)),
    "scalarAdd": lambda s, m: F.transform(
        _a(m), lambda r: F.transform(r, lambda e: e + _a(s))
    ),
    "scalarSubtract": lambda s, m: F.transform(
        _a(m), lambda r: F.transform(r, lambda e: e - _a(s))
    ),
    "scalarMultiply": lambda s, m: F.transform(
        _a(m), lambda r: F.transform(r, lambda e: e * _a(s))
    ),
    "scalarDivide": lambda s, m: F.transform(
        _a(m), lambda r: F.transform(r, lambda e: e / _a(s))
    ),
    "matrixMult": lambda a, b: F.transform(
        _a(a), lambda ra: F.transform(_transpose(_a(b)), lambda cb: _dot(ra, cb))
    ),
    "rowAt": lambda m, i: F.element_at(_a(m), _a(i).cast("int") + 1),
    "colAt": lambda m, j: F.transform(
        _a(m), lambda r: F.element_at(r, _a(j).cast("int") + 1)
    ),
    "rowCount": lambda m: F.size(_a(m)),
    "columnCount": lambda m: F.size(F.element_at(_a(m), 1)),
}


def ev(name: str, *args) -> Column:
    """Apply the named reference evaluator to the given args."""
    try:
        builder = EVALUATORS[name]
    except KeyError:
        raise KeyError(
            f"unknown evaluator {name!r}; see EVALUATORS for the registry"
        ) from None
    return builder(*args)
