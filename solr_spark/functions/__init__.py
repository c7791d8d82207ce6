"""Scalar-function layer: the analog of the reference's function-query
registry (``search/ValueSourceParser.java:162-1361``, 105 parsers) plus the
deterministic hash kernels shared by the dedup / fingerprint operators.

Everything here is a *pure column expression* (JVM-side, whole-stage
codegen) with, where an oracle needs it, a synchronized DuckDB SQL form.
"""

from solr_spark.functions.hashing import (
    MINHASH_A,
    MINHASH_C,
    MINHASH_MOD,
    md5_long,
    md5_long_sql,
    minhash_perm,
    minhash_perm_sql,
)
from solr_spark.functions.scalars import (
    frange,
    linear,
    map_value,
    ms,
    recip,
    scale_expr,
    strdist,
)

__all__ = [
    "md5_long",
    "md5_long_sql",
    "minhash_perm",
    "minhash_perm_sql",
    "MINHASH_A",
    "MINHASH_C",
    "MINHASH_MOD",
    "recip",
    "linear",
    "map_value",
    "scale_expr",
    "strdist",
    "ms",
    "frange",
]
