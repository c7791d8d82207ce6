"""Quick three-way parity smoke for the analyzer chain (not a pytest)."""

import duckdb

from solr_spark.analysis import CODE_CHAIN
from solr_spark.session import get_spark

SAMPLES = [
    "def parseJsonHTTPServer2(self): return snake_case_name  # The answer",
    "public class FooBar { int myVar2X = 0; }",
    "the a an of to in is THE In",
    "",
    "___",
    "CamelCase andThe RestOfIt 42x7",
]

spark = get_spark("smoke", master="local[4]")
df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id long, text string")
spark_toks = {
    r["id"]: r["toks"]
    for r in df.select("id", CODE_CHAIN.tokens("text").alias("toks")).collect()
}
udf_toks = {
    r["id"]: r["toks"]
    for r in df.select("id", CODE_CHAIN.tokens_pandas_udf()("text").alias("toks")).collect()
}
py_toks = {i: CODE_CHAIN.tokenize_py(s) for i, s in enumerate(SAMPLES)}

con = duckdb.connect()
con.execute("CREATE TABLE t AS SELECT * FROM (VALUES " +
            ", ".join(f"({i}, '{s.replace(chr(39), chr(39)*2)}')" for i, s in enumerate(SAMPLES)) +
            ") v(id, text)")
duck_expr = CODE_CHAIN.duckdb_tokens_expr("text")
duck_toks = {r[0]: r[1] for r in con.execute(f"SELECT id, {duck_expr} FROM t").fetchall()}

ok = True
for i, s in enumerate(SAMPLES):
    forms = {"spark": spark_toks[i], "udf": udf_toks[i], "py": py_toks[i], "duck": duck_toks[i]}
    vals = set(tuple(v) for v in forms.values())
    if len(vals) != 1:
        ok = False
        print(f"MISMATCH on {s!r}:")
        for k, v in forms.items():
            print(f"  {k}: {v}")
    else:
        print(f"OK {s!r} -> {py_toks[i]}")
print("ALL OK" if ok else "FAILED")
