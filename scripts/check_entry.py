"""Mimic the driver's correctness gate: run each __spark_entry__ query on
Spark AND its oracle SQL on DuckDB at sf0.01; compare row count, column
names, and order-insensitive values."""

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entry_mod  # noqa: E402
from solr_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_cell(v):
    """Strict, type-aware normalization mirroring the driver's value hash:
    a DuckDB Decimal (HUGEINT sums) must NOT compare equal to a Spark int,
    and floats compare at full precision (both sides are expected to round
    explicitly inside the query)."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, float):
        return ("f", "nan" if math.isnan(v) else v.hex())
    if isinstance(v, int):
        return ("i", v)
    if hasattr(v, "isoformat"):
        return ("t", v.isoformat()[:26])
    if isinstance(v, (list, tuple)):
        return ("l", tuple(norm_cell(x) for x in v))
    return (type(v).__name__, str(v))


def norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm_cell(r[i]) for i in idx) for r in rows)


def main():
    spark = get_spark("check_entry")
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs = entry_mod.queries()
    oqs = entry_mod.oracle_sql()
    only = sys.argv[1:] or list(qs)
    n_pass = n_fail = 0
    log: dict[str, dict] = {}  # driver-format record (CORRECTNESS_*.json)
    for name in only:
        fn = qs[name]
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            log[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                         "spark_rows": None, "oracle_rows": None,
                         "err": f"spark error {type(e).__name__}: {e}"}
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oqs:
            print(f"SKIP {name}: no oracle ({len(srows)} rows, {dt:.1f}s)")
            log[name] = {"rows_match": None, "schema_match": None, "hash_match": None,
                         "spark_rows": len(srows), "oracle_rows": None,
                         "err": "rows-only: no SQL oracle (by design)"}
            continue
        try:
            res = con.execute(oqs[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            log[name] = {"rows_match": False, "schema_match": False, "hash_match": False,
                         "spark_rows": len(srows), "oracle_rows": None,
                         "err": f"duckdb error: {e}"}
            n_fail += 1
            continue
        problems = []
        schema_ok = sorted(scols) == sorted(dcols)
        rows_ok = len(srows) == len(drows)
        if not schema_ok:
            problems.append(f"schema {sorted(scols)} != {sorted(dcols)}")
        if not rows_ok:
            problems.append(f"rowcount {len(srows)} != {len(drows)}")
        hash_ok = False
        if not problems:
            a, b = norm_rows(scols, srows), norm_rows(dcols, drows)
            hash_ok = a == b
            if not hash_ok:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                problems.append(f"values differ, e.g. {diff}")
        log[name] = {"rows_match": rows_ok, "schema_match": schema_ok,
                     "hash_match": hash_ok, "spark_rows": len(srows),
                     "oracle_rows": len(drows),
                     "err": "; ".join(problems) or None}
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"OK   {name} ({len(srows)} rows, {dt:.1f}s)")
            n_pass += 1
    json_path = os.environ.get("CHECK_ENTRY_JSON")
    if json_path:
        import json

        with open(json_path, "w") as f:
            json.dump(log, f, indent=1)
        print(f"log written: {json_path}")
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
