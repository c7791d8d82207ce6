"""Package ``solr_spark`` into ``dist/solr_spark.zip`` for
``spark-submit --py-files`` (the north-rule deployment form).

Usage::

    python scripts/package_pyfiles.py
    spark-submit --py-files dist/solr_spark.zip scripts/submit_build.py \
        <input_parquet> <index_dir>
"""

from __future__ import annotations

import os
import zipfile

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> str:
    dist = os.path.join(ROOT, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "solr_spark.zip")
    pkg = os.path.join(ROOT, "solr_spark")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, ROOT))
    print(out)
    return out


if __name__ == "__main__":
    main()
