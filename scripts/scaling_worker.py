"""One scaling-run trial: build the synth-corpus index at a given
parallelism in a FRESH JVM (separate process per trial — the sandbox
proxy for N vs 4N executors) and print one JSON line per trial.

The sandbox host steals CPU in multi-minute bursts (verified via
/proc/stat deltas), so every trial also reports its measured steal
fraction — the orchestrator uses it to discard contaminated trials.

Usage: python scripts/scaling_worker.py <cpus> <n_docs> [trials]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_stat() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from /proc/stat."""
    with open("/proc/stat") as f:
        parts = f.readline().split()[1:]
    vals = [int(x) for x in parts]
    return sum(vals), vals[7] if len(vals) > 7 else 0


def main() -> None:
    cpus, n_docs = int(sys.argv[1]), int(sys.argv[2])
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from solr_spark.corpus import synth_corpus
    from solr_spark.index.build import IndexConfig, build_index
    from solr_spark.session import get_spark

    # shuffle partitions are sized by DATA, not by core count — few huge
    # partitions at low parallelism force spill-heavy sorts (measured
    # superlinear blowup at 160k docs with 2 partitions); AQE coalesces
    # any excess, so the same count works at every width
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
    spark = get_spark(f"scaling_{cpus}", master=f"local[{cpus}]", shuffle_partitions=shuffle)
    out = f"/tmp/solr_spark_scaling_{cpus}"

    # untimed warmup: two builds so JIT/codegen/Python-worker costs are
    # fully amortized before the timed window (a single small build still
    # leaves ~2x first-timed-run inflation — measured)
    for wn in (2000, 4000):
        shutil.rmtree(out, ignore_errors=True)
        build_index(spark, synth_corpus(spark, wn), out, IndexConfig(), resume=False)
    shutil.rmtree(out, ignore_errors=True)

    corpus = synth_corpus(spark, n_docs).persist()
    n = corpus.count()  # materialize datagen outside the timed window
    cfg = IndexConfig(hot_df_threshold=max(1000, n // 4), n_salts=8)
    for _ in range(trials):
        shutil.rmtree(out, ignore_errors=True)
        tot0, st0 = _cpu_stat()
        t0 = time.time()
        idx = build_index(spark, corpus, out, cfg, resume=False)
        dt = time.time() - t0
        tot1, st1 = _cpu_stat()
        steal = (st1 - st0) / max(tot1 - tot0, 1)
        stages = {s: m["wall_sec"] for s, m in idx.manifests().items()}
        print(json.dumps({
            "cpus": cpus, "docs": n, "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1), "steal_frac": round(steal, 4),
            "stages": stages,
        }), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
