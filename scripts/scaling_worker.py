"""One scaling-run trial: build the synth-corpus index at a given
parallelism in a FRESH JVM (separate process per trial — the sandbox
proxy for N vs 4N executors) and print one JSON line per trial.

The sandbox host steals CPU in multi-minute bursts (verified via
/proc/stat deltas), so every trial also reports its measured steal
fraction — the orchestrator uses it to discard contaminated trials.

Usage: python scripts/scaling_worker.py <spec> <n_docs> [trials]

``spec`` is either an int N (``local[N]``, executors as threads in one
JVM) or ``WxC`` (``local-cluster[W,C,mem]`` — W SEPARATE executor JVM
processes with C cores each, total W*C cores). The WxC form is the
two-process variant VERDICT r4 asked for: it takes the single-JVM
memory-bus/GC ceiling out of the 2-to-8 scaling measurement, the
sandbox's closest analog to N vs 4N executors on a real cluster.
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
    spec, n_docs = sys.argv[1], int(sys.argv[2])
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 1

    from solr_spark.corpus import synth_corpus
    from solr_spark.index.build import IndexConfig, build_index
    from solr_spark.session import get_spark

    # shuffle partitions are sized by DATA, not by core count — few huge
    # partitions at low parallelism force spill-heavy sorts (measured
    # superlinear blowup at 160k docs with 2 partitions); AQE coalesces
    # any excess, so the same count works at every width
    shuffle = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64"))
    extra: dict[str, str] = {}
    # A/B knobs for the shuffle-bandwidth hypothesis (VERDICT r4 item 3):
    # codec trades CPU for bytes through the shared memory bus/page cache.
    codec = os.environ.get("SPARK_GRAFT_IO_CODEC")
    if codec:
        extra["spark.io.compression.codec"] = codec
        if codec == "zstd":
            extra["spark.io.compression.zstd.level"] = os.environ.get(
                "SPARK_GRAFT_ZSTD_LEVEL", "1"
            )
    if os.environ.get("SPARK_GRAFT_SHUFFLE_COMPRESS"):
        extra["spark.shuffle.compress"] = os.environ["SPARK_GRAFT_SHUFFLE_COMPRESS"]
    if "x" in spec:  # WxC → W separate executor JVMs with C cores each
        workers, cores = (int(p) for p in spec.split("x"))
        cpus = workers * cores
        mem_mb = int(os.environ.get("SPARK_GRAFT_EXEC_MEM_MB", "6144"))
        master = f"local-cluster[{workers},{cores},{mem_mb}]"
        repo = os.path.dirname(HERE := os.path.dirname(os.path.abspath(__file__)))
        extra.update({
            "spark.executor.memory": f"{mem_mb}m",
            # executor-side Python workers must import solr_spark
            "spark.executorEnv.PYTHONPATH": repo,
            # modest driver heap: the work happens in executor JVMs now
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "8g"),
        })
    else:
        cpus = int(spec)
        master = f"local[{cpus}]"
    spark = get_spark(
        f"scaling_{spec}", master=master, shuffle_partitions=shuffle, extra_conf=extra
    )
    out = f"/tmp/solr_spark_scaling_{spec}"

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
            "cpus": cpus, "master": master, "docs": n, "sec": round(dt, 3),
            "docs_per_sec": round(n / dt, 1), "steal_frac": round(steal, 4),
            "stages": stages,
        }), flush=True)
    shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
