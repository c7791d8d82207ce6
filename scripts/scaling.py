"""Two-cluster-size scaling run (north rule: throughput scaling
efficiency ≥ 0.8 from N to 4N parallelism).

Runs the SAME index build at two local parallelism levels in fresh JVMs
(sandbox proxy for N vs 4N executors). Because the sandbox host steals
CPU in multi-minute bursts (measured: /proc/stat steal deltas spike from
~0% to >15% and stay there for whole runs), trials are INTERLEAVED
across the two levels and each trial records its steal fraction; the
reported throughput per level is the best clean trial (min wall time).

Reports throughput at both levels plus
  efficiency = (thr_4N / thr_N) / (4N / N).

Usage: python scripts/scaling.py [n_docs] [lo] [hi] [trials] [suffix]
Defaults: 40000 docs, local[8] vs local[32], 4 interleaved trials.
``lo``/``hi`` accept either N (``local[N]`` — N threads in ONE JVM) or
``WxC`` (``local-cluster[W,C,mem]`` — W separate executor JVM processes
× C cores). ``1x2`` vs ``4x2`` is the closest sandbox analog of the
north rule's N vs 4N executors: four REAL executor processes, their own
heaps and GC, talking to a separate driver.
Results are appended to SCALING.json (the committed artifact bench.py
reports per round).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _control_agg(width: int) -> float:
    """Platform-parallelism control: aggregate numpy sort+cumsum
    passes/sec across `width` concurrent processes (same kernel bench.py
    brackets BENCH runs with). The sandbox host throttles
    memory-bandwidth-bound work well below core count — this measures
    how much parallel speedup the HOST itself offers at each width in
    the same window as the engine trials, so the engine's scaling can
    be reported against the platform's actual ceiling rather than the
    nominal core ratio."""
    from concurrent.futures import ProcessPoolExecutor

    from bench import _control_pass

    with ProcessPoolExecutor(width) as ex:
        return round(sum(ex.map(_control_pass, range(width))), 3)


def _run_worker(spec: int | str, n_docs: int, trials: int = 1) -> list[dict]:
    r = subprocess.run(
        [sys.executable, os.path.join(HERE, "scaling_worker.py"),
         str(spec), str(n_docs), str(trials)],
        capture_output=True, text=True, check=True,
    )
    return [json.loads(ln) for ln in r.stdout.splitlines() if ln.startswith("{")]


def _cores(spec: int | str) -> int:
    """Total cores of a spec: "8" → 8 threads in one JVM; "4x2" → 4
    separate executor JVMs × 2 cores = 8 (local-cluster mode)."""
    s = str(spec)
    if "x" in s:
        w, c = (int(p) for p in s.split("x"))
        return w * c
    return int(s)


def _label(spec: int | str) -> str:
    s = str(spec)
    return f"cluster[{s}]" if "x" in s else f"local[{s}]"


def run_pair(n_docs: int, lo: int | str = 8, hi: int | str = 32, trials: int = 4) -> dict:
    all_trials: dict[int | str, list[dict]] = {lo: [], hi: []}
    controls: dict[int | str, list[float]] = {lo: [], hi: []}
    ratio = _cores(hi) / _cores(lo)
    for _ in range(trials):  # interleave to decorrelate host-steal bursts
        for cpus in (lo, hi):
            # same-window platform probe bracketing each engine trial
            controls[cpus].append(_control_agg(_cores(cpus)))
            # ONE timed trial per fresh warmed JVM: repeated in-JVM trials
            # degrade nondeterministically (cache eviction + accumulated
            # JVM state — measured 2-6x inflation on second trials)
            all_trials[cpus].extend(_run_worker(cpus, n_docs, trials=1))
    best = {c: min(ts, key=lambda t: t["sec"]) for c, ts in all_trials.items()}
    eff = (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / ratio
    # Platform ceiling: how much parallel speedup the host ITSELF gives
    # from lo to hi concurrent bandwidth-bound workers (best clean window
    # per width, matching the best-trial selection). Engine efficiency is
    # also reported against min(nominal, platform) — on a host whose
    # memory bandwidth saturates below the core ratio, that ceiling (not
    # the core ratio) is what a real multi-node cluster would restore.
    plat = max(controls[hi]) / max(controls[lo]) if controls[lo] else None
    eff_vs_plat = None
    if plat:
        ceiling = min(ratio, plat)
        eff_vs_plat = round(
            (best[hi]["docs_per_sec"] / best[lo]["docs_per_sec"]) / ceiling, 3
        )
    return {
        "n_docs": n_docs,
        f"{_label(lo)}_docs_per_sec": best[lo]["docs_per_sec"],
        f"{_label(hi)}_docs_per_sec": best[hi]["docs_per_sec"],
        f"{_label(lo)}_sec": best[lo]["sec"],
        f"{_label(hi)}_sec": best[hi]["sec"],
        "scaling_efficiency": round(eff, 3),
        "platform_scaling": round(plat, 3) if plat else None,
        "efficiency_vs_platform_ceiling": eff_vs_plat,
        "trials": {
            _label(c): [
                {"sec": t["sec"], "steal_frac": t["steal_frac"]} for t in ts
            ]
            for c, ts in all_trials.items()
        },
        "platform_control_agg_passes_per_sec": {
            _label(c): controls[c] for c in (lo, hi)
        },
        # per-stage walls of each level's best trial: shows WHICH stage
        # stops scaling (analyze is ALU-bound and scales; the blocks
        # sorted-merge shuffle is the bandwidth-bound half)
        "best_trial_stages": {
            _label(c): best[c].get("stages") for c in (lo, hi)
        },
    }


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 40000
    lo = sys.argv[2] if len(sys.argv) > 2 else "8"
    hi = sys.argv[3] if len(sys.argv) > 3 else "32"
    trials = int(sys.argv[4]) if len(sys.argv) > 4 else 4
    # optional key suffix so repeated runs at the same (lo, hi) merge into
    # SCALING.json as separate records instead of overwriting
    suffix = sys.argv[5] if len(sys.argv) > 5 else ""
    result = run_pair(n, lo=lo, hi=hi, trials=trials)
    print(json.dumps(result))
    path = os.path.join(os.path.dirname(HERE), "SCALING.json")
    existing = {}
    if os.path.exists(path):
        with open(path) as f:
            existing = json.load(f)
    existing[f"{_label(lo)}_vs_{_label(hi)}{suffix}"] = result
    with open(path, "w") as f:
        json.dump(existing, f, indent=1)
