"""One-shot scaling protocol -> BENCH/BASELINE.md (BASELINE.md §protocol).

Measures, on the deterministic 128x100000 corpus (14.6M ticks, 2 hot sources):
  1. host CPU ceiling: identical pure-python work at 1/2/8/32 concurrent
     processes (what the single box can actually deliver from 4x cores)
  2. the feature+label pipeline at local[2] / local[8] / local[32]
     (2 measured runs per level in fresh warmed JVMs, min taken)
  3. scaling efficiencies for both N-vs-4N pairs, raw and normalized by the
     measured host ceiling.

Run: python BENCH/run_scaling.py
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _burn(n):
    x = 0
    for i in range(n):
        x += i * i
    return x


def cpu_ceiling() -> dict[int, float]:
    """Wall time for W concurrent copies of fixed work, per W."""
    out = {}
    for w in (1, 2, 8, 32):
        best = 1e9
        for _ in range(3):
            with mp.Pool(w) as p:
                t0 = time.time()
                p.map(_burn, [20_000_000] * w)
                best = min(best, time.time() - t0)
        out[w] = round(best, 2)
    return out


def main() -> None:
    import bench
    spec = sys.argv[1] if len(sys.argv) > 1 else "256x100000"
    corpus = bench._ensure_corpus(spec)

    ceil = cpu_ceiling()
    print("cpu ceiling:", ceil, flush=True)

    results: dict[int, dict] = {}
    for cores in (2, 8, 32):
        best, rows = bench.bench_features_subprocess_trials(cores, corpus, trials=4)
        print(f"local[{cores}] best-of-4: {best:.1f}s", flush=True)
        results[cores] = {"best_sec": round(best, 1),
                          "rows": rows,
                          "rows_per_sec": round(rows / best, 1)}

    def eff(lo, hi):
        return round((results[hi]["rows_per_sec"] / results[lo]["rows_per_sec"])
                     / (hi / lo), 3)

    # host-available speedup for the same 4x concurrency step (ideal = 4.0)
    host_ratio_2_8 = round(ceil[2] / ceil[8] * 4, 2)
    host_ratio_8_32 = round(ceil[8] / ceil[32] * 4, 2)

    summary = {
        "corpus": f"{spec} ticks/source (+2 hot sources at 10x), seed=42",
        "rows": results[32]["rows"],
        "levels": results,
        "efficiency_2_to_8": eff(2, 8),
        "efficiency_8_to_32": eff(8, 32),
        "host_cpu_ceiling_wall_sec": ceil,
        "host_available_speedup_2_to_8_of_4x": host_ratio_2_8,
        "host_available_speedup_8_to_32_of_4x": host_ratio_8_32,
        "normalized_efficiency_8_to_32": round(
            eff(8, 32) * 4 / max(host_ratio_8_32, 0.01), 3),
    }
    print(json.dumps(summary), flush=True)
    with open(os.path.join(ROOT, "BENCH", "scaling_results.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
