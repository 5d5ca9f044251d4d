"""Benchmark harness.

Default mode: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON
line: {"metric", "value" (total seconds), "unit": "sec",
"queries": {name: sec}, "sf", plus throughput extras}.

Scaling mode (--scaling): run the same job at two parallelism levels
(default local[8] vs local[32] — the sandbox proxy for N vs 4N
executors per BASELINE.json's north rule), report throughput at both
and scaling efficiency into BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

HEADLINE = [
    "tile_assign_merc",
    "spatial_join_pip",
    "knn_sites",
    "cell_density_topk",
    "pyramid_rollup",
]


def run_bench(sf_dir: str, cores: int) -> dict:
    import __spark_entry__ as entrymod
    from gdal_spark import synth
    from gdal_spark.session import get_spark

    spark = get_spark("bench", cores=cores, shuffle_partitions=cores)
    qs = entrymod.queries()
    times: dict[str, float] = {}
    # warm the JVM + Python workers once (excluded from timings)
    qs["tile_assign_merc"](spark, sf_dir).count()
    for name in HEADLINE:
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()  # count() = full execution, no collect
        times[name] = round(time.perf_counter() - t0, 3)
    total = round(sum(times.values()), 3)
    n_img = synth.n_images(sf_dir)
    result = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": synth.sf_name(sf_dir),
        "cores": cores,
        "n_images": n_img,
        "images_per_sec": round(
            n_img / (times["tile_assign_merc"] + times["spatial_join_pip"]), 1
        ),
    }
    spark.stop()
    return result


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    if "--scaling" in sys.argv:
        lo, hi = 8, 32
        results = {}
        for c in (lo, hi):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(c), SPARK_GRAFT_SF_DIR=sf_dir)
            out = subprocess.run(
                [sys.executable, __file__], env=env, capture_output=True, text=True
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
            results[c] = json.loads(line)
        t_lo, t_hi = results[lo]["value"], results[hi]["value"]
        thr_lo = results[lo]["images_per_sec"]
        thr_hi = results[hi]["images_per_sec"]
        eff = round((t_lo / t_hi) / (hi / lo), 3)
        eff_thr = round((thr_hi / thr_lo) / (hi / lo), 3)
        md = Path(__file__).parent / "BENCH"
        md.mkdir(exist_ok=True)
        (md / "BASELINE.md").write_text(
            "# BENCH — measured throughput & scaling efficiency\n\n"
            f"Input: synthesized images table, sf={results[lo]['sf']} "
            f"(n_images={results[lo]['n_images']}); same job, same input, two "
            "parallelism levels (sandbox proxy for N vs 4N executors).\n\n"
            "| cores | headline total (s) | images/sec (assign+join) | per-query (s) |\n"
            "|---|---|---|---|\n"
            + "".join(
                f"| local[{c}] | {results[c]['value']} | {results[c]['images_per_sec']} "
                f"| {json.dumps(results[c]['queries'])} |\n"
                for c in (lo, hi)
            )
            + f"\nScaling efficiency ({lo}->{hi} cores, wall-clock basis): **{eff}**\n"
            f"\nScaling efficiency (assign+join throughput basis): **{eff_thr}**\n"
            f"\nNorth-rule target: >= 0.8.\n"
        )
        print(
            json.dumps(
                {
                    "metric": "scaling_efficiency",
                    "value": eff,
                    "unit": "ratio",
                    "lo": results[lo],
                    "hi": results[hi],
                }
            )
        )
        return

    print(json.dumps(run_bench(sf_dir, cores)))


if __name__ == "__main__":
    main()
