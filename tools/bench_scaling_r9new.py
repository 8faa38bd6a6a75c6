"""Scaling points (sf0.1 / sf0.3 / sf1.0) for the queries ADDED in
round 9 — extends BENCH_SCALING.md's study to the new twins and
graduations.  Same method as tools/bench_scaling.py: best-of-2,
clearCache between queries, replication-scaled data from
tools/gen_scale_data.py in /tmp/scaledata.

Usage: python tools/bench_scaling_r9new.py [out.json]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

QUERIES = [
    "q_pca_portable",
    "q_ann_pq_portable",
    "q_ann_ivf_portable",
    "q_semdedup_portable",
    "q_topic_anchors",
    "q_unigram_tokenize",
    "q_tokenizer_fertility",
    "q_bpe_tokenize",
    "q_min_pieces_tokenize",
    "q_self_influence",
    "q_domain_reweight",
    "q_dedup_substring_eval",
    "q_dp_histogram",
]

SF_DIRS = {
    0.1: "/root/testdata/sf0.1",
    0.3: "/tmp/scaledata/sf0.3",
    1.0: "/tmp/scaledata/sf1.0",
}


def main() -> None:
    out_path = (
        sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_R9NEW.json"
    )
    from clv_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="clv-bench-scaling-r9new",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from clv_data_pipeline_spark import registry

    queries = registry.all_queries()
    queries["q_rfm"](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict[str, float]] = {n: {} for n in QUERIES}
    for sf, sf_dir in SF_DIRS.items():
        for i, name in enumerate(QUERIES):
            best = float("inf")
            err = None
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf_dir).count()
                except Exception as e:
                    err = f"{type(e).__name__}: {str(e)[:200]}"
                    break
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            if (i + 1) % 8 == 0:
                spark.sparkContext._jvm.System.gc()
            if err:
                results[name][str(sf)] = -1.0
                print(f"sf{sf} {name}: ERROR {err}", flush=True)
            else:
                results[name][str(sf)] = round(best, 3)
                print(f"sf{sf} {name}: {best:.2f}s", flush=True)
            with open(out_path + ".partial", "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)

    def slope(n: str, a: float, b: float) -> float | None:
        ta, tb = results[n].get(str(a)), results[n].get(str(b))
        if not ta or not tb or ta <= 0 or tb <= 0:
            return None
        return round(math.log(tb / ta) / math.log(b / a), 2)

    summary = {
        n: {
            "sec": results[n],
            "slope_03_10": slope(n, 0.3, 1.0),
            "slope_01_10": slope(n, 0.1, 1.0),
        }
        for n in QUERIES
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
