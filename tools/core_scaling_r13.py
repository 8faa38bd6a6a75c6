"""Core-scaling evidence for the round-12 rewrites (VERDICT r12 item
8): run the changed queries at sf3.0 (replication-scaled inputs from
tools/gen_scale_data.py) under local[32] and local[8] — fresh session
per core count, best-of-N `.count()` per query — and record the
32-core/8-core ratios in BENCH_SCALING_R13.json.  At sf0.1 the
per-query cost is job-scheduling floor + box contention (the r12
finding: the 8-core run BEAT the 32-core run), so scaling claims need
this larger point.

Usage: python tools/core_scaling_r13.py [out.json]
  (spawns itself per core count via SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

QUERIES = [
    # the r12 optimization rewrites
    "q_data_shapley", "q_cross_validation", "q_learning_curve",
    "q_word_vectors", "q_caption_align", "q_pair_curate",
    # the r13 headline rewrite
    "q_splade_retrieval",
]
SF_DIR = "/tmp/scaledata/sf3.0"
REPS = 2


def run_one(cpus: int) -> dict[str, float]:
    from clv_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name=f"core-scaling-{cpus}",
        master=f"local[{cpus}]",
        shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    from clv_data_pipeline_spark import registry

    queries = registry.all_queries()
    queries["q_rfm"](spark, "/root/testdata/sf0.001").count()
    queries["q_cosine_topk"](spark, "/root/testdata/sf0.001").count()
    out: dict[str, float] = {}
    for name in QUERIES:
        spark.sparkContext.setJobDescription(f"scaling: {name}")
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            queries[name](spark, SF_DIR).count()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        out[name] = round(best, 3)
        print(f"local[{cpus}] {out[name]:8.3f}  {name}", flush=True)
    spark.stop()
    return out


def main() -> None:
    if os.environ.get("_CORE_SCALING_CHILD"):
        cpus = int(os.environ["SPARK_GRAFT_CPUS"])
        print(json.dumps({"cpus": cpus, "queries": run_one(cpus)}))
        return
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_SCALING_R13.json",
    )
    results = {}
    for cpus in (32, 8):
        env = dict(os.environ)
        env["_CORE_SCALING_CHILD"] = "1"
        env["SPARK_GRAFT_CPUS"] = str(cpus)
        p = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=3600,
        )
        line = [
            ln for ln in p.stdout.strip().splitlines()
            if ln.startswith("{")
        ][-1]
        print(p.stdout)
        results[cpus] = json.loads(line)["queries"]
    rec = {
        "sf": 3.0,
        "sf_dir": SF_DIR,
        "reps": REPS,
        "method": "best-of-N .count(), fresh session per core count",
        "per_query": {
            n: {
                "sec_32c": results[32][n],
                "sec_8c": results[8][n],
                "speedup_8c_to_32c": round(
                    results[8][n] / results[32][n], 2
                ),
            }
            for n in QUERIES
        },
    }
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
