"""Measure sec-vs-sf scaling exponents for the most expensive queries.

VERDICT r8 item 3: the 100-TB story needs measured points above sf0.1.
Runs each query at sf0.1 (driver testdata), sf0.3, sf1.0 (replication-
scaled by tools/gen_scale_data.py into /tmp/scaledata), best-of-2 per
point, and writes BENCH_SCALING.json with per-query timings and the
log-log slope of each segment.  A slope of 1.0 is linear scaling; the
fixed ~0.3-0.6 s of per-query scheduler overhead at local[32] biases
small-point slopes DOWN, so the 0.3->1.0 segment is the honest one.

Usage: python tools/bench_scaling.py [out.json]
       python tools/bench_scaling.py out.json \\
           --queries q_a,q_b --sfs 1.0:/dir1,3.0:/dir2

The second form runs a focused octave (VERDICT r9 item 7: one more
measured point for the steepest queries — sf1.0 -> sf3.0 via
`python tools/gen_scale_data.py 30 /tmp/scaledata/sf3.0`); slopes are
reported for every adjacent SF pair present.
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
    # top-15 most expensive at sf0.1 (BENCH_LOCAL_r08)
    "q_stream_dedup_substring", "q_dbscan", "q_cross_validation",
    "q_als_eval", "q_learning_curve", "q_hits", "q_ridge",
    "q_scd2_stream", "q_stream_mix", "q_item_cf_incremental",
    "q_adaboost_stumps", "q_ann_lsh_portable", "q_word_vectors",
    "q_semdedup_eval", "q_conformal",
    # VERDICT watchlist + flagship
    "q_semdedup", "q_rfm", "q_minhash_dedup", "q_tpch_q9_derived",
]

SF_DIRS = {
    0.1: "/root/testdata/sf0.1",
    0.3: "/tmp/scaledata/sf0.3",
    1.0: "/tmp/scaledata/sf1.0",
}


def main() -> None:
    args = sys.argv[1:]
    out_path = args[0] if args and not args[0].startswith("--") else "BENCH_SCALING.json"
    queries_sel = list(QUERIES)
    sf_dirs = dict(SF_DIRS)
    if "--queries" in args:
        queries_sel = args[args.index("--queries") + 1].split(",")
    if "--sfs" in args:
        sf_dirs = {
            float(p.split(":", 1)[0]): p.split(":", 1)[1]
            for p in args[args.index("--sfs") + 1].split(",")
        }
    from clv_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="clv-bench-scaling",
        master="local[32]",
        shuffle_partitions=32,
        extra_conf={
            "spark.ui.enabled": "false",
            # sf1.0 is 10x the bench SF; the 1g local default heap
            # OOMs in q_als_eval's factor joins — size like a real
            # driver+executor container would be
            "spark.driver.memory": "48g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    from clv_data_pipeline_spark import registry

    queries = registry.all_queries()
    queries["q_rfm"](spark, "/root/testdata/sf0.001").count()
    queries["q_minhash_dedup"](spark, "/root/testdata/sf0.001").count()

    results: dict[str, dict[str, float]] = {n: {} for n in queries_sel}
    for sf, sf_dir in sorted(sf_dirs.items()):
        for i, name in enumerate(queries_sel):
            best = float("inf")
            err = None
            for _ in range(2):
                t0 = time.perf_counter()
                try:
                    queries[name](spark, sf_dir).count()
                except Exception as e:  # record, keep measuring others
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
            # checkpoint partial results — a crash keeps the points
            with open(out_path + ".partial", "w") as f:
                json.dump(results, f, indent=1, sort_keys=True)

    def slope(n: str, a: float, b: float) -> float | None:
        ta, tb = results[n].get(str(a)), results[n].get(str(b))
        if not ta or not tb or ta <= 0 or tb <= 0:
            return None
        return round(math.log(tb / ta) / math.log(b / a), 2)

    sfs = sorted(sf_dirs)

    def _tag(a: float, b: float) -> str:
        return f"slope_{str(a).replace('.', '')}_{str(b).replace('.', '')}"

    # Adjacent-SF slopes plus the full-range endpoints slope — ADVICE
    # r10: cross-round consumers key on the endpoints series (e.g.
    # slope_01_10), which the adjacent-only schema silently dropped.
    summary = {
        n: dict(
            sec=results[n],
            **{_tag(a, b): slope(n, a, b) for a, b in zip(sfs, sfs[1:])},
            **(
                {_tag(sfs[0], sfs[-1]): slope(n, sfs[0], sfs[-1])}
                if len(sfs) > 2
                else {}
            ),
        )
        for n in queries_sel
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(json.dumps({"written": out_path}))


if __name__ == "__main__":
    main()
