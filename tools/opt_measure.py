"""Round-12 optimization harness: isolated timing + plan capture.

Guide §1: measure first.  For each named query this tool

- times the computation with the **noop sink**
  (``df.write.format("noop").mode("overwrite").save()``) best-of-N in a
  single bench-identical session (same master/shuffle conf as bench.py),
  so iteration on one query does not pay a fresh-JVM tax per attempt;
- optionally captures ``df.explain("formatted")`` to
  ``plans/r12/<name>_<tag>.txt`` for the judge's plan-diff evidence.

The headline bench (bench.py) keeps its historical ``.count()`` timing
so cross-round numbers stay comparable; this tool exists for the
*within-round* optimization loop where §1.4's noop-sink isolation is
the right instrument.

Usage:
  python tools/opt_measure.py --queries q_a,q_b [--plans before]
      [--reps 3] [--sf-dir /root/testdata/sf0.1] [--out /tmp/t.json]
      [--action noop|count] [--warm-artifacts]

``--action count`` reproduces bench.py's historical timed action for
apples-to-apples A/B against recorded BENCH_r* baselines;
``--warm-artifacts`` replays bench.py's untimed artifact-warmup pass
first (needed when /tmp/clv_artifacts is cold).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    args = sys.argv[1:]

    def opt(name: str, default: str | None = None) -> str | None:
        return (
            args[args.index(name) + 1] if name in args else default
        )

    names = (opt("--queries") or "").split(",")
    names = [n for n in names if n]
    plan_tag = opt("--plans")
    reps = int(opt("--reps", "3"))
    sf_dir = opt("--sf-dir", "/root/testdata/sf0.1")
    out_path = opt("--out")
    action = opt("--action", "noop")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from clv_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="opt-measure",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from clv_data_pipeline_spark import registry

    queries = registry.all_queries()
    # same warmup as bench.py: codegen + parquet reader + Arrow + the
    # Python worker pool, so the first timed query is steady-state
    queries["q_rfm"](spark, "/root/testdata/sf0.001").count()
    queries["q_cosine_topk"](spark, "/root/testdata/sf0.001").count()
    if "--warm-artifacts" in args:
        import bench

        bench.warm_artifacts(spark, queries, sf_dir)

    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        opt("--plans-round", "r13"),
    )
    if plan_tag:
        os.makedirs(plans_dir, exist_ok=True)

    timings: dict[str, float] = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"opt: {name}")
        if plan_tag:
            df = fn(spark, sf_dir)
            if "--runtime" in args:
                # VERDICT r12 item 6: static explain shows the
                # AQE-INITIAL plan (isFinalPlan=false); to see what
                # actually ran (AQEShuffleRead coalescing, SMJ ->
                # broadcast conversions) the plan must be captured
                # AFTER an action on this very DataFrame (collect()
                # runs df's own QueryExecution; count() wraps it in a
                # new one and leaves this plan un-finalized).
                df.collect()
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(plans_dir, f"{name}_{plan_tag}.txt"), "w"
            ) as f:
                f.write(plan)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            if action == "count":
                df.count()
            else:
                df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
        timings[name] = round(best, 3)
        print(f"{timings[name]:8.3f}  {name}", flush=True)

    rec = {"sf_dir": sf_dir, "reps": reps, "action": action,
           "queries": timings,
           "total": round(sum(timings.values()), 3)}
    print(json.dumps(rec), flush=True)
    if out_path:
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
