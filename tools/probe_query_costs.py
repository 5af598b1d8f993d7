"""Per-query cost decomposition probe (optimization round 8).

For each named catalog entry, in ONE fresh session (pattern from
tools/probe_minhash_scale.py), time:

- t_construct: queries()[name](spark, sf) — driver-side plan building,
  including any bounded probes/collects the entry runs eagerly;
- t_exec1: first noop write (pays Catalyst + whole-stage codegen
  compile + JIT for this plan);
- t_exec2/t_exec3: repeat noop writes of a FRESH plan instance (same
  query function called again) — codegen classes are cached by source
  hash in the live JVM, so the steady-state number isolates actual
  execution + scheduling from one-time compile.

cold-vs-steady tells you WHERE to optimize (guide §1.1): a query whose
t_exec1 >> t_exec3 is plan/compile-bound (shrink the expression tree,
fewer distinct codegen stages); one whose t_exec3 stays high is
execution-bound (fewer exchanges/jobs/bytes).

Usage: python tools/probe_query_costs.py name1 name2 ... [--sf DIR]
Never run concurrently with bench.py or pytest.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.1"
    for i, a in enumerate(sys.argv):
        if a == "--sf":
            sf = sys.argv[i + 1]

    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from spark_monotasks_spark.session import get_spark

    spark = get_spark(app_name="probe-query-costs")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    from spark_monotasks_spark.queries.pipeline_queries import stage_minhash_store

    stage_minhash_store(spark, sf)

    print(f"# {'query':32s} {'constr':>7s} {'exec1':>7s} {'exec2':>7s} {'exec3':>7s}")
    for name in names:
        fn = QUERY_REGISTRY[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        t0 = time.perf_counter()
        df = fn(spark, sf)
        t1 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        execs = [t2 - t1]
        for _ in range(2):
            ta = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - ta)
        import gc

        gc.collect()
        spark._jvm.System.gc()
        print(
            f"  {name:32s} {t1 - t0:7.3f} {execs[0]:7.3f} {execs[1]:7.3f} {execs[2]:7.3f}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
