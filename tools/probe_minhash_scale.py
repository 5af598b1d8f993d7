"""Round-8 instrumentation for the incremental_minhash_scale median
mystery (r7 verdict ask #1): per-rep COLD vs WARM wall times in fresh
sessions, matching bench.py's methodology exactly (same warmup, same
staging, same noop sink), plus a stage decomposition inside one
session.  Writes JSON to stdout."""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("PROBE_REPS", "3"))


def one_rep(rep: int) -> dict:
    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from spark_monotasks_spark.queries.pipeline_queries import stage_minhash_store
    from spark_monotasks_spark.session import get_spark

    spark = get_spark(app_name=f"probe-rep{rep}")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    t0 = time.perf_counter()
    stage_minhash_store(spark, SF_DIR)
    stage_s = round(time.perf_counter() - t0, 3)

    fn = QUERY_REGISTRY["incremental_minhash_scale"]
    times = []
    for k in range(3):  # cold + 2 warm, same session
        start = time.perf_counter()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        times.append(round(time.perf_counter() - start, 3))
        gc.collect()
        spark._jvm.System.gc()
    spark.stop()
    return {"rep": rep, "stage": stage_s, "cold": times[0], "warm": times[1:]}


def main() -> None:
    out = [one_rep(r) for r in range(REPS)]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
