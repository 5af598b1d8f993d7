"""Stage-level wall/CPU attribution for one catalog entry (guide §7.1
without the UI): run the query with the Spark event log enabled, then
parse the log into per-stage rows (duration, task time, shuffle bytes,
records) sorted by task time.

Usage: python tools/instrument_query.py <name> [--sf DIR] [--reps N]
Never run concurrently with bench.py or pytest.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    name = args[0]
    sf = "/root/testdata/sf0.1"
    reps = 1
    for i, a in enumerate(args):
        if a == "--sf":
            sf = args[i + 1]
        if a == "--reps":
            reps = int(args[i + 1])

    def _blank():
        return {
            "name": "?",
            "tasks": 0,
            "dur_ms": 0,
            "task_ms": 0,
            "deser_ms": 0,
            "gc_ms": 0,
            "sh_read": 0,
            "sh_write": 0,
            "input": 0,
            "records": 0,
        }

    evdir = tempfile.mkdtemp(prefix="spark-events-")
    from spark_monotasks_spark.queries import QUERY_REGISTRY
    from spark_monotasks_spark.session import get_spark

    spark = get_spark(
        app_name=f"instrument-{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{evdir}",
            "spark.eventLog.compress": "false",
            "spark.eventLog.rolling.enabled": "false",
        },
    )
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1000).mapInPandas(lambda it: it, "id long").count()
    from spark_monotasks_spark.queries.pipeline_queries import stage_minhash_store

    stage_minhash_store(spark, sf)

    fn = QUERY_REGISTRY[name]
    spark.sparkContext.setJobDescription(f"MEASURED:{name}")
    t0 = time.perf_counter()
    for _ in range(reps):
        fn(spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    spark.sparkContext.setJobDescription(None)
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log
    path = os.path.join(evdir, app_id)
    stages = {}  # (stageId, attempt) -> info
    jobs = {}
    measured_stage_ids = set()
    with open(path) as f:
        for line in f:
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description", ""
                )
                jid = ev["Job ID"]
                sids = [s["Stage ID"] for s in ev.get("Stage Infos", [])]
                jobs[jid] = {
                    "desc": desc,
                    "stages": sids,
                    "t0": ev.get("Submission Time", 0),
                }
                if desc.startswith("MEASURED:"):
                    measured_stage_ids.update(sids)
            elif e == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                key = si["Stage ID"]
                sub = si.get("Submission Time")
                comp = si.get("Completion Time")
                info = stages.setdefault(key, _blank())
                scopes = []
                for ri in si.get("RDD Info", []):
                    sc = ri.get("Scope")
                    if sc:
                        try:
                            nm = json.loads(sc).get("name", "")
                        except Exception:
                            nm = ""
                        if nm and nm not in scopes:
                            scopes.append(nm)
                info["name"] = ",".join(scopes[:6])[:90] or si.get(
                    "Stage Name", ""
                )[:60]
                info["tasks"] = si.get("Number of Tasks", 0)
                info["dur_ms"] = (comp - sub) if sub and comp else 0
            elif e == "SparkListenerTaskEnd":
                sid = ev["Stage ID"]
                tm = ev.get("Task Metrics") or {}
                info = stages.setdefault(sid, _blank())
                info["task_ms"] += tm.get("Executor Run Time", 0)
                info["deser_ms"] += tm.get("Executor Deserialize Time", 0)
                info["gc_ms"] += tm.get("JVM GC Time", 0)
                srm = tm.get("Shuffle Read Metrics") or {}
                swm = tm.get("Shuffle Write Metrics") or {}
                im = tm.get("Input Metrics") or {}
                info["sh_read"] += srm.get("Remote Bytes Read", 0) + srm.get(
                    "Local Bytes Read", 0
                )
                info["sh_write"] += swm.get("Shuffle Bytes Written", 0)
                info["input"] += im.get("Bytes Read", 0)
                info["records"] += (tm.get("Output Metrics") or {}).get(
                    "Records Written", 0
                ) + im.get("Records Read", 0)

    mj = [j for j in jobs.values() if j["desc"].startswith("MEASURED:")]
    print(f"\n=== {name}: wall {wall:.3f}s over {reps} rep(s), "
          f"{len(mj)} measured jobs ===")
    print(f"{'stage':>6} {'dur_s':>7} {'tasksum_s':>9} {'deser_s':>7} "
          f"{'gc_s':>5} {'tasks':>5} {'shR_MB':>7} {'shW_MB':>7} "
          f"{'in_MB':>6}  name")
    total_dur = 0.0
    for sid in sorted(measured_stage_ids):
        s = stages.get(sid)
        if not s:
            continue
        total_dur += s["dur_ms"] / 1e3
        print(
            f"{sid:>6} {s['dur_ms'] / 1e3:>7.3f} {s['task_ms'] / 1e3:>9.3f} "
            f"{s['deser_ms'] / 1e3:>7.3f} {s['gc_ms'] / 1e3:>5.2f} "
            f"{s['tasks']:>5} {s['sh_read'] / 1e6:>7.2f} "
            f"{s['sh_write'] / 1e6:>7.2f} {s['input'] / 1e6:>6.2f}  {s['name']}"
        )
    print(f"# sum of measured stage durations: {total_dur:.3f}s "
          f"(gaps to wall = driver/planning/scheduling)")
    njobs = len(mj)
    jdur = sum((j.get("t1", 0) - j.get("t0", 0)) for j in mj) / 1e3
    print(f"# measured jobs: {njobs}, sum of job durations: {jdur:.3f}s")


if __name__ == "__main__":
    main()
