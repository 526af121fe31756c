#!/usr/bin/env python3
"""Per-stage profile of bench queries via the Spark UI REST API.

Usage: python scripts/profile_query.py <query> [query ...] [--runs N]

Runs each query to the noop sink on a UI-enabled local session and
prints, per job/stage: wall, executor run time, task count, input/
shuffle bytes. Measurement-only tooling (guide section 1/7.1).
"""
from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from sample_for_transactional_datalake_using_s3tables_spark.operators import all_queries
from sample_for_transactional_datalake_using_s3tables_spark.plans.session import (
    _builder_confs,
)


def get_spark_ui(cpus: int) -> SparkSession:
    b = (
        SparkSession.builder.appName("profile")
        .master(f"local[{cpus}]")
    )
    for k, v in _builder_confs(max(cpus, 4)).items():
        b = b.config(k, v)
    b = b.config("spark.ui.enabled", "true").config("spark.ui.port", "4099")
    return b.getOrCreate()


def rest(path: str):
    with urllib.request.urlopen(f"http://localhost:4099/api/v1/{path}") as r:
        return json.loads(r.read())


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs="):
            runs = int(a.split("=")[1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    spark = get_spark_ui(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    app_id = spark.sparkContext.applicationId

    for name in args:
        fn = queries[name]
        # warmup
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        walls = []
        for i in range(runs):
            sc = spark.sparkContext
            sc.setJobGroup(f"{name}-{i}", name)
            before_jobs = {j["jobId"] for j in rest(f"applications/{app_id}/jobs")}
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            wall = time.perf_counter() - t0
            walls.append(wall)
            if i != runs - 1:
                continue
            jobs = [
                j for j in rest(f"applications/{app_id}/jobs")
                if j["jobId"] not in before_jobs
            ]
            print(f"\n=== {name}: wall={wall:.3f}s (runs: "
                  + ", ".join(f"{w:.3f}" for w in walls) + ")")
            stage_ids = sorted(
                {s for j in jobs for s in j["stageIds"]}
            )
            njobs = len(jobs)
            print(f"    jobs={njobs} stages={len(stage_ids)}")
            for sid in stage_ids:
                try:
                    st = rest(f"applications/{app_id}/stages/{sid}")[0]
                except Exception:
                    continue
                if st["status"] == "SKIPPED":
                    continue
                dur = (st.get("completionTime") and st.get("firstTaskLaunchedTime"))
                wall_ms = 0.0
                if dur:
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    t1 = datetime.strptime(st["firstTaskLaunchedTime"], fmt)
                    t2 = datetime.strptime(st["completionTime"], fmt)
                    wall_ms = (t2 - t1).total_seconds() * 1e3
                print(
                    f"    stage {sid:>4} wall={wall_ms/1e3:6.3f}s "
                    f"exec={st['executorRunTime']/1e3:7.3f}s "
                    f"cpu={st.get('executorCpuTime',0)/1e9:7.3f}s "
                    f"tasks={st['numCompleteTasks']:>3} "
                    f"in={st['inputBytes']>>20}MB "
                    f"sr={st['shuffleReadBytes']>>20}MB "
                    f"sw={st['shuffleWriteBytes']>>20}MB  "
                    f"{st['name'][:60]}"
                )
    spark.stop()


if __name__ == "__main__":
    main()
