#!/usr/bin/env python3
"""Query-series-only slice of bench.py (same warmup + median-of-3
methodology, same noop sink) for fast optimization iteration. The
official record stays bench.py."""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sample_for_transactional_datalake_using_s3tables_spark.operators import all_queries
from sample_for_transactional_datalake_using_s3tables_spark.plans import get_spark

from bench import BENCH_QUERIES  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="bench-queries")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    def _run(name: str, at: str) -> str | None:
        try:
            queries[name](spark, at).write.format("noop").mode("overwrite").save()
            return None
        except Exception as e:  # noqa: BLE001
            return f"{type(e).__name__}: {e}"[:500]

    _run("scan_limit", sf_dir)
    for wq in ("udf_minmax_scale", "cdc_pipeline", "dedup_minhash_lsh",
               "similarity_topk_lsh", "window_tumbling", "risk_analysis"):
        _run(wq, "/root/testdata/sf0.001")

    names = sys.argv[1:] or list(BENCH_QUERIES)
    N_RUNS = 3
    timings, errors = {}, {}
    for name in names:
        runs = []
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            err = _run(name, sf_dir)
            if err is not None:
                errors[name] = err
                break
            runs.append(round(time.perf_counter() - t0, 3))
        if len(runs) == N_RUNS:
            timings[name] = sorted(runs)[N_RUNS // 2]
    print(json.dumps({
        "value": round(sum(timings.values()), 3),
        "queries": timings, "errors": errors or None,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
