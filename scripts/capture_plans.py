#!/usr/bin/env python3
"""Capture .explain("formatted") for bench queries into plans/<round>/.

Usage: python scripts/capture_plans.py <suffix> [query ...]
Writes plans/$SPARK_GRAFT_PLANS_ROUND/<query>_<suffix>.txt for each
query (default round r14, default queries: the bench series).
Plan-only -- nothing is executed.
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sample_for_transactional_datalake_using_s3tables_spark.operators import all_queries
from sample_for_transactional_datalake_using_s3tables_spark.plans import get_spark

BENCH_QUERIES = (
    "risk_analysis", "hourly_pattern", "pricing_summary", "revenue_by_region",
    "shipping_priority", "forecast_revenue", "supplier_volume", "join_left",
    "window_rank", "topk", "count_distinct", "cdc_pipeline",
    "dedup_minhash_lsh", "similarity_topk_lsh", "text_token_stats",
    "window_tumbling", "window_session", "udf_minmax_scale", "asof_join",
    "range_join",
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out_dir = os.path.join(
        here, "plans", os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r14")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            print(f"wrote {path}")
        except Exception as e:  # noqa: BLE001
            print(f"# {name}: {type(e).__name__}: {e}"[:300], file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
