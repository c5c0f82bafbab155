#!/usr/bin/env python
"""Single-rule Spark job for external orchestration (SURVEY.md §3.1:
"Snakemake orchestration stays external" — /root/repo/BASELINE.json:6).

One Snakemake rule == one invocation of this script: read parquet
inputs from a stage directory, run one registered query (or an ad-hoc
SQL string) through the engine, write parquet output. Rule edges stay
disk files exactly as in the reference's pipeline shape; only the
*analysis* moved from pandas to Spark.

Usage (spark-submit on a cluster, plain python in local mode):
    python integration/spark_job.py --sf-dir /root/testdata/sf0.001 \
        --query q1_pricing_summary --out /tmp/out.parquet
    python integration/spark_job.py --sf-dir ... --sql "SELECT ..." --out ...
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True, help="directory of parquet tables")
    ap.add_argument("--query", help="registered queries() name")
    ap.add_argument("--sql", help="ad-hoc Spark SQL over the corpus views")
    ap.add_argument("--out", required=True, help="output parquet path")
    ap.add_argument("--coalesce", type=int, default=0, help="output file count")
    args = ap.parse_args()
    if bool(args.query) == bool(args.sql):
        ap.error("exactly one of --query / --sql")

    from nipd_spark import registry
    from nipd_spark.catalog import register_views
    from nipd_spark.session import get_spark

    spark = get_spark(f"nipd-job-{args.query or 'sql'}")
    if args.query:
        df = registry.all_specs()[args.query].fn(spark, args.sf_dir)
    else:
        register_views(spark, args.sf_dir)
        df = spark.sql(args.sql)
    if args.coalesce:
        df = df.coalesce(args.coalesce)
    df.write.mode("overwrite").parquet(args.out)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
