"""Run any registered query by name from the command line.

Usage:
  python tools/run_query.py <query_name> [--sf DIR] [--explain] [--oracle] [-n ROWS]
  python tools/run_query.py --list [prefix]

Examples:
  python tools/run_query.py q1_pricing_summary
  python tools/run_query.py g2_pagerank --sf /root/testdata/sf0.01 --explain
  python tools/run_query.py l3b_minhash_lsh --oracle     # diff vs DuckDB twin
  python tools/run_query.py --list l                     # all l* queries
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nipd_spark import registry


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="query name (see --list)")
    ap.add_argument("--sf", default="/root/testdata/sf0.001", help="corpus dir")
    ap.add_argument("--explain", action="store_true", help="print formatted plan")
    ap.add_argument(
        "--oracle", action="store_true", help="also run the DuckDB twin and diff"
    )
    ap.add_argument("-n", type=int, default=20, help="rows to show (default 20)")
    ap.add_argument("--list", dest="list_prefix", nargs="?", const="", default=None)
    args = ap.parse_args()

    specs = registry.all_specs()
    if args.list_prefix is not None:
        for name in sorted(specs):
            if name.startswith(args.list_prefix):
                s = specs[name]
                kind = "oracle" if s.sql else "rows-only"
                print(f"{name:32s} [{kind:9s}] {(s.doc or '').strip().splitlines()[0] if s.doc else ''}")
        return 0
    if not args.name or args.name not in specs:
        near = [n for n in sorted(specs) if args.name and n.startswith(args.name[:3])]
        print(f"unknown query {args.name!r}; near matches: {near[:8]}")
        return 2

    from nipd_spark.session import get_spark

    spark = get_spark("run-query")
    spec = specs[args.name]
    t0 = time.time()
    df = spec.fn(spark, args.sf)
    t_build = time.time() - t0
    if args.explain:
        print(
            df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted"
            )
        )
    t0 = time.time()
    pdf = df.toPandas()
    t_exec = time.time() - t0
    print(pdf.head(args.n).to_string())
    print(
        f"-- {len(pdf)} rows | build {t_build:.3f}s exec {t_exec:.3f}s | sf={args.sf}"
    )
    if args.oracle:
        if spec.sql is None:
            print("-- rows-only query: no DuckDB twin registered")
        else:
            from nipd_spark.testing import compare_spec, make_duck

            ok, detail = compare_spec(spark, make_duck(args.sf), spec, args.sf)
            print(f"-- oracle: {'PASS' if ok else 'FAIL'} ({detail})")
            return 0 if ok else 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
