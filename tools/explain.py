"""Dump the formatted physical plan of any registered query — the dev
loop for checking pushdown/broadcast/codegen before pinning a property
in tests/test_plan_quality.py.

Usage: python tools/explain.py <query_name> [sf_dir]
       python tools/explain.py --list          # all registered names
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from nipd_spark import registry
from nipd_spark.session import get_spark


def main() -> None:
    if len(sys.argv) < 2 or sys.argv[1] == "--list":
        for name in registry.all_specs():
            print(name)
        return
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"
    spec = registry.all_specs()[name]
    spark = get_spark("explain")
    df = spec.fn(spark, sf_dir)
    print(
        df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            df._jdf.queryExecution(), "formatted"
        )
    )


if __name__ == "__main__":
    main()
