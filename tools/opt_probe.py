"""Optimization-round probe (guide §1): time ONE registered query in
isolation — fresh DataFrame lineage per run so every stage re-executes
(the scale_probe standard) — against the noop sink, which computes
every column of every row and discards the result (§1.4: toPandas adds
Arrow-collect cost that varies with result size; count() lets the
optimizer prune the query).

Usage:  python tools/opt_probe.py <query> [sf_dir] [n_runs] [--pandas]

Env:    SPARK_GRAFT_PROFILE / SPARK_GRAFT_SHUFFLE_PARTITIONS /
        SPARK_GRAFT_CPUS respected via nipd_spark.session.
        NIPD_OPT_CONF="k=v;k=v" applies extra session conf overrides
        before the session is built (measurement experiments only —
        shipped defaults live in session.py).

Prints one line per run plus min/median, and the session conf that
matters (shuffle partitions, AQE) so probe logs are self-describing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    use_pandas = "--pandas" in sys.argv
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    n_runs = int(args[2]) if len(args) > 2 else 3

    extra = os.environ.get("NIPD_OPT_CONF", "")
    overrides = dict(
        kv.split("=", 1) for kv in filter(None, extra.split(";"))
    )
    # catalog.autosize rewrites shuffle.partitions/maxPartitionBytes
    # during spec.fn at >=64MB dirs and only defers to the
    # SPARK_GRAFT_SHUFFLE_PARTITIONS env var — disable it whenever the
    # experiment touches the managed keys, or the probe would REPORT a
    # conf it did not run with (r12 ADVICE item)
    _AUTOSIZE_KEYS = {
        "spark.sql.shuffle.partitions",
        "spark.sql.files.maxPartitionBytes",
        "spark.sql.files.minPartitionNum",
        "spark.sql.files.openCostInBytes",
    }
    if _AUTOSIZE_KEYS & overrides.keys():
        os.environ.setdefault("NIPD_SPARK_AUTOSIZE", "0")

    from nipd_spark import registry
    from nipd_spark.session import get_spark

    spark = get_spark("opt-probe")
    for k, v in overrides.items():
        spark.conf.set(k, v)  # runtime confs only; static confs raise here
    spec = registry.all_specs()[name]

    def run_once() -> float:
        df = spec.fn(spark, sf_dir)  # fresh lineage
        t0 = time.time()
        if use_pandas:
            df.toPandas()
        else:
            df.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    spark.sparkContext.setJobDescription(f"opt-probe warmup {name}")
    run_once()  # warm-up: parquet footers, JIT, broadcast caches
    times = []
    for i in range(n_runs):
        spark.sparkContext.setJobDescription(f"opt-probe {name} run{i}")
        dt = run_once()
        times.append(dt)
        print(f"run{i}: {dt:.3f}s", flush=True)
    print(
        f"{name} @ {sf_dir}: min {min(times):.3f}s  "
        f"median {statistics.median(times):.3f}s  "
        f"(sink={'toPandas' if use_pandas else 'noop'}, "
        f"shuffle.partitions={spark.conf.get('spark.sql.shuffle.partitions')}, "
        f"aqe={spark.conf.get('spark.sql.adaptive.enabled')}, "
        f"maxPartitionBytes={spark.conf.get('spark.sql.files.maxPartitionBytes')})"
    )


if __name__ == "__main__":
    main()
