"""Bench harness (SURVEY.md §6): headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing discipline per BASELINE.md: one shared warm session (JVM startup
excluded). TWO execution metrics per tier, so neither story hides the
other:
  - "queries"/"value" — best warm re-execution of the PREPARED plan
    (same DataFrame object). Spark reuses completed shuffle map stages
    across runs, so this is the latency floor of a prepared,
    partially-materialized plan — the recurring cost where plans are
    built once and re-run;
  - "fresh_queries"/"fresh_value" — a FRESH DataFrame per run (new
    lineage, every stage re-executes; tools/scale_probe.py's standard),
    action-only timing. This is the full-work number comparable to
    DuckDB's warm re-execution, which always re-runs its operators.
Plan construction cost (Python → JVM analysis round-trips, paid once
per query shape) is reported separately as plan_build_total_sec; the
DuckDB equivalent (SQL parse) is sub-ms and inside its numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nipd_spark import registry
from nipd_spark.session import get_spark

# registry name -> short bench key (mirrors BASELINE.md rows)
HEADLINE = [
    ("q1_pricing_summary", "q1"),
    ("q3_shipping_priority", "q3"),
    ("q5_local_supplier", "q5"),
    ("o4_pergroup_topk", "topk_window"),
    ("t1_tumbling_hourly", "events_hourly"),
    ("l6_token_tf", "token_tf"),
    ("l4_knn_bruteforce", "knn_cosine"),
]


TIER16_DIR = "/tmp/nipd_scale16"
TIER100_DIR = "/tmp/nipd_scale100"
TIER16_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _ensure_scale(n: int, out_dir: str, timeout: int) -> str | None:
    """Materialize the n× key-shifted replica of sf0.1 (reused across
    runs; 16× ≈ 280 MB / ~1 min, 100× ≈ 1.8 GB / ~6 min one-off). None
    on any failure — scale tiers are additive, never allowed to sink
    the headline run."""
    import subprocess

    if all(
        os.path.exists(f"{out_dir}/{t}.parquet") for t in TIER16_TABLES
    ):
        return out_dir
    try:
        subprocess.run(
            [
                sys.executable,
                os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "tools",
                    "gen_scale.py",
                ),
                str(n),
                out_dir,
            ],
            check=True,
            capture_output=True,
            timeout=timeout,
        )
        return out_dir
    except Exception:
        return None


def _ensure_scale16() -> str | None:
    return _ensure_scale(16, TIER16_DIR, 600)


# 16× exclusions: l4 is the exact O(n²) GEMM correctness ANCHOR — its
# cost is quadratic by definition (32k² = 1B pair dot products at 16×,
# and its DuckDB twin is far worse), and its scale path is the IVF/LSH
# candidate-set tier (CLAUDE.md; SCALE.md). Benching the anchor at 16×
# would measure the quadratic wall both repos deliberately route
# around, not engine efficiency.
TIER16_SKIP = {"knn_cosine"}


def _bench_specs(spark, specs, sf_dir, n_runs, skip=frozenset()):
    """Best-warm execution per headline query (1 cold + n_runs-1 warm).

    NOTE on what this measures: re-executing the SAME DataFrame object
    lets Spark reuse completed shuffle map stages, so warm runs time
    the post-shuffle stages + result collection — the latency floor of
    a prepared, partially-materialized plan. The full-work numbers
    (fresh lineage per run, every stage re-executed — the
    tools/scale_probe.py standard) are reported alongside in the
    "fresh" sections so neither story hides the other."""
    timings: dict[str, float] = {}
    build = 0.0
    for name, key in HEADLINE:
        spec = specs.get(name)
        if spec is None or key in skip:
            continue
        t0 = time.time()
        df = spec.fn(spark, sf_dir)  # prepared plan, built once
        build += time.time() - t0
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            df.toPandas()
            runs.append(time.time() - t0)
        timings[key] = round(min(runs[1:]), 4)
    return timings, build


def _bench_specs_fresh(spark, specs, sf_dir, n_runs, skip=frozenset()):
    """Full-work execution: a FRESH DataFrame per run (new RDD lineage,
    so no shuffle-stage reuse — every stage re-executes, comparable to
    DuckDB's warm re-execution), timing the action only (plan
    construction is Python->JVM analysis chatter, reported once via
    plan_build_total_sec)."""
    timings: dict[str, float] = {}
    for name, key in HEADLINE:
        spec = specs.get(name)
        if spec is None or key in skip:
            continue
        spec.fn(spark, sf_dir).toPandas()  # warm-up: footers, JIT
        runs = []
        for _ in range(n_runs):
            df = spec.fn(spark, sf_dir)
            t0 = time.time()
            df.toPandas()
            runs.append(time.time() - t0)
        timings[key] = round(min(runs), 4)
    return timings


def _bench_specs_fresh_noop(spark, specs, sf_dir, n_runs, skip=frozenset()):
    """Compute-only twin of the fresh metric (r12 optimization round,
    guide §1.4): same fresh lineage per run, but the action is the noop
    sink — every column of every row is computed and discarded, so the
    number excludes Arrow collection of the result set. Added because
    o4's 100× fresh number proved to be ~70% driver-side collection of
    its 4.5M-row result (noisy ±2×), which buried the engine's actual
    compute scaling. ADDITIVE metric: the existing queries/fresh_queries
    keys keep their exact methodology."""
    timings: dict[str, float] = {}
    for name, key in HEADLINE:
        spec = specs.get(name)
        if spec is None or key in skip:
            continue
        # warm-up (r13, mirrors _bench_specs_fresh): footers/JIT/broadcast
        # caches — without it a standalone or reordered call folds
        # cold-start into the min-of-n number
        spec.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(n_runs):
            df = spec.fn(spark, sf_dir)
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[key] = round(min(runs), 4)
    return timings


def _bench_duck(specs, sf_dir, n_runs, skip=frozenset()):
    """DuckDB oracle twins on the same parquet dir — the warm-best
    baseline methodology of BASELINE.md, re-measured at this tier so
    the ratio is work-vs-work, not Spark's ~0.04 s local-mode action
    floor vs sub-ms DuckDB dispatch."""
    from nipd_spark.testing import make_duck

    con = make_duck(sf_dir)
    timings: dict[str, float] = {}
    for name, key in HEADLINE:
        spec = specs.get(name)
        if spec is None or not spec.sql or key in skip:
            continue
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            con.execute(spec.sql).fetch_arrow_table()
            runs.append(time.time() - t0)
        timings[key] = round(min(runs[1:]), 4)
    return timings


def _calibrate(spark) -> dict[str, float]:
    """Host-variance normalizers (r11 VERDICT item 4 — three headline
    rises in a row were indistinguishable from host drift):

      - noop_floor_sec: best toPandas() of a trivial 3,600-row
        1-partition frame (events_hourly's result size; the compute is
        ~µs of xxhash64) — the fixed per-action cost (job submit +
        1-task schedule + Arrow collect). Any warm per-query number is
        bounded below by this; events_hourly's 2.2x-of-DuckDB r11
        driver reading is graded against it (measured: the floor ≈
        the whole events_hourly warm number).
      - calib_jvm_sec: a fixed pure-JVM aggregate over spark.range
        (64M xxhash64 sums, 32 splits, fresh lineage per run) — zero
        repo code, zero IO, so round-over-round movement here is the
        HOST, not the engine.
      - calib_duckdb_sec: the DuckDB twin of the same hash-sum loop,
        normalizing the baseline side identically.
    """
    from pyspark.sql import functions as F

    floor_df = spark.range(0, 3600, 1, 1).select(
        F.col("id"), F.xxhash64("id").alias("h")
    )
    floor_runs = []
    for _ in range(10):
        t0 = time.time()
        floor_df.toPandas()
        floor_runs.append(time.time() - t0)
    jvm_runs = []
    for _ in range(6):
        df = spark.range(0, 64_000_000, 1, 32).select(
            # pmod keeps the ANSI sum far from long overflow
            F.sum(F.pmod(F.xxhash64("id"), F.lit(1000))).alias("s")
        )
        t0 = time.time()
        df.toPandas()
        jvm_runs.append(time.time() - t0)
    import duckdb

    con = duckdb.connect()
    duck_runs = []
    for _ in range(4):
        t0 = time.time()
        con.execute(
            "SELECT sum(hash(r) % 1000) FROM range(64000000) t(r)"
        ).fetch_arrow_table()
        duck_runs.append(time.time() - t0)
    return {
        "noop_floor_sec": round(min(floor_runs[1:]), 4),
        "calib_jvm_sec": round(min(jvm_runs[1:]), 4),
        "calib_duckdb_sec": round(min(duck_runs[1:]), 4),
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("nipd-bench")
    specs = registry.all_specs()
    calib = _calibrate(spark)
    timings, build_total = _bench_specs(spark, specs, sf_dir, n_runs=8)
    fresh = _bench_specs_fresh(spark, specs, sf_dir, n_runs=2)
    # compute-only split at the HEADLINE sf too (r13, VERDICT r12 item 2):
    # the warm per-query values sit at/below the measured noop_floor_sec,
    # so the longitudinal regression/scaling flags computed on them read
    # collection latency, not the engine. fresh_noop is the floor-proof
    # twin. ADDITIVE key — queries/fresh_queries keep their methodology.
    fresh_noop = _bench_specs_fresh_noop(spark, specs, sf_dir, n_runs=3)
    out = {
        "metric": "headline_warm_total",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "plan_build_total_sec": round(build_total, 4),
        # full-work twin of the headline: fresh lineage per run, no
        # shuffle-stage reuse — the scale_probe standard, so the
        # prepared-plan floor above and the every-stage cost are BOTH
        # on the record (the 16x/100x tiers carry the same pair)
        "fresh_value": round(sum(fresh.values()), 4),
        "fresh_queries": fresh,
        "fresh_noop_value": round(sum(fresh_noop.values()), 4),
        "fresh_noop_queries": fresh_noop,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # host-drift attribution: fixed workloads with zero repo code
        # (see _calibrate) — compare these across BENCH_r{N}.json before
        # reading a headline delta as an engine change
        **calib,
    }
    # Floor-bound declaration (r13): a warm per-query value within 2x of
    # the measured per-action floor times job submit + Arrow collect, not
    # the plan — round-over-round deltas and core-scaling ratios on those
    # entries are NOT engine signals; use fresh_noop_queries instead.
    out["warm_floor_bound_queries"] = sorted(
        k for k, v in timings.items() if v <= 2 * calib["noop_floor_sec"]
    )
    # 16× tier (VERDICT r8 item 6): at sf0.1 several headline queries
    # are floor-bound — Spark's fixed per-action cost (~0.04 s on this
    # host) dwarfs ~6 ms of work, so their ratio measures scheduling
    # constants that amortize at any real scale. 16× makes work
    # dominate; DuckDB twins re-measured on the same replica.
    if os.environ.get("NIPD_BENCH_TIER16", "1") != "0":
        t16 = _ensure_scale16()
        if t16 is not None:
            try:
                q16, _ = _bench_specs(spark, specs, t16, n_runs=4, skip=TIER16_SKIP)
                f16 = _bench_specs_fresh(spark, specs, t16, n_runs=2, skip=TIER16_SKIP)
                fn16 = _bench_specs_fresh_noop(
                    spark, specs, t16, n_runs=2, skip=TIER16_SKIP
                )
                d16 = _bench_duck(specs, t16, n_runs=4, skip=TIER16_SKIP)
                out["tier16x"] = {
                    "sf_dir": t16,
                    "copies_of_sf0.1": 16,
                    "value": round(sum(q16.values()), 4),
                    "queries": q16,
                    "fresh_value": round(sum(f16.values()), 4),
                    "fresh_queries": f16,
                    "fresh_noop_value": round(sum(fn16.values()), 4),
                    "fresh_noop_queries": fn16,
                    "skipped": sorted(TIER16_SKIP),
                    "duckdb_value": round(sum(d16.values()), 4),
                    "duckdb_queries": d16,
                }
            except Exception as e:  # additive tier: never sink headline
                out["tier16x_error"] = str(e).splitlines()[0][:200]
    # 100× tier (VERDICT r9 item 3): the linear-path headline queries
    # on a 100-copies replica (~sf10: 600M lineitem rows, 1.2M events/
    # hour-bucket span), DuckDB twins re-measured there. At this tier
    # the single-threaded-ingest portions of DuckDB's plans dominate
    # (topk_window's twin was already 1.9 s at 16×) — the twin stops
    # being a meaningful single-node baseline and becomes a
    # documentation row: the ratio quantifies exactly when the
    # distributed plan's constant factors amortize. knn excluded as at
    # 16× (quadratic anchor).
    if os.environ.get("NIPD_BENCH_TIER100", "1") != "0":
        t100 = _ensure_scale(100, TIER100_DIR, 1200)
        if t100 is not None:
            try:
                q100, _ = _bench_specs(
                    spark, specs, t100, n_runs=3, skip=TIER16_SKIP
                )
                f100 = _bench_specs_fresh(
                    spark, specs, t100, n_runs=2, skip=TIER16_SKIP
                )
                fn100 = _bench_specs_fresh_noop(
                    spark, specs, t100, n_runs=2, skip=TIER16_SKIP
                )
                d100 = _bench_duck(specs, t100, n_runs=2, skip=TIER16_SKIP)
                out["tier100x"] = {
                    "sf_dir": t100,
                    "copies_of_sf0.1": 100,
                    "value": round(sum(q100.values()), 4),
                    "queries": q100,
                    "fresh_value": round(sum(f100.values()), 4),
                    "fresh_queries": f100,
                    "fresh_noop_value": round(sum(fn100.values()), 4),
                    "fresh_noop_queries": fn100,
                    "skipped": sorted(TIER16_SKIP),
                    "duckdb_value": round(sum(d100.values()), 4),
                    "duckdb_queries": d100,
                    "note": (
                        "DuckDB twin re-measured at 100x for scaling "
                        "documentation; single-node warm-best stops "
                        "being a like-for-like baseline at this tier"
                    ),
                }
            except Exception as e:  # additive tier: never sink headline
                out["tier100x_error"] = str(e).splitlines()[0][:200]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
