"""Scale probe: run representative queries at sf0.1 and at the 16x
key-shifted replica (tools/gen_scale.py), under the 'scale' profile
(AQE on, shuffle ceiling 2000 → coalesced by advisory size), and report
warm time ratios. Ideal is ≤ ~16x time for 16x data (linear); shuffles
and O(n²)-risk operators are the ones to watch.

Usage: SPARK_GRAFT_PROFILE=scale python tools/scale_probe.py [scaled_dir]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from nipd_spark import registry
from nipd_spark.session import get_spark

PROBE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q13_customer_distribution",
    "o4_pergroup_topk",
    "t1_tumbling_hourly",
    "l6_token_tf",
    "l7_tfidf",
    "j8_range_join",
    "j9_asof_join",
    "a1b_salted_agg",
    "l2_hash_dedup",
    "l3b_minhash_lsh",
    "l16_dedup_clusters",
    "l4_knn_bruteforce",
    "l5b_ann_ivf",
    "l18_kmeans",
    "l19_decontaminate",
    "l20_text_clean",
    "l21_stratified_sample",
    "l22_unigram_logprob",
    "q11_important_stock",
    "q21_suppliers_waiting",
    "s6d_dynamic_prune",
    "d9_pandas_api",
    "l23_repetition_filter",
    "l24_pii_redact",
    "l25_pack_sequences",
    "l16b_canonical_rep",
]


def timed(fn, spark, sf_dir: str, warm: int = 2) -> tuple[float, int]:
    df = fn(spark, sf_dir)
    n = 0
    runs = []
    for _ in range(1 + warm):
        t0 = time.time()
        n = df.count()
        runs.append(time.time() - t0)
    return min(runs[1:]), n


def main() -> None:
    scaled = sys.argv[1] if len(sys.argv) > 1 else "/tmp/nipd_scale16"
    spark = get_spark("scale-probe")
    specs = registry.all_specs()
    out = {}
    for name in PROBE:
        fn = specs[name].fn
        t_small, n_small = timed(fn, spark, "/root/testdata/sf0.1")
        t_big, n_big = timed(fn, spark, scaled)
        ratio = t_big / t_small if t_small > 0 else float("nan")
        out[name] = {
            "sf0.1_s": round(t_small, 3),
            "x16_s": round(t_big, 3),
            "time_ratio": round(ratio, 1),
            "rows_out": [n_small, n_big],
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"probe": out}))


if __name__ == "__main__":
    main()
