"""Incremental-consumer scaling demonstration: as a table accumulates
batches, the per-batch cost of the three downstream maintainers — the CDC
merge itself, the delta-maintained aggregate (plans/mv), and the SCD2
history fold (plans/scd) — must track the BATCH size, not the accumulated
table/history size. This is the property that makes them viable at 10^10
events: the fold reads the manifest-pruned changelog / bucket-pruned open
rows, never the whole table.

Usage: python BENCH/incremental_demo.py [--events-per-batch N] [--batches K]
Prints one JSON line with per-batch wall times for each consumer.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events-per-batch", type=int, default=1_000_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--cores", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_ingestor_py_spark.plans.mv import IncrementalAggregate
    from data_ingestor_py_spark.plans.scd import (
        create_history_table,
        read_history,
        scd2_apply,
    )
    from data_ingestor_py_spark.plans.target import TargetTable
    from data_ingestor_py_spark.session import get_spark
    from data_ingestor_py_spark.sources import change_events

    spark = get_spark("incremental-demo", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else tempfile.gettempdir()
    roots = {
        n: os.path.join(base, f"incdemo-{n}")
        for n in ("src", "mv", "scd", "dim", "jv", "topk")
    }
    for r in roots.values():
        shutil.rmtree(r, ignore_errors=True)

    n, k = args.events_per_batch, args.batches
    total = n * k
    src = TargetTable.create(
        spark, roots["src"], key_cols=["repo", "path"],
        columns=[("lang", "string"), ("content", "string")], num_buckets=32,
    )
    mv = IncrementalAggregate.create(
        spark, roots["mv"], src, group_cols=["lang"], sum_cols=[("sum_seq", "_seq")]
    )
    hist = create_history_table(
        spark, roots["scd"], ["repo", "path"],
        [("lang", "string"), ("content", "string")], num_buckets=32,
    )
    ev = change_events(
        spark, total, n_repos=500, paths_per_repo=200, seed=7
    ).select("repo", "path", "lang", "content", "_seq", "_op", "_ts")

    # join view: fact enriched with a repo-keyed dim; ~1/50th of the dim
    # churns per batch, so the changed-key path re-enriches only those
    # repos' rows — per-batch cost must stay flat as the fact grows
    from data_ingestor_py_spark.plans.join_mv import IncrementalJoin

    dim = TargetTable.create(
        spark, roots["dim"], key_cols=["repo"],
        columns=[("region", "string")], num_buckets=8,
    )
    repos = ev.select("repo").distinct()
    dim.merge_apply(repos.select(
        "repo", F.concat(F.lit("region-0:"), F.col("repo")).alias("region"),
        F.lit(1).cast("long").alias("_seq"), F.lit("U").alias("_op"),
        F.current_timestamp().alias("_ts"),
    ))
    jv = IncrementalJoin.create(
        spark, roots["jv"], src, dim, fk_cols=["repo"],
        fact_cols=[("lang", "lang", "string")],
        dim_cols=[("region", "region", "string")],
        num_buckets=32,
    )

    # top-k view: hottest 10 paths per lang by _seq — the boundary rule
    # means a typical batch re-aggregates only groups whose leaderboard
    # was actually touched; per-batch cost must stay flat as state grows
    from data_ingestor_py_spark.plans.topk_mv import IncrementalTopK

    topk = IncrementalTopK.create(
        spark, roots["topk"], src, group_cols=["lang"], order_col="_seq",
        k=10, order_type="long",
        tiebreak_cols=[("repo", "string"), ("path", "string")],
    )

    out = {"merge_s": [], "mv_s": [], "scd2_s": [], "join_s": [], "topk_s": [], "history_rows": 0}
    for i in range(k):
        batch = ev.where(
            (F.col("_seq") >= i * n) & (F.col("_seq") < (i + 1) * n)
        )
        t0 = time.time()
        src.merge_apply(batch, stats="light")
        t1 = time.time()
        mv.refresh()
        t2 = time.time()
        scd2_apply(hist, batch, ["repo", "path"], ["lang", "content"])
        t3 = time.time()
        # dim churn: ~1/50th of repos get a new region label this batch
        dim.merge_apply(repos.where(
            F.pmod(F.xxhash64("repo"), F.lit(50)) == i % 50
        ).select(
            "repo",
            F.concat(F.lit(f"region-{i+1}:"), F.col("repo")).alias("region"),
            F.lit(i + 2).cast("long").alias("_seq"), F.lit("U").alias("_op"),
            F.current_timestamp().alias("_ts"),
        ))
        jv.refresh()
        t4 = time.time()
        topk.refresh()
        t5 = time.time()
        out["merge_s"].append(round(t1 - t0, 2))
        out["mv_s"].append(round(t2 - t1, 2))
        out["scd2_s"].append(round(t3 - t2, 2))
        out["join_s"].append(round(t4 - t3, 2))
        out["topk_s"].append(round(t5 - t4, 2))
        print(
            f"batch {i}: merge {t1-t0:.1f}s  mv {t2-t1:.1f}s  "
            f"scd2 {t3-t2:.1f}s  join {t4-t3:.1f}s  topk {t5-t4:.1f}s",
            file=sys.stderr,
        )
    out["history_rows"] = read_history(hist).count()
    out["source_rows"] = src.read().count()
    out["events"] = total
    # MV correctness at the end of the run (cheap: aggregate-scale)
    inc = sorted(map(tuple, mv.read().collect()), key=lambda t: [(x is None, x) for x in t])
    ful = sorted(map(tuple, mv.recompute().collect()), key=lambda t: [(x is None, x) for x in t])
    out["mv_exact"] = inc == ful
    tk_inc = sorted(map(tuple, topk.read().collect()))
    tk_ful = sorted(map(tuple, topk.recompute().collect()))
    out["topk_exact"] = tk_inc == tk_ful
    # join-view correctness: incremental folds == one full re-join
    out["join_exact"] = (
        jv.read().exceptAll(jv.recompute()).isEmpty()
        and jv.recompute().exceptAll(jv.read()).isEmpty()
    )
    print(json.dumps(out))
    for r in roots.values():
        shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    main()
