"""Write-amplification demonstration: COW vs merge-on-read when batches
are SMALL relative to the table — the 10^10-event regime, where a
hash-spread batch touching 1% of keys still lands in ~every bucket, so a
copy-on-write merge rewrites ~the whole table per batch while the MoR
merge writes only the batch.

Method: bulk-load an identical ~N_KEYS-key state into a COW table and a
MoR table, then apply K identical small batches to each, measuring
per-batch wall time and bytes written per snapshot. Afterwards, measure
read() latency on the MoR table with accumulated deltas, compact, and
measure again — the read-amplification side of the tradeoff, bounded by
the compaction threshold. State hashes must agree between the two modes
at the end (the correctness gate riding the bench).

Usage: python BENCH/mor_demo.py [--n-keys N] [--batch-events N] [--batches K]
Prints one JSON line; a summary table goes in BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def du(path: str) -> int:
    total = 0
    for dirpath, _dirnames, filenames in os.walk(path):
        for f in filenames:
            try:
                total += os.path.getsize(os.path.join(dirpath, f))
            except OSError:
                pass
    return total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-keys", type=int, default=1_000_000,
                    help="approx key-space size (repos x paths)")
    ap.add_argument("--batch-events", type=int, default=100_000)
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--mor-max-deltas", type=int, default=0,
                    help="0 = accumulate all layers, compact at the end")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from data_ingestor_py_spark.operators.dedup import latest_by_key
    from data_ingestor_py_spark.plans.target import TargetTable
    from data_ingestor_py_spark.session import get_spark
    from data_ingestor_py_spark.sources import change_events

    spark = get_spark("mor-demo", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/dev/shm" if os.path.isdir("/dev/shm") else "/tmp"
    roots = {m: os.path.join(base, f"mordemo-{m}") for m in ("cow", "mor")}
    for r in roots.values():
        shutil.rmtree(r, ignore_errors=True)

    n_repos = max(10, args.n_keys // 500)
    mk = dict(
        key_cols=["repo", "path"],
        columns=[("commit", "string"), ("lang", "string"), ("content", "string")],
        num_buckets=args.num_buckets,
    )
    prep_cols = ["repo", "path", "commit", "lang", "content", "_seq", "_op", "_ts"]

    # identical initial state: one event per key, bulk-loaded
    seed0 = change_events(
        spark, args.n_keys * 2, n_repos=n_repos, paths_per_repo=500, seed=1,
        dup_rate=0.0, delete_rate=0.0,
    ).select(*prep_cols)
    seed0 = latest_by_key(seed0, ["repo", "path"])
    tables = {
        "cow": TargetTable.create(spark, roots["cow"], **mk),
        "mor": TargetTable.create(
            spark, roots["mor"], merge_mode="mor",
            mor_max_deltas=args.mor_max_deltas, **mk,
        ),
    }
    for t in tables.values():
        t.bulk_load(seed0)

    out: dict = {
        "n_keys": args.n_keys, "batch_events": args.batch_events,
        "batches": args.batches, "num_buckets": args.num_buckets,
        "modes": {},
    }
    batches = [
        change_events(
            spark, args.batch_events, n_repos=n_repos, paths_per_repo=500,
            seed=100 + i,
        )
        .select(*prep_cols)
        # lift each batch's seqs above the seed load and earlier batches
        .withColumn(
            "_seq",
            F.col("_seq") + F.lit(args.n_keys * 2 + (i + 1) * args.batch_events * 10),
        )
        for i in range(args.batches)
    ]
    for mode, t in tables.items():
        secs, bytes_per_batch = [], []
        for b in batches:
            dirs0 = {d for d in os.listdir(t.root) if d.startswith("snap-")}
            t0 = time.time()
            t.merge_apply(b, stats="light")
            secs.append(round(time.time() - t0, 2))
            # bytes the batch WROTE = size of the snapshot dirs it created
            # (measured before expiry so deletions can't mask the write)
            new_dirs = {
                d for d in os.listdir(t.root) if d.startswith("snap-")
            } - dirs0
            bytes_per_batch.append(sum(du(os.path.join(t.root, d)) for d in new_dirs))
            t.expire_snapshots(keep_last=2)
        out["modes"][mode] = {
            "batch_secs": secs,
            "mb_written_per_batch": [round(b / 1e6, 1) for b in bytes_per_batch],
        }

    # read-amplification side: read latency with layers vs after compaction
    mor = tables["mor"]

    def timed_read() -> float:
        t0 = time.time()
        mor.read().agg(F.count(F.lit(1))).collect()
        return round(time.time() - t0, 2)

    out["mor_read_with_deltas_s"] = timed_read()
    t0 = time.time()
    mor.compact_bucket_deltas()
    out["mor_compaction_s"] = round(time.time() - t0, 2)
    out["mor_read_after_compact_s"] = timed_read()

    h_cow = tables["cow"].snapshot_hash()
    h_mor = mor.snapshot_hash()
    out["state_equal"] = h_cow == h_mor
    out["state_hash"] = h_cow
    print(json.dumps(out))
    for r in roots.values():
        shutil.rmtree(r, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
