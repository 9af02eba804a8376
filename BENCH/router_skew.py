"""Router hot-table skew measurement (round-6 verdict item).

The staged demultiplex partitions the wire batch by table: a Zipf table
mix (one table carrying ~90% of the stream) makes one giant partition
while the N-1 small merges finish early. This harness measures that
skewed fan-out under the mitigations the engine ships:

- serial merges (the skew fully serializes behind the hot table),
- ``max_parallel_tables=N`` (cold tables overlap the hot one's wall),
- plus hot-route ``salt_buckets="auto"`` (the hot table's own merge
  spreads its dense keys over more reducers).

plus a balanced-mix control at the same volume. State equality across
configurations is pinned by tests/test_router.py; this script measures
wall only. Usage:

    python BENCH/router_skew.py --events 1000000 --tables 4 --cores 16
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestor_py_spark.plans.router import (  # noqa: E402
    DebeziumRouter,
    TableRoute,
)
from data_ingestor_py_spark.plans.target import TargetTable  # noqa: E402
from data_ingestor_py_spark.session import get_spark  # noqa: E402
from data_ingestor_py_spark.sources.debezium import to_debezium_json  # noqa: E402

FIELDS = [("k", "string"), ("v", "double")]


def _mkroot(prefix):
    d = tempfile.mkdtemp(prefix=prefix)
    os.rmdir(d)
    return d


def wire(spark, n, tables, hot_frac, hot_keys):
    """hot_frac of events on tables[0] over hot_keys keys; rest uniform.
    hot_frac=0 -> balanced control (uniform tables, uniform keys)."""
    n_cold = len(tables) - 1
    hot_cut = int(hot_frac * 100)
    if hot_cut:
        t = F.when(
            F.pmod(F.col("id"), 100) < hot_cut, F.lit(tables[0])
        ).otherwise(
            F.element_at(
                F.array(*[F.lit(x) for x in tables[1:]]),
                (F.pmod(F.col("id"), n_cold) + 1).cast("int"),
            )
        )
        key = F.when(
            F.pmod(F.col("id"), 100) < hot_cut, F.pmod(F.col("id"), hot_keys)
        ).otherwise(F.col("id"))
    else:
        t = F.element_at(
            F.array(*[F.lit(x) for x in tables]),
            (F.pmod(F.col("id"), len(tables)) + 1).cast("int"),
        )
        key = F.col("id")
    return spark.range(n).select(
        to_debezium_json(
            F.struct(
                F.concat(F.lit("k"), key).alias("k"),
                (F.col("id") * 1.5).alias("v"),
            ),
            F.lit("u"),
            F.col("id") * 1000,
            F.col("id"),
            table_name=t,
        ).alias("value")
    )


def run_config(spark, raw_dir, tables, num_buckets, parallel, hot_salt):
    tts = {
        x: TargetTable.create(
            spark, _mkroot(f"rsk-{x}-"), key_cols=["k"],
            columns=[("v", "double")], num_buckets=num_buckets,
        )
        for x in tables
    }
    routes = [
        TableRoute(
            x, FIELDS, tts[x],
            salt_buckets=("auto" if (hot_salt and x == tables[0]) else 0),
        )
        for x in tables
    ]
    router = DebeziumRouter(
        spark, _mkroot("rsk-cp-"), routes,
        max_parallel_tables=parallel, stage_dir=_mkroot("rsk-stage-"),
    )
    raw = spark.read.text(raw_dir).select(F.col("value"))
    t0 = time.time()
    stats = router.apply_batch(raw, 0)
    wall = time.time() - t0
    return wall, {k: s.rows_in for k, s in stats.items()}, {
        k: s.salt_used for k, s in stats.items()
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=1_000_000)
    ap.add_argument("--tables", type=int, default=4)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--hot-frac", type=float, default=0.9)
    ap.add_argument("--hot-keys", type=int, default=1000)
    args = ap.parse_args()

    spark = get_spark("router-skew", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    tables = [f"t{i}" for i in range(args.tables)]

    out = {"events": args.events, "tables": args.tables, "cores": args.cores,
           "hot_frac": args.hot_frac, "hot_keys": args.hot_keys, "runs": {}}
    for name, frac in (("balanced", 0.0), ("skewed", args.hot_frac)):
        d = tempfile.mkdtemp(prefix=f"rsk-wire-{name}-")
        wire(spark, args.events, tables, frac, args.hot_keys).write.mode(
            "overwrite"
        ).text(d)
        configs = [("serial", 1, False), ("parallel", args.tables, False)]
        if frac:
            configs.append(("parallel+hot_salt", args.tables, True))
        for cname, par, salt in configs:
            wall, rows, salts = run_config(
                spark, d, tables, args.buckets, par, salt
            )
            out["runs"][f"{name}/{cname}"] = {
                "wall_s": round(wall, 2),
                "rows_in": rows,
                "salt_used": salts,
            }
            print(f"# {name}/{cname}: {wall:.2f}s rows={rows} salt={salts}",
                  file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
