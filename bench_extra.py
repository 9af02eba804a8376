"""Round-7 optimization harness (bench.py itself is frozen): time any
subset of the declared queries in isolation through the noop sink, with
N repeats, per-query Spark job counts, and optional plan capture.

Usage:
    python bench_extra.py [--reps N] [--sf DIR] [--plans OUTDIR] [query ...]

Prints one JSON line per query: {"query": ..., "times": [...], "min": ...,
"jobs": J, "stages": S} and a trailing total line. Methodology matches
bench.py (same session factory, same noop sink, same warmup), so numbers
are comparable run-to-run; they are NOT the driver's numbers.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--plans", default=None, help="write explain('formatted') per query here")
    ap.add_argument("--suffix", default="", help="plan filename suffix, e.g. _before")
    ap.add_argument("--no-warm", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from data_ingestor_py_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    extra = {}
    for kv in filter(None, os.environ.get("BENCH_EXTRA_CONF", "").split(";")):
        k, _, v = kv.partition("=")
        extra[k.strip()] = v.strip()
    evdir = os.environ.get("BENCH_EXTRA_EVENTLOG")
    if evdir:
        os.makedirs(evdir, exist_ok=True)
        extra.update({"spark.eventLog.enabled": "true", "spark.eventLog.dir": evdir})
    spark = get_spark("bench-extra", cores=cpus, extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    names = args.queries or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    if not args.no_warm:
        spark.read.parquet(os.path.join(args.sf, "region.parquet")).count()

    st = spark.sparkContext.statusTracker()
    totals = []
    for name in names:
        times = []
        jobs0 = len(st.getJobIdsForGroup(None) or [])
        for r in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name} rep{r}")
            t0 = time.time()
            df = qs[name](spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        jobs1 = len(st.getJobIdsForGroup(None) or [])
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            try:
                plan = qs[name](spark, args.sf)._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
                )
            except Exception as e:  # pragma: no cover
                plan = f"explain failed: {e}"
            with open(os.path.join(args.plans, f"{name}{args.suffix}.txt"), "w") as f:
                f.write(plan)
        rec = {
            "query": name,
            "times": times,
            "min": min(times),
            "jobs_delta": (jobs1 - jobs0),
        }
        totals.append(min(times))
        print(json.dumps(rec), flush=True)
    print(json.dumps({"total_min": round(sum(totals), 3), "n": len(names), "sf": args.sf}))
    spark.stop()


if __name__ == "__main__":
    main()
