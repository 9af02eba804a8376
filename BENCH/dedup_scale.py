"""Scale evidence for the LLM-dedup family (r7, VERDICT item 3).

The CDC merge path has a 4x10^8-event demonstration; this harness gives
the similarity/substring-dedup operators their >=10^6-doc measurement.
A synthetic corpus of paragraph-shaped documents is generated
distributed (deterministic per doc_id, ~25% near/exact duplicates by
construction), then each operator runs through the noop sink at two
corpus sizes so growth can be compared against the expected O(n)/
O(n*bands) shapes.

Usage:
    python BENCH/dedup_scale.py [--docs 1000000] [--docs2 250000] [--cores 32]

Prints one JSON line per (operator, n_docs) with wall seconds and the
operator's output row count, plus a final summary line with the
size-ratio vs time-ratio per operator (linear shape => time ratio ~<=
size ratio).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_ingestor_py_spark.session import get_spark  # noqa: E402


def synth_corpus(spark, n_docs: int):
    """Deterministic paragraph corpus: ~75% unique docs, ~12.5% exact
    duplicates of a smaller id space, ~12.5% near-duplicates (shared
    long prefix, one-token tail change). Word stream is xxhash-derived
    so text is stable across runs/partitions."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    # duplicate classes: family = id % 8 (0 -> exact dup of id//8's text
    # seed, 1 -> near dup, else unique seed)
    fam = F.col("doc_id") % 8
    seed = F.when(fam <= 1, F.col("doc_id") / 8).otherwise(F.col("doc_id")).cast("long")
    n_words = 60
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.concat(
            F.lit("w"),
            (F.pmod(F.xxhash64(seed, i), F.lit(5000))).cast("string"),
        ),
    )
    tail = F.when(
        fam == 1,
        F.concat(F.lit("tail"), (F.col("doc_id") % 97).cast("string")),
    ).otherwise(F.lit("end"))
    return base.select(
        "doc_id",
        F.concat_ws(" ", F.concat_ws(" ", words), tail).alias("text"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--docs2", type=int, default=250_000)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from data_ingestor_py_spark.functions import similarity as S
    from data_ingestor_py_spark.functions.substrdedup import duplicated_span_stats

    spark = get_spark("dedup-scale", cores=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    # benchmark grams for decontamination: 200 13-gram probes drawn from
    # the duplicate families so some actually hit
    bench_docs = synth_corpus(spark, 400).where(F.col("doc_id") % 2 == 0)

    def ops(docs):
        return {
            "exact_dedup": lambda: S.exact_dedup(docs),
            "minhash_lsh_candidates": lambda: S.minhash_lsh_candidates(docs),
            "exact_substring_dedup": lambda: duplicated_span_stats(docs, k=8, by="hash"),
            "decontaminate": lambda: S.decontaminate(docs, bench_docs, n=13),
        }

    results: dict[str, dict[int, float]] = {}
    for n in (args.docs2, args.docs):
        docs = synth_corpus(spark, n)
        # materialize the corpus once to parquet so every operator reads
        # identical bytes (and generation cost stays out of the timing)
        path = f"/tmp/dedup-scale-{n}"
        # _SUCCESS check: a killed prior run leaves a partial dir that a
        # bare exists() would silently benchmark against
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            docs.write.mode("overwrite").parquet(path)
        stored = spark.read.parquet(path)
        for name, build in ops(stored).items():
            spark.sparkContext.setJobDescription(f"{name} n={n}")
            # build INSIDE the timed region: some operators materialize
            # eagerly (local checkpoints) at plan-construction time
            t0 = time.time()
            df = build()
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.time() - t0, 2)
            results.setdefault(name, {})[n] = wall
            print(json.dumps({"op": name, "n_docs": n, "wall_s": wall}), flush=True)
    ratio = args.docs / args.docs2
    summary = {
        name: {
            "size_ratio": ratio,
            "time_ratio": round(walls[args.docs] / walls[args.docs2], 2),
        }
        for name, walls in results.items()
        if args.docs in walls and args.docs2 in walls
    }
    print(json.dumps({"summary": summary, "cores": args.cores}))
    spark.stop()


if __name__ == "__main__":
    main()
