"""Per-file Bloom filters for point-lookup file skipping.

Min/max footer statistics (plans/filestats.py) prune range predicates on
CLUSTERED columns, but are useless for equality probes on hash-like or
unclustered columns — every file's [min, max] spans the whole domain, so
nothing prunes. The standard lakehouse answer (Parquet bloom filters,
Iceberg puffin blobs, Delta bloom indexes) is a per-file Bloom filter:
``=``/``IN`` probes skip every file whose filter proves the value absent.

Design:

- **Build is one Catalyst job per written-schema group** (no Python in
  the data path): scan the uncovered snapshot dirs, explode each value
  into its ``k`` hash positions (``xxhash64(cast(v AS STRING), seed_i)
  mod m``), fold positions into 64-bit words with ``bit_or`` grouped by
  ``(file, word)`` — the shuffle is bounded by ``files × m/64`` words,
  metadata scale. Values are hashed via their STRING cast so probes stay
  consistent across schema-evolution retypes (the same rule the stats
  map uses for kinds).
- **The sidecar is immutable-dir-complete**: snapshot dirs are written
  once and never appended, so a dir covered at build time lists ALL its
  files forever. Pruning only ever consults covered dirs — a file or
  dir absent from the sidecar is simply read (advisory, like stats).
- **Soundness**: visible rows are a subset of physical rows (the MoR
  winner rule picks among physically present rows), so "no physical row
  can equal v" implies "no visible row can". ``=`` prunes a file iff all
  ``k`` bits are clear for the value; ``IN`` prunes iff EVERY value is
  provably absent. The residual filter is always applied regardless —
  false positives cost a read, never a wrong row.
- **Probe hashing reuses the build's own Spark expressions** on a
  1-row local DataFrame (metadata-scale job), so build and probe can
  never disagree on the hash function.

Reference parity note: no analogue in the reference (it has no scan
layer at all); this is the engine-native version of what its warehouse
target (Postgres) would do with a btree probe.
"""

from __future__ import annotations

import json

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

DEFAULT_M = 1 << 16  # bits per file-filter (8 KiB dense; stored sparse)
DEFAULT_K = 7


def _positions_exprs(col, m: int, k: int):
    v = col.cast("string")
    return [
        F.pmod(F.xxhash64(v, F.lit(i)), F.lit(m)).cast("long") for i in range(k)
    ]


def build_words(df, value_col: str, m: int, k: int):
    """``(f, w, bits)`` word rows plus ``(f, nn)`` non-NULL value counts
    per input file for one column: the distributed bloom build. ``df``
    must carry the data column plus ``_file``. The counts frame is the
    path-match witness: only files the job actually produced rows for
    may get sidecar entries (see TargetTable.build_bloom) — a
    path-normalization mismatch must degrade to "uncovered -> read",
    never to "empty filter -> prune everything"."""
    base = df.select("_file", F.col(value_col).alias("_v"))
    counts = base.groupBy("_file").agg(
        F.count(F.col("_v")).alias("nn")  # non-NULL values in the file
    )
    vals = base.where(F.col("_v").isNotNull()).distinct()
    pos = vals.select(
        "_file",
        F.explode(F.array(*_positions_exprs(F.col("_v"), m, k))).alias("_p"),
    )
    words = (
        pos.select(
            "_file",
            (F.col("_p") / 64).cast("long").alias("w"),
            # DataFrame shiftleft() only takes a literal bit count; the SQL
            # form accepts a column expression
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(_p % 64 AS INT))").alias("b"),
        )
        .groupBy("_file", "w")
        .agg(F.bit_or("b").alias("bits"))
    )
    return words, counts


def probe_positions(
    spark: SparkSession, values: list, m: int, k: int, spark_type: str = "string"
) -> dict[str, list[int]]:
    """probe value -> its k bit positions. The probe value is first cast
    to the COLUMN'S current Spark type and then rendered through the
    same ``CAST(v AS STRING)`` the build hashed — str(python_value) is
    NOT that rendering (Java prints doubles as '1.23E7', booleans as
    'true'), so the typed round-trip is what keeps build and probe on
    the same hash input. One local metadata-scale job."""
    vals = [v for v in values if v is not None]
    if not vals:
        return {}
    df = spark.createDataFrame(
        [(str(v),) for v in sorted({str(v) for v in vals})], "v string"
    ).select(F.col("v").cast(spark_type).alias("v")).where(F.col("v").isNotNull())
    rows = df.select(
        "v", F.array(*_positions_exprs(F.col("v"), m, k)).alias("ps")
    ).collect()
    return {str(r["v"]): list(r["ps"]) for r in rows}


def may_contain(file_entry: dict, positions: list[int]) -> bool:
    """False => the value is PROVABLY absent from the file."""
    words = file_entry.get("w", {})
    for p in positions:
        bits = words.get(str(p // 64))
        if bits is None or not (bits >> (p % 64)) & 1:
            return False
    return True


class BloomSidecar:
    """One column's sidecar: ``{"col", "m", "k", "type", "dirs":
    {reldir: {"all": [fname...], "files": {fname: {"w": {word:
    bits}}}}}}`` stored as JSON next to the manifest. ``all`` is the
    complete dir listing at build time (snapshot dirs are immutable);
    ``files`` holds entries ONLY for files the build job path-matched —
    a file in ``all`` without an entry is read, and a dir with any such
    file is never whole-dir pruned. ``type`` is the column's Spark type
    the build rendered through CAST(... AS STRING); probes against a
    since-retyped column ignore the sidecar."""

    def __init__(self, raw: bytes | None):
        if raw is None:
            self.doc = None
        else:
            try:
                self.doc = json.loads(raw)
            except (json.JSONDecodeError, UnicodeDecodeError):
                self.doc = None  # unreadable sidecar = no pruning, never an error

    @property
    def params(self) -> tuple[int, int] | None:
        if not self.doc:
            return None
        return int(self.doc["m"]), int(self.doc["k"])

    def covered(self, reldir: str) -> bool:
        return bool(self.doc) and reldir in self.doc["dirs"]

    def dir_files(self, reldir: str) -> dict:
        return self.doc["dirs"][reldir]["files"]

    def dir_complete(self, reldir: str) -> bool:
        """Every file of the dir has a path-matched entry — the
        precondition for whole-dir pruning."""
        d = self.doc["dirs"][reldir]
        return all(f in d["files"] for f in d.get("all", ()))

    def file_entry(self, reldir: str, fname: str) -> dict | None:
        if not self.covered(reldir):
            return None
        return self.dir_files(reldir).get(fname)
