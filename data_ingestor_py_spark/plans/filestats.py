"""Per-data-file column statistics for manifest-level scan pruning.

Iceberg attaches (min, max, null_count) per column to every data-file
entry in its manifests so a scan can skip files whose value ranges cannot
satisfy the query predicate — at 100 TB this is the difference between
"read 64 TB and filter" and "open 40 files". This module is the engine's
equivalent: statistics are harvested from the parquet FOOTERS of
freshly-written snapshot files (a driver-side metadata read — the stats
already exist because the parquet writer computed them per row group; we
never re-scan data) and stored in the table manifest keyed by snapshot
dir, from where :meth:`TargetTable.scan_plan` prunes buckets and files.

Soundness contract: harvested values are treated strictly as BOUNDS
(parquet writers may truncate long string statistics, but the truncated
min stays <= every value and the truncated max stays >= every value), and
any column/file whose statistics are absent, unparseable, or of an
unsupported type simply yields "may match" — pruning is only ever an
optimization, never a correctness dependency; the residual filter is
always applied to whatever survives.

Supported kinds: ``num`` (all parquet integer/float physical types) and
``str`` (UTF-8). Decimals, dates, timestamps and binary are deliberately
NOT harvested in v1 — converting their bounds (e.g. Decimal -> float)
can round in the unsound direction, so they are left unprunable rather
than subtly wrong.

Reference parity note: the reference engine has no scan pruning at all —
every query re-reads its full working set (file_processor.py walks whole
directories); this is a from-scratch capability the Spark engine needs at
its target scale, not a port.
"""

from __future__ import annotations

import math
import os


# spark type string -> stats kind ("num" / "str"); anything absent is
# unharvested/unprunable by design
_KIND = {
    "byte": "num", "tinyint": "num", "short": "num", "smallint": "num",
    "int": "num", "integer": "num", "long": "num", "bigint": "num",
    "float": "num", "double": "num",
    "string": "str",
}


def kind_of(spark_type: str) -> str | None:
    return _KIND.get(spark_type.strip().lower())


def _clean(v, kind: str):
    """Validate/convert one footer statistic into its manifest (JSON)
    representation; None = unusable (caller drops the column's stats for
    that file, making it unprunable — never wrong)."""
    if v is None:
        return None
    if kind == "num":
        if isinstance(v, bool):
            return None
        if isinstance(v, int):
            return v
        if isinstance(v, float):
            return None if math.isnan(v) else v
        return None
    if kind == "str":
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        return v if isinstance(v, str) else None
    return None


def harvest_dir(abs_dir: str, name_to_key: dict[str, tuple[str, str]]) -> list[dict]:
    """Harvest per-file stats for every parquet file directly under
    ``abs_dir`` (one ``bkt=N`` leaf dir). ``name_to_key`` maps the parquet
    column NAME AS WRITTEN (the layer's written schema version) to
    ``(colkey, kind)`` where colkey is the schema-evolution-stable key the
    manifest stores ("f<field_id>" for payload columns, the plain name for
    key/seq columns — renames change names, never field ids).

    Returns ``[{"f": filename, "rows": n, "st": {colkey: [min, max,
    null_count]}}, ...]``; a colkey absent from ``st`` means "no usable
    bound, do not prune on it". ``[None, None, n]`` means the column is
    entirely NULL in the file (no row can satisfy any comparison — the
    strongest possible bound). Cost: O(files) footer reads on the driver,
    metadata-scale; big commits take :func:`harvest_dirs_distributed`
    instead (TargetTable switches on the file count).
    """
    return [
        harvest_file(os.path.join(abs_dir, fname), fname, name_to_key)
        for fname in sorted(os.listdir(abs_dir))
        if fname.endswith(".parquet") and not fname.startswith(("_", "."))
    ]


def harvest_file(
    path: str, fname: str, name_to_key: dict[str, tuple[str, str]]
) -> dict:
    """One file's footer -> one stats entry (see :func:`harvest_dir` for
    the entry shape). Pure function of the file bytes, so it runs
    identically on the driver or inside an executor task."""
    import pyarrow.parquet as pq

    try:
        md = pq.ParquetFile(path).metadata
    except Exception:
        return {"f": fname, "rows": -1, "st": {}}
    # aggregate row-group stats -> file stats
    agg: dict[str, list] = {}       # colkey -> [min, max, nulls]
    bad: set[str] = set()           # colkeys with an unusable row group
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            mapped = name_to_key.get(col.path_in_schema)
            if mapped is None or mapped[0] in bad:
                continue
            colkey, kind = mapped
            st = col.statistics
            nulls = st.null_count if st is not None else None
            all_null = (
                st is not None
                and nulls is not None
                and nulls == rg.num_rows
            )
            if all_null:
                cur = agg.setdefault(colkey, [None, None, 0])
                cur[2] += nulls
                continue
            if st is None or not st.has_min_max:
                bad.add(colkey)
                agg.pop(colkey, None)
                continue
            mn, mx = _clean(st.min, kind), _clean(st.max, kind)
            if mn is None or mx is None:
                bad.add(colkey)
                agg.pop(colkey, None)
                continue
            cur = agg.setdefault(colkey, [None, None, 0])
            cur[0] = mn if cur[0] is None else min(cur[0], mn)
            cur[1] = mx if cur[1] is None else max(cur[1], mx)
            cur[2] += nulls if nulls is not None else 0
    return {"f": fname, "rows": md.num_rows, "st": agg}


_HARVEST_FILES_PER_TASK = 32


def harvest_dirs_distributed(
    spark,
    abs_dirs: dict[str, str],
    name_to_key: dict[str, tuple[str, str]],
) -> dict[str, list[dict]]:
    """Footer harvest for many dirs as one tiny Spark job — the Iceberg
    shape (writers emit per-file stats from their tasks; here the commit
    emits them from a post-write task ride over the just-written file
    list). ``abs_dirs`` maps the dir NAME (``bkt=N``) to its absolute
    path. One task per ~32 files; each task reads only footers, never
    data pages. The collected result is O(files-in-commit x stats_keys)
    of metadata on the driver — the same bytes the shard JSON is about
    to store, not a data read.

    Executors open files by PATH, so this path requires storage the
    executors can reach natively (PosixStorage / any cluster-visible
    filesystem); TargetTable falls back to the driver harvest for
    adapter-private storage.
    """
    files: list[tuple[str, str, str]] = []
    for d, p in abs_dirs.items():
        for fname in sorted(os.listdir(p)):
            if fname.endswith(".parquet") and not fname.startswith(("_", ".")):
                files.append((d, p, fname))
    out: dict[str, list[dict]] = {d: [] for d in abs_dirs}
    if not files:
        return out
    nmap = dict(name_to_key)  # plain dict: small, picklable, no self capture

    def _task(it):
        for d, p, fname in it:
            yield d, harvest_file(os.path.join(p, fname), fname, nmap)

    n_tasks = max(1, -(-len(files) // _HARVEST_FILES_PER_TASK))
    got = (
        spark.sparkContext.parallelize(files, n_tasks)
        .mapPartitions(_task)
        .collect()
    )
    for d, entry in got:
        out[d].append(entry)
    for d in out:
        out[d].sort(key=lambda e: e["f"])
    return out


_OPS = ("=", "<", "<=", ">", ">=", "in")


def validate_preds(preds) -> list[tuple[str, str, object]]:
    out = []
    for p in preds:
        if len(p) != 3:
            raise ValueError(f"predicate must be (col, op, value): {p!r}")
        c, op, v = p
        if op not in _OPS:
            raise ValueError(f"unsupported predicate op {op!r} (use {_OPS})")
        if op == "in":
            v = list(v)
            if not v or any(x is None for x in v):
                raise ValueError(
                    "'in' needs a non-empty list without None (SQL NULL "
                    "comparisons never match — use a residual filter)"
                )
        elif v is None:
            raise ValueError(
                "predicate value may not be None (SQL comparison with NULL "
                "never matches any row)"
            )
        out.append((c, op, v))
    return out


def may_match(st: dict, colkey: str, op: str, value) -> bool:
    """Can any row of a file with stats ``st`` satisfy ``col op value``?
    Missing/partial stats => True (never prune blind). NULL rows never
    satisfy a comparison, so an all-NULL column ([None, None, n]) is a
    definitive skip."""
    bounds = st.get(colkey)
    if bounds is None:
        return True
    mn, mx = bounds[0], bounds[1]
    if mn is None or mx is None:        # entirely NULL in this file
        return False
    try:
        if op == "=":
            return mn <= value <= mx
        if op == "in":
            return any(mn <= v <= mx for v in value)
        if op == "<":
            return mn < value
        if op == "<=":
            return mn <= value
        if op == ">":
            return mx > value
        if op == ">=":
            return mx >= value
    except TypeError:
        return True                     # cross-type compare: unprunable
    return True
