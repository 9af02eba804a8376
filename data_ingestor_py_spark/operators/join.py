"""Dictionary-lookup joins (J1) and merge-join helpers.

The reference resolves error codes with a per-call point SELECT against the
``error_definitions`` dim table (errors/error_resolver.py:74-113) and
``str.format``s the args into the description (:101). At scale that is a
broadcast left join + ``format_string`` — the dim table ships to every
executor once instead of one round-trip per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dict_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Broadcast dictionary join: small dim side is explicitly broadcast so
    the plan never sort-merge-shuffles the fact table for a lookup."""
    keys = [key] if isinstance(key, str) else key
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on=keys, how=how)


def resolve_messages(df: DataFrame, template_col: str, *arg_cols: str) -> DataFrame:
    """Reference's ErrorResolver.resolve string interpolation, vectorized:
    printf-style template column + arg columns -> ``message``."""
    return df.withColumn("message", F.format_string("%s", F.col(template_col)) if not arg_cols
                         else F.expr(f"format_string({template_col}, {', '.join(arg_cols)})"))
