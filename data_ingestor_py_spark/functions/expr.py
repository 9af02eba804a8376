"""Expression utilities.

``let_`` is a single-evaluation let-binding for Catalyst expressions:
Catalyst does not common-subexpression-eliminate through higher-order
functions, so an expensive array (a tokenized document, a hashed shingle
set) referenced N times in one output column is recomputed N times. Binding
it as a lambda variable — ``element_at(transform(array(v), body), 1)`` —
evaluates it exactly once per row and makes every reference a cheap
variable read. Measured effect on the minhash pipeline: ~50x.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once, bind it as a lambda variable in ``body``."""
    return F.element_at(F.transform(F.array(value), body), 1)
