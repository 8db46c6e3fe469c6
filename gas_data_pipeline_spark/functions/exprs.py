"""Expression-level helpers for controlling Catalyst evaluation.

``bind`` is the load-bearing one: Catalyst's CollapseProject inlines a
projected column into every downstream reference, so an expensive
subexpression (a regex split, a tokenization) referenced N times is
*evaluated* N times per row — interpreted higher-order lambdas get no
whole-stage-codegen CSE. Binding the value as a higher-order-function
lambda variable makes it a true let-binding the optimizer cannot
inline through: evaluated once, referenced cheaply.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Let-binding for Column expressions: evaluate ``expr`` once per
    row and pass it to ``body`` as a lambda variable.

    Implemented as ``transform(array(expr), x -> body(x))[1]`` — the
    single-element array is the cheapest legal way to introduce a
    lambda scope. Use wherever an expensive expression would otherwise
    be duplicated into many consumers (e.g. a tokenization feeding a
    dozen feature columns)."""
    return F.element_at(F.transform(F.array(expr), body), 1)
