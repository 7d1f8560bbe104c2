"""Let-binding for higher-order-function expressions.

Spark evaluates lambda-bearing expressions (transform / filter /
aggregate / zip_with ...) INTERPRETED — they never enter whole-stage
codegen, and interpreted evaluation performs no common-subexpression
elimination. Any expression referenced from INSIDE a lambda body is
re-evaluated at every element, and an alias inlined by Catalyst's
CollapseProject is re-evaluated at every reference. A tokenizer array
referenced per produced chunk therefore turns an O(L) projection into
O(L^2) (and composing two such layers, O(L^3)) the moment the alias
collapses into the consuming expression.

``let(value, body)`` pins ``value`` to a lambda VARIABLE: lambda
variables are bound once per row and cost an attribute read per
reference — exactly the sharing the interpreter lacks, expressed
entirely inside one Catalyst expression so no projection-collapse rule
can undo it. Implementation: wrap the value in a one-element array,
apply ``transform`` (whose lambda parameter is the binding), take
element 0.

Measured on the sf0.001 documents fixture (500 rows, <=50 two-word
lines per doc): word_lines 1.94 s -> 0.37 s, within-doc line dedup
4.32 s -> 0.29 s, outputs bitwise-identical (pinned in
tests/test_line_dedup.py / test_line_filter.py).

Reference analog: none — engine-internal expression discipline.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """``body(value)`` with ``value`` bound once per row.

    ``body`` may reference its argument any number of times (including
    from inside nested lambdas) at attribute-read cost. NULL flows
    through unchanged: ``array(value)`` is a one-element array holding
    NULL, and ``body`` sees NULL exactly as it would the raw
    expression. Nest calls to bind several values.
    """
    return F.transform(F.array(value), body).getItem(0)
