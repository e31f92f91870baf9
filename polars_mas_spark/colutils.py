"""Column-reference helpers for user-supplied column names.

PheWAS tables name their dependent columns after phecodes — "250.2",
"008.5" (reference constants.py:9 forces these to strings precisely
because of the dots). A bare ``F.col("250.2")`` parses the dot as a
struct-field access, so every place the engine turns a *user* column
name into a Column must go through :func:`qcol`, which backtick-quotes
the name (escaping embedded backticks by doubling, Spark's rule).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def qname(name: str) -> str:
    """Backtick-quote a column name for safe embedding in selections."""
    return "`" + name.replace("`", "``") + "`"


def qcol(name: str) -> Column:
    return F.col(qname(name))
