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


def stage_columns(df, **exprs):
    """Materialize expensive Column expressions as real columns behind a
    Generate boundary (``explode(array(expr))`` — a 1:1 row mapping).

    A plain ``withColumn``/``select`` alias is NOT a materialization
    point: Catalyst's CollapseProject re-inlines the aliased expression
    into every downstream reference, and references inside higher-order
    function lambdas are re-evaluated PER ARRAY ELEMENT (HOFs run
    interpreted, outside codegen's common-subexpression elimination).
    A split/hash array referenced from a sliding-window ``transform``
    therefore goes quadratic in document length — measured 17 s vs
    0.5 s on 100 documents for the winnowing fingerprinter. Generate
    output attributes cannot be collapsed through, so each staged
    expression is evaluated exactly once per row."""
    for name, expr in exprs.items():
        df = df.select("*", F.explode(F.array(expr)).alias(name))
    return df


def nonempty_words(text: Column, lowercase: bool = False) -> Column:
    """Whitespace word split with empty tokens removed — THE word-grid
    tokenizer shared by chunk/span/passage/jaccard/shingle operators
    (review r10: previously five inlined copies; a tokenizer fix — e.g.
    NBSP or zero-width handling — must land in all of them at once or
    the operators' word grids silently diverge). ``lowercase`` folds
    case first for the set-similarity family; the positional family
    (chunking, span fingerprints, passages) keeps original case."""
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda w: w != "")
