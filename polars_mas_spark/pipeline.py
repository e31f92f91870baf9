"""End-to-end MAS pipeline orchestration.

Reference: /root/reference/src/polars_mas/pipeline.py:17-42
(read -> preprocess -> associations -> postprocess -> write). The
reference materializes the preprocessed table to a /dev/shm Arrow IPC
file so its worker processes can mmap it; in Spark that role is played
by ``persist(MEMORY_AND_DISK)`` — the eager preprocessing statistics and
the association shuffle both reuse the cached partitions instead of
re-scanning the source (SURVEY.md §4 note 1).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession

from polars_mas_spark.colutils import qname
from polars_mas_spark.config import MASConfig
from polars_mas_spark.operators.association import (
    checkpoint_wide,
    choose_strategy,
    reusable_scan_files,
    run_associations,
)
from polars_mas_spark.operators.postprocessing import (
    add_phecode_definitions,
    benjamini_hochberg,
    bonferroni,
)
from polars_mas_spark.operators.preprocessing import build_prep_recipe, preprocess
from polars_mas_spark.sources.readers import read_input
from polars_mas_spark.sources.writers import write_output


def run_pipeline(
    spark: SparkSession,
    config: MASConfig,
    df: DataFrame | None = None,
    input_path: str | None = None,
    output_path: str | None = None,
    phecode_defs: DataFrame | None = None,
    strategy: str | None = None,
) -> DataFrame:
    """Run the full MAS dataflow; returns the results DataFrame.

    Programmatic-first API (the reference is CLI-only; a Python API is on
    its declared roadmap, README.md:163): pass either an already-loaded
    wide DataFrame or an input path. ``strategy`` forces the fan-out's
    physical strategy ("columnar"/"packed"/"unpivot"); default picks by shape.
    """
    if df is None:
        if input_path is None:
            raise ValueError("Provide either df or input_path")
        df = read_input(spark, input_path, null_values=config.null_value_tokens)
    config.resolve(df.columns)
    # Column pruning, minimally: at PheWAS width this projection was a
    # measured ~6 s of FIXED driver time per run — ~1,800 qcol() py4j
    # round-trips plus a 1,800-arg select. Skip it when the input
    # already holds exactly the included set (the benchmark case:
    # downstream reads columns BY NAME, so order is immaterial), and
    # otherwise ship ONE selectExpr call with backticked names instead
    # of per-column Column objects.
    included = list(config.included_columns)
    # The length check keeps the skip safe for inputs carrying DUPLICATE
    # column names: set-equality alone would skip the select and defer
    # the failure to an opaque ambiguous-reference error deep in the
    # strategy code; forcing the projection here makes the duplicate
    # fail immediately at pipeline entry with a clear locus (selectExpr
    # on a duplicated name throws AMBIGUOUS_REFERENCE — duplicates are
    # rejected, not repaired).
    if len(df.columns) != len(included) or set(df.columns) != set(included):
        df = df.selectExpr(*[qname(c) for c in included])

    num_pairs = len(config.predictor_columns) * len(config.dependent_columns)
    auto_strategy = strategy is None
    if strategy is not None and strategy not in (
        "columnar", "packed", "unpivot", "moments",
    ):
        # An unknown string previously slipped through the guards and
        # was silently coerced to 'packed' at the run_associations call
        # (review r9) — a typo must not pick a physical plan.
        raise ValueError(
            f"unknown strategy {strategy!r}; valid: "
            "columnar/packed/unpivot/moments (or None for auto)"
        )
    if strategy is None:
        if (
            config.model == "linear"
            and config.quantitative
            and len(config.covariate_columns) <= 64
        ):
            # Moments dominate for linear at every shape (see
            # run_associations) — and need no row count to decide.
            strategy = "moments"
        else:
            # Persist BEFORE the strategy-deciding count so the pass
            # that counts also populates the cache (review r9): the
            # tall branch re-persists the same handle (a no-op) and the
            # columnar checkpoint branch unpersists it explicitly.
            df = df.persist(StorageLevel.MEMORY_AND_DISK)
            n_rows = df.count()
            strategy = choose_strategy(num_pairs, n_rows)
    if strategy == "columnar" and config.missing_covariate_values in (
        "forward", "backward",
    ):
        # Ordered fills need the Spark window path. Same explicit-vs-
        # auto policy as the guards below: auto picks fall back, an
        # explicit columnar request errors instead of silently swapping.
        if auto_strategy:
            strategy = "packed"
        else:
            raise ValueError(
                "strategy='columnar' cannot run ordered "
                f"({config.missing_covariate_values!r}) covariate fills — "
                "they need the Spark window path; use packed/unpivot or a "
                "different missing-value strategy"
            )
    if strategy == "columnar" and (config.rint or config.logt):
        # The dependent-variable transforms run as Spark jobs over the
        # tall path (rint is a global rank per dependent); the columnar
        # PrepRecipe has no transform pass, so the flag would be
        # silently ignored — same auto-falls-back / explicit-errors
        # policy as the guards around this one.
        if auto_strategy:
            strategy = "packed"
        else:
            raise ValueError(
                "strategy='columnar' does not apply rint/logt (no "
                "transform pass in the PrepRecipe path); use "
                "packed/unpivot/moments, or drop the flag"
            )
    if strategy == "columnar" and config.drop_correlated_above is not None:
        # The correlated-covariate pruner runs inside preprocess(); the
        # columnar path replaces preprocess() with a PrepRecipe that
        # does not consult it, so the flag would be SILENTLY ignored —
        # the same model would differ by physical strategy (review r5
        # finding). Same policy as the ordered-fill guard: auto falls
        # back to the tall path, explicit columnar errors.
        if auto_strategy:
            strategy = "packed"
        else:
            raise ValueError(
                "strategy='columnar' does not apply drop_correlated_above "
                "(the PrepRecipe path has no correlation pass); use "
                "packed/unpivot, or drop the flag"
            )
    if strategy == "columnar" and config.checkpoint_dir and "://" in config.checkpoint_dir:
        # Columnar's per-task column-pruned reads go through pyarrow,
        # which needs POSIX-visible paths; a URI-scheme checkpoint target
        # (hdfs://, s3a://) means no shared mount. Auto picks fall back
        # to the tall path (its shuffle needs no side storage); an
        # EXPLICIT columnar request gets an actionable error, never a
        # silent strategy swap (same policy as the non-local guard
        # below).
        if auto_strategy:
            strategy = "packed"
        else:
            raise ValueError(
                "strategy='columnar' needs a POSIX-shared checkpoint_dir "
                f"(got URI {config.checkpoint_dir!r}) — point checkpoint_dir "
                "at a mounted path, or use the packed/unpivot strategy"
            )
    if (
        auto_strategy
        and strategy == "columnar"
        and config.checkpoint_dir is None
        and not spark.sparkContext.master.startswith("local")
    ):
        # AUTO pick only: non-local master with no shared checkpoint dir
        # means the columnar checkpoint would land where the driver's
        # POSIX reads can't see it (association.checkpoint_wide raises
        # on this) — the packed shuffle is the safe auto choice. An
        # EXPLICIT strategy="columnar" proceeds: source-file reuse
        # (reusable_scan_files) runs checkpoint-free on any shared
        # mount, and the genuinely broken case still fails with
        # checkpoint_wide's actionable error instead of a silent
        # strategy swap.
        strategy = "packed"

    if strategy == "columnar":
        # Wide-short shape (the PheWAS benchmark): the preprocessed wide
        # table must never exist as a JVM schema — caching or row-pivoting
        # ~1,800 columns costs tens of seconds per pass in codegen and
        # Arrow<->row conversion. Instead: (1) land the RAW included table
        # as parquet — reusing the source files directly when the input
        # already is a plain parquet scan, else one pyarrow checkpoint;
        # (2) reduce preprocessing to a PrepRecipe via narrow
        # column-pruned stats jobs; (3) fan out the pair list, each task
        # reading only its columns and applying the recipe in pandas —
        # exactly how the reference's workers mmap its IPC file
        # (analysis.py:54-59).
        files = reusable_scan_files(df)
        if files is None:
            ckpt = checkpoint_wide(df, config.checkpoint_dir)
            df.unpersist()  # checkpoint written; drop the pre-count cache
            stats_df = spark.read.parquet(ckpt)
            from polars_mas_spark.operators.association import _parquet_files

            stats_files = _parquet_files(ckpt)
        else:
            ckpt = None
            stats_df = df
            stats_files = files
        recipe = build_prep_recipe(stats_df, config, source_files=stats_files)
        results = run_associations(
            stats_df, config, strategy="columnar",
            checkpoint_path=ckpt, recipe=recipe, source_files=files,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        pre = stats_df  # for the shared unpersist below (no-op on scans)
    else:
        # Tall shape: cache the projected input (preprocess collects
        # eager statistics — uncached, every stat job would re-execute
        # the upstream plan), then persist the preprocessed table as the
        # analog of the reference's shared-memory IPC checkpoint
        # (preprocessing.py:111-132) and run the long-table fan-out from
        # it — packed by default, classic unpivot when explicitly asked.
        raw = df.persist(StorageLevel.MEMORY_AND_DISK)
        pre = preprocess(raw, config)
        if config.rint or config.logt:
            # §2.12 dependent-variable transforms, applied AFTER fills
            # and BEFORE the fan-out (the reference declares these CLI
            # flags but never wires them — cli.py:93-103; here they are
            # real). rint = per-dependent two-phase global rank + Blom
            # probit; logt = map-only natural log (non-positive values
            # become NULL and the kernels treat them as missing).
            from polars_mas_spark.functions.transforms import (
                log_transform,
                rint as rint_transform,
            )

            for dep in config.dependent_columns:
                pre = (
                    rint_transform(pre, dep)
                    if config.rint
                    else log_transform(pre, dep)
                )
        pre = pre.persist(StorageLevel.MEMORY_AND_DISK)
        pre.count()  # materialize before the fan-out; frees the raw cache
        raw.unpersist()
        if (
            auto_strategy
            and strategy == "moments"
            and len(config.covariate_columns) > 64
        ):
            # The auto pick above saw the PRE-one-hot covariate count;
            # encoding can expand past the moments cap (O(C^2) aggregate
            # columns) — fall back to the packed kernel instead of
            # letting _fit_linear_moments raise after a full
            # preprocessing pass. (An EXPLICIT strategy='moments' still
            # raises — the user asked for it by name.)
            strategy = "packed"
        results = run_associations(
            pre, config, strategy=strategy,
        ).persist(StorageLevel.MEMORY_AND_DISK)

    # Persist the (small) results table: the correction counts are an
    # action, and without the cache the whole regression fan-out would
    # run twice (once for the count, once for the caller's collect).
    # ONE aggregate job serves both corrections: bonferroni's
    # reference-parity count (non-null, NaN included — failure rows are
    # NaN by _complete_pairs' NULL->NaN restore, so they COUNT, exactly
    # like reference postprocessing.py:18 where polars is_not_null() is
    # True for NaN) and BH's usable count (NaN excluded).
    from pyspark.sql import functions as F

    counts = results.agg(
        F.count(F.when(F.col("pval").isNotNull(), 1)).alias("nn"),
        F.count(
            F.when(F.col("pval").isNotNull() & ~F.isnan(F.col("pval")), 1)
        ).alias("valid"),
    ).first()
    results = bonferroni(results, num_tests=counts["nn"])
    if config.correction == "bh":
        results = benjamini_hochberg(results, num_valid=counts["valid"])
    pre.unpersist()  # results are cached; the wide table is no longer needed
    if phecode_defs is not None:
        results = add_phecode_definitions(
            results, phecode_defs, config.is_phewas, config.is_flipwas
        )
    if output_path is not None:
        # Like the reference, the writer is picked by the output path's
        # suffix (postprocessing.py:33-40); config.output_type is the
        # fallback for suffix-less paths.
        suffix = output_path.rsplit(".", 1)[-1].lower() if "." in output_path else ""
        out_type = suffix if suffix in ("parquet", "csv", "tsv", "txt") else config.output_type
        write_output(results, output_path, out_type)
    return results
