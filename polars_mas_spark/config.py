"""MAS configuration and column-role resolution.

Re-expresses the reference's config surface
(/root/reference/src/polars_mas/config.py:16-270) for Spark: a single
wide table whose columns are partitioned by role into predictors,
dependents, covariates, and categorical covariates. Columns may be
referenced by name or by 0-based index expressions (``i:5``, ``i:5-10``,
``i:5-``) exactly as the reference documents (README.md:114-129).

This module is pure Python (no Spark import) so it is unit-testable
without a session; resolution happens against an explicit column list.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Literal, Sequence

Model = Literal["firth", "logistic", "linear", "poisson"]
MissingStrategy = Literal[
    "fail", "drop", "forward", "backward", "min", "max", "mean", "zero", "one"
]

ColumnsSpec = "str | Sequence[str] | None"


def _as_spec_list(spec: str | Sequence[str] | None) -> list[str]:
    if spec is None:
        return []
    if isinstance(spec, str):
        return [s for s in spec.split(",") if s != ""]
    return list(spec)


def resolve_columns(
    spec: str | Sequence[str] | None, column_names: Sequence[str]
) -> list[str]:
    """Resolve a column spec (names and/or ``i:`` index expressions) against
    the table header. Reference semantics: config.py:133-178 — ``i:A-B`` is
    a half-open 0-based range [A, B), ``i:A-`` runs to the end."""
    total = len(column_names)
    out: list[str] = []
    for item in _as_spec_list(spec):
        if item.startswith("i:"):
            expr = item[2:]
            if expr.isdigit():
                idx = int(expr)
                if idx >= total:
                    raise ValueError(
                        f"Index {idx} out of range for {total} columns"
                    )
                out.append(column_names[idx])
            elif "-" in expr:
                start_s, _, end_s = expr.partition("-")
                try:
                    start = int(start_s)
                    end = int(end_s) if end_s else total
                except ValueError:
                    raise ValueError(
                        f"Invalid index expression {item!r}; "
                        "use i:<index>, i:<start>-<end>, or i:<start>-"
                    ) from None
                if start >= total:
                    raise ValueError(
                        f"Start index {start} out of range for {total} columns"
                    )
                if end > total:
                    raise ValueError(
                        f"End index {end} out of range for {total} columns; "
                        f"use {start}- for all remaining columns"
                    )
                if end <= start:
                    # A reversed range would silently resolve to ZERO
                    # columns — e.g. a typo'd covariate spec running the
                    # whole analysis unadjusted.
                    raise ValueError(
                        f"Empty index range {item!r} (end {end} <= start "
                        f"{start}) resolves to no columns"
                    )
                out.extend(column_names[start:end])
            else:
                raise ValueError(
                    f"Invalid index expression {item!r}; "
                    "use i:<index>, i:<start>-<end>, or i:<start>-"
                )
        else:
            if item not in column_names:
                raise ValueError(f"Column {item!r} does not exist in the input")
            out.append(item)
    return out


@dataclass
class MASConfig:
    """Configuration for one Multiple Association Study run.

    Mirrors the reference CLI surface (cli.py:5-163) and its derived
    column-role state (config.py:59-63), with Spark-specific additions
    (``order_col`` for deterministic forward/backward fill — Spark tables
    have no inherent row order, see SURVEY.md §2.5 F3/F4).
    """

    predictors: str | Sequence[str] = ()
    dependents: str | Sequence[str] = ()
    covariates: str | Sequence[str] = ()
    categorical_covariates: str | Sequence[str] = ()

    null_values: str | Sequence[str] | None = None
    model: Model = "firth"
    min_case_count: int = 20
    missing_covariate_values: MissingStrategy = "fail"
    quantitative: bool = False
    rint: bool = False
    logt: bool = False
    is_phewas: bool = False
    is_flipwas: bool = False
    sex_col: str = "sex"
    female_code: int = 1
    male_only: bool = False
    female_only: bool = False
    output_type: Literal["parquet", "csv", "tsv", "txt"] = "csv"
    # Multiple-testing correction. The reference hardcodes bonferroni and
    # silently returns None for anything else (postprocessing.py:15, a
    # latent bug); "bh" implements its declared-but-unbuilt FDR roadmap
    # item (README.md:159,169) as window functions.
    correction: Literal["bonferroni", "bh"] = "bonferroni"
    # Spark-specific: explicit row-order column for forward/backward fill.
    order_col: str | None = None
    # Spark-specific: directory for the columnar fan-out's parquet
    # checkpoint (the analog of the reference's IPC temp file,
    # preprocessing.py:111-132). None = system temp dir, auto-cleaned.
    # On a multi-node cluster this must be shared storage.
    checkpoint_dir: str | None = None
    # Spark-specific extension: drop covariates whose pairwise |Pearson
    # r| with an earlier-kept covariate exceeds this threshold, BEFORE
    # the fan-out (preprocessing.drop_correlated_covariates). None =
    # off (reference behavior: a collinear design is only discovered
    # per-fit by the kernel's singularity validation).
    drop_correlated_above: float | None = None
    # Sex-specific phecode restriction (the reference's dead code at
    # constants.py:14-16; R PheWAS semantics): dependent column ->
    # required value of the ``sex_col`` covariate. Restricted dependents
    # are fitted only on matching-sex rows. Build from phecode
    # definitions with postprocessing.sex_restrictions_from_defs.
    sex_restrictions: dict | None = None

    # Resolved state (populated by `resolve`).
    column_names: list[str] = field(default_factory=list, init=False)
    predictor_columns: list[str] = field(default_factory=list, init=False)
    dependent_columns: list[str] = field(default_factory=list, init=False)
    covariate_columns: list[str] = field(default_factory=list, init=False)
    categorical_covariate_columns: list[str] = field(default_factory=list, init=False)
    included_columns: list[str] = field(default_factory=list, init=False)

    @property
    def null_value_tokens(self) -> list[str]:
        return _as_spec_list(self.null_values)

    def resolve(self, column_names: Sequence[str]) -> "MASConfig":
        """Resolve role specs against a concrete table header and enforce
        role disjointness (reference config.py:180-199)."""
        self.column_names = list(column_names)
        self.predictor_columns = resolve_columns(self.predictors, column_names)
        self.dependent_columns = resolve_columns(self.dependents, column_names)
        self.covariate_columns = resolve_columns(self.covariates, column_names)
        self.categorical_covariate_columns = resolve_columns(
            self.categorical_covariates, column_names
        )
        # Fail here with a named error, not deep in the engine: an empty
        # role list survives every downstream step until a packed bucket
        # count of zero raises an opaque `range() arg 3 must not be
        # zero` (review r9).
        if not self.predictor_columns:
            raise ValueError(
                "no predictor columns resolved — pass at least one via "
                "predictors / -p"
            )
        if not self.dependent_columns:
            raise ValueError(
                "no dependent columns resolved — pass at least one via "
                "dependents / -d"
            )

        if self.model == "poisson" and not self.quantitative:
            raise ValueError(
                "Poisson models fit COUNT dependents: set "
                "quantitative=True (-qt). Binary case/control "
                "validation does not apply to counts."
            )
        if self.rint and self.logt:
            # Mirrors the reference CLI's mutually exclusive group
            # (cli.py:93-103) for the programmatic path too.
            raise ValueError("rint and logt are mutually exclusive")
        if (self.rint or self.logt) and not self.quantitative:
            raise ValueError(
                "rint/logt transform QUANTITATIVE dependent variables — "
                "set quantitative=True (-qt); transforming binary "
                "case/control labels is meaningless"
            )
        preds = set(self.predictor_columns)
        deps = set(self.dependent_columns)
        covs = set(self.covariate_columns)
        cats = set(self.categorical_covariate_columns)
        if preds & deps:
            raise ValueError("Predictor and dependent columns must be unique")
        if preds & covs:
            raise ValueError("Predictor and covariate columns must be unique")
        if deps & covs:
            raise ValueError("Dependent and covariate columns must be unique")
        if cats - covs:
            # A TRUE subset check (the reference only tests a non-empty
            # intersection, config.py:193-196): a categorical name
            # outside the covariates — e.g. the predictor — would be
            # one-hot encoded and DROPPED from the table, corrupting the
            # design before the fan-out even starts.
            raise ValueError(
                "Categorical covariate columns must be a subset of "
                f"covariate columns; not covariates: {sorted(cats - covs)}"
            )
        if self.male_only and self.female_only:
            raise ValueError(
                "male_only and female_only are mutually exclusive (the "
                "CLI enforces this; the Python API must too — the two "
                "flags select opposite cohorts)."
            )

        if self.sex_restrictions and self.sex_col not in covs:
            raise ValueError(
                "sex_restrictions requires the sex column "
                f"'{self.sex_col}' to be among the covariates."
            )

        included = preds | deps | covs
        # Preserve the header order of the input (config.py:198-199).
        self.included_columns = [c for c in column_names if c in included]
        if self.order_col:
            # Same up-front contract as every other column spec: a
            # misspelled order_col previously skipped the append
            # silently and died later inside the fill operator with an
            # unresolved-column error (review r9).
            if self.order_col not in column_names:
                raise ValueError(
                    f"order_col '{self.order_col}' does not exist in the "
                    "input"
                )
            if self.order_col not in self.included_columns:
                self.included_columns.append(self.order_col)
        return self

    def summary(self) -> str:
        def fmt(cols: list[str], max_display: int = 5) -> str:
            n = len(cols)
            if n == 0:
                return "(none)"
            if n <= max_display:
                return f"{n} column{'s' if n != 1 else ''}: {', '.join(cols)}"
            return f"{n} columns: {cols[0]}, {cols[1]}, ... {cols[-2]}, {cols[-1]}"

        return (
            "MAS configuration:\n"
            f"  model: {self.model}\n"
            f"  predictors: {fmt(self.predictor_columns)}\n"
            f"  dependents: {fmt(self.dependent_columns)}\n"
            f"  covariates: {fmt(self.covariate_columns)}\n"
            f"  categorical covariates: {fmt(self.categorical_covariate_columns)}\n"
            f"  missing-covariate strategy: {self.missing_covariate_values}\n"
            f"  quantitative: {self.quantitative}"
        )
