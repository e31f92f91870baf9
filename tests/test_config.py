"""Column-role resolution semantics (reference config.py:126-199)."""

import pytest

from polars_mas_spark.config import MASConfig, resolve_columns

COLS = [f"c{i}" for i in range(10)]


def test_resolve_by_name():
    assert resolve_columns("c1,c3", COLS) == ["c1", "c3"]


def test_resolve_by_single_index():
    assert resolve_columns("i:4", COLS) == ["c4"]


def test_resolve_index_range_half_open():
    assert resolve_columns("i:2-5", COLS) == ["c2", "c3", "c4"]


def test_resolve_open_ended_range():
    assert resolve_columns("i:7-", COLS) == ["c7", "c8", "c9"]


def test_resolve_mixed():
    assert resolve_columns("c0,i:8-", COLS) == ["c0", "c8", "c9"]


def test_resolve_list_input():
    assert resolve_columns(["c1", "i:3"], COLS) == ["c1", "c3"]


def test_unknown_column_raises():
    with pytest.raises(ValueError, match="does not exist"):
        resolve_columns("nope", COLS)


def test_index_out_of_range_raises():
    with pytest.raises(ValueError, match="out of range"):
        resolve_columns("i:10", COLS)
    with pytest.raises(ValueError, match="out of range"):
        resolve_columns("i:5-11", COLS)


def test_bad_index_format_raises():
    with pytest.raises(ValueError, match="Invalid index expression"):
        resolve_columns("i:abc", COLS)


def test_role_disjointness_enforced():
    cfg = MASConfig(predictors="c0", dependents="c0", covariates="c2")
    with pytest.raises(ValueError, match="Predictor and dependent"):
        cfg.resolve(COLS)
    cfg = MASConfig(predictors="c0", dependents="c1", covariates="c0")
    with pytest.raises(ValueError, match="Predictor and covariate"):
        cfg.resolve(COLS)
    cfg = MASConfig(
        predictors="c0", dependents="c1", covariates="c2", categorical_covariates="c5"
    )
    with pytest.raises(ValueError, match="subset of covariate"):
        cfg.resolve(COLS)


def test_included_columns_preserve_header_order():
    cfg = MASConfig(predictors="c5", dependents="c1,c3", covariates="c8,c2")
    cfg.resolve(COLS)
    assert cfg.included_columns == ["c1", "c2", "c3", "c5", "c8"]


def test_summary_truncation():
    # dependents must be non-empty since the r9 up-front validation —
    # the summary-truncation subject is the 9-wide predictor list.
    cfg = MASConfig(predictors="i:0-8", dependents="c9", covariates=())
    cfg.resolve(COLS)
    assert "8 columns: c0, c1, ... c6, c7" in cfg.summary()
