"""Adversarial tests of the comparator itself.

The repo's entire correctness story rides on compare_frames: a
comparator that silently passes wrong results would greenwash every
oracle-parity test and every precert sweep. These tests feed it
deliberately corrupted pairs and assert it REPORTS each corruption,
plus the canonicalization cases that must still pass (row order,
column order, NaN/None unification on float columns).

No Spark session needed -- compare_frames is pure pandas.
"""

import numpy as np
import pandas as pd

from tests.oracle_utils import compare_frames


def _base():
    return pd.DataFrame(
        {
            "k": [1, 2, 3],
            "name": ["a", "b", "c"],
            "total": [1.5, 2.5, 3.5],
        }
    )


def test_identical_frames_pass():
    assert compare_frames(_base(), _base()) == []


def test_row_order_and_column_order_are_canonicalized():
    shuffled = _base().iloc[[2, 0, 1]][["total", "k", "name"]]
    assert compare_frames(_base(), shuffled) == []


def test_value_flip_is_caught():
    bad = _base()
    bad.loc[1, "total"] = 2.500001
    assert compare_frames(_base(), bad)


def test_string_flip_is_caught():
    bad = _base()
    bad.loc[0, "name"] = "A"
    assert compare_frames(_base(), bad)


def test_missing_row_is_caught():
    probs = compare_frames(_base(), _base().iloc[:2])
    assert any("row count" in p for p in probs)


def test_duplicated_row_masking_another_is_caught():
    # same row COUNT, different multiset: row 0 duplicated, row 2 gone
    bad = _base().iloc[[0, 0, 1]].reset_index(drop=True)
    assert compare_frames(_base(), bad)


def test_renamed_column_is_caught():
    probs = compare_frames(_base(), _base().rename(columns={"total": "sum"}))
    assert any("column names" in p for p in probs)


def test_dtype_family_drift_is_caught():
    bad = _base()
    bad["k"] = bad["k"].astype("float64")  # int column arriving as float
    probs = compare_frames(_base(), bad)
    assert any("dtype family" in p for p in probs)


def test_null_vs_value_is_caught():
    good = pd.DataFrame({"k": [1, 2], "v": pd.array([10, None], dtype="Int64")})
    bad = pd.DataFrame({"k": [1, 2], "v": pd.array([10, 0], dtype="Int64")})
    assert compare_frames(good, bad)


def test_null_unification_is_float64_only_and_object_none_stays_loud():
    # The ACTUAL comparator contract (the previous form of this test
    # compared two bit-identical NaN frames -- vacuous): SQL NULLs
    # unify because the driver canonicalizes nullable columns to
    # float64, where NULL IS NaN on both sides...
    a = pd.DataFrame(
        {"k": [1, 2], "v": pd.array([10, None], dtype="Int64").astype("float64")}
    )
    b = pd.DataFrame({"k": [1, 2], "v": [10.0, float("nan")]})
    assert compare_frames(a, b) == []
    # ...while an OBJECT-dtype None column (un-canonicalized input) is
    # a dtype-family mismatch reported loudly, never silently unified
    c = pd.DataFrame({"k": [1, 2], "v": pd.array([10.0, None], dtype=object)})
    probs = compare_frames(c, b)
    assert any("dtype family" in p for p in probs), probs


def test_negative_zero_vs_zero_is_distinguished():
    # repr-based float canon: -0.0 and 0.0 are DIFFERENT cells; an
    # operator that flips the sign of zero must not silently pass
    a = pd.DataFrame({"v": [0.0]})
    b = pd.DataFrame({"v": [-0.0]})
    assert compare_frames(a, b)


def test_get_spark_rejects_invalid_cpus_loudly():
    """A negative or non-numeric cpus spec must raise the documented
    ValueError here, not fall through to a cryptic 'Could not parse
    Master URL' after shuffle partitions were sized off the machine."""
    import pytest

    from dgraph_etl_spark.session import get_spark

    for bad in (-4, "0", "4x"):
        with pytest.raises(ValueError, match="cpus must be"):
            get_spark(cpus=bad)


def test_get_spark_rejects_malformed_extra_conf_loudly():
    """A SPARK_GRAFT_EXTRA_CONF entry without '=' (or with an empty
    key) must raise the documented ValueError naming the entry --
    silently dropping it would let a soak run believe e.g. periodic
    shuffle GC was active while the disk quietly fills."""
    import pytest

    from dgraph_etl_spark.session import get_spark

    for bad in ("novalue", "=v", " = v", "a=1;junk"):
        monkey = {"SPARK_GRAFT_EXTRA_CONF": bad}
        import os
        from unittest import mock

        with mock.patch.dict(os.environ, monkey):
            with pytest.raises(ValueError, match="not key=value"):
                get_spark(cpus=1)
