"""The local verifier's driver-path pandas canon must reproduce the two
r4 driver-red failure modes that the fetchall canon could not see
(VERDICT r4 "What's wrong" #1/#2):

1. dtype divergence — DuckDB's uncast HUGEINT window SUM degrades to
   float64 in fetch_df, rendering "32.0" against Spark's int64 "32";
   the canon hashes them DIFFERENTLY even though values are equal.
2. unhashable schema — an array-typed output column makes the driver's
   sort_values/factorize throw TypeError; the canon must throw too so
   the local gate goes red before the driver's does.
"""

import sys
import os

import pandas as pd
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from verify_oracle import pandas_canon_hash  # noqa: E402


def test_int_vs_float_dtype_hashes_differ():
    ints = pd.DataFrame({"k": ["a", "b"], "v": pd.array([32, 7],
                                                        dtype="int64")})
    floats = pd.DataFrame({"k": ["a", "b"], "v": pd.array([32.0, 7.0],
                                                          dtype="float64")})
    assert pandas_canon_hash(ints) != pandas_canon_hash(floats)


def test_equal_frames_hash_equal_regardless_of_row_and_col_order():
    a = pd.DataFrame({"v": [2, 1], "k": ["b", "a"]})
    b = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    assert pandas_canon_hash(a) == pandas_canon_hash(b)


def test_list_typed_column_raises():
    bad = pd.DataFrame({"k": ["a", "a"], "codes": [[1, 2], [3, 4]]})
    with pytest.raises(TypeError):
        pandas_canon_hash(bad)


def test_date_object_matches_datetime64_midnight():
    import datetime
    obj = pd.DataFrame({"d": [datetime.date(2024, 1, 15)]})
    dt64 = pd.DataFrame({"d": pd.to_datetime(["2024-01-15"])})
    assert pandas_canon_hash(obj) == pandas_canon_hash(dt64)
