"""Properties of the oracle harness's chunk-streamed digest mode: the
commutative row-hash must be order- and chunking-invariant, detect any
single-value change, and track int/float dtype-family drift."""

import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tests")

from oracle_check import _digest_chunks


def test_digest_order_and_chunk_invariant():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    b = pd.DataFrame({"x": [3, 1, 2], "y": ["c", "a", "b"]})
    rows_a, cols_a, _, dig_a = _digest_chunks(iter([a]))
    rows_b, _, _, dig_b = _digest_chunks(iter([b]))
    assert (rows_a, dig_a) == (rows_b, dig_b)
    rows_c, _, _, dig_c = _digest_chunks(iter([a.iloc[:1], a.iloc[1:]]))
    assert (rows_c, dig_c) == (rows_a, dig_a)
    assert cols_a == ["x", "y"]


def test_digest_detects_value_change():
    a = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "c"]})
    c = pd.DataFrame({"x": [1, 2, 3], "y": ["a", "b", "Z"]})
    assert _digest_chunks(iter([a]))[3] != _digest_chunks(iter([c]))[3]


def test_digest_flags_dtype_family():
    a = pd.DataFrame({"x": [1, 2, 3]})
    f = pd.DataFrame({"x": [1.0, 2.0, 3.0]})
    assert _digest_chunks(iter([a]))[2] == {"x": "i"}
    assert _digest_chunks(iter([f]))[2] == {"x": "f"}


def test_digest_nulls_and_floats():
    import numpy as np

    a = pd.DataFrame({"x": [1.5, np.nan], "s": ["a", None]})
    b = pd.DataFrame({"x": [np.nan, 1.5], "s": [None, "a"]})
    assert _digest_chunks(iter([a]))[3] == _digest_chunks(iter([b]))[3]
