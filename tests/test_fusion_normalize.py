"""Numeric unit tests ported from the reference's multipart/normalizer specs
(FIXTURES.md §4; reference tests/test_routes/test_multipart_search.py:66-122,
services/search.py:28-74)."""

from __future__ import annotations

import numpy as np
import pytest

from smse_backend_ray.functions.fusion import fuse_parts
from smse_backend_ray.functions.normalize import min_max_normalize, softmax


def test_fusion_multiset_union():
    qtf, _ = fuse_parts(["hash table", "hash value"])
    assert qtf == {"hash": 2, "table": 1, "value": 1}


def test_fusion_single_part():
    qtf, _ = fuse_parts(["alpha beta alpha"])
    assert qtf == {"alpha": 2, "beta": 1}


def test_fusion_empty_rejected():
    # reference: empty parts -> None -> 400 (test_multipart_search.py:97-107)
    with pytest.raises(ValueError):
        fuse_parts([])


def test_fusion_all_invalid_rejected():
    # analog of mismatched/invalid parts -> None (test_multipart_search.py:109-122)
    with pytest.raises(ValueError):
        fuse_parts(["the", "def return", ""])


def test_fusion_skips_empty_parts():
    qtf, _ = fuse_parts(["", "alpha", "the"])
    assert qtf == {"alpha": 1}


def test_fusion_majority_lang_first_wins_ties():
    # reference majority modality: max() over insertion order ties
    # (services/embedding.py:87-92)
    _, maj = fuse_parts(["alpha"], langs=["py", "go", "py"])
    assert maj == "py"
    _, maj = fuse_parts(["alpha"], langs=["go", "py"])  # tie -> first seen
    assert maj == "go"


def test_softmax_stability_and_sum():
    s = softmax(np.array([1000.0, 1000.0, 999.0]))
    assert np.isfinite(s).all() and np.isclose(s.sum(), 1.0)
    assert s[0] == s[1] > s[2]


def test_softmax_empty():
    assert softmax(np.array([])).size == 0


def test_minmax_all_equal_is_ones():
    # services/search.py:54-74 edge case: all-equal -> 1.0
    assert (min_max_normalize(np.array([2.5, 2.5, 2.5])) == 1.0).all()


def test_minmax_range():
    out = min_max_normalize(np.array([1.0, 2.0, 3.0]))
    assert out.tolist() == [0.0, 0.5, 1.0]
