"""Histogram methods agree and match numpy; dose accumulation semantics."""

import jax.numpy as jnp
import numpy as np
import pytest

from uvtrace.ops.accumulate import accumulate_dose, hit_counts


@pytest.mark.parametrize("method", ["sort", "segment", "onehot"])
def test_hit_counts_matches_numpy(method, rng):
    ids = rng.integers(-1, 50, size=5000).astype(np.int32)
    got = np.asarray(hit_counts(jnp.asarray(ids), 50, method))
    want = np.bincount(ids[ids >= 0], minlength=50)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("method", ["sort", "segment", "onehot"])
def test_hit_counts_all_miss(method):
    ids = jnp.full((256,), -1, jnp.int32)
    assert int(hit_counts(ids, 10, method).sum()) == 0


def test_accumulate_dose_semantics():
    """cl/accumulate.cl:4-14: photon += counts*dt; max = max(max, counts)."""
    pm = jnp.zeros(4)
    mx = jnp.zeros(4)
    c1 = jnp.array([1, 0, 5, 2], jnp.int32)
    pm, mx = accumulate_dose(pm, mx, c1, 60.0)
    np.testing.assert_allclose(np.asarray(pm), [60, 0, 300, 120])
    np.testing.assert_allclose(np.asarray(mx), [1, 0, 5, 2])
    c2 = jnp.array([0, 3, 2, 2], jnp.int32)
    pm, mx = accumulate_dose(pm, mx, c2, 30.0)
    np.testing.assert_allclose(np.asarray(pm), [60, 90, 360, 180])
    np.testing.assert_allclose(np.asarray(mx), [1, 3, 5, 2])


def test_conservation(rng):
    """Sum of counts == number of hitting rays (dose conservation,
    SURVEY.md §4 property test)."""
    ids = rng.integers(-1, 200, size=10000).astype(np.int32)
    counts = np.asarray(hit_counts(jnp.asarray(ids), 200, "sort"))
    assert counts.sum() == (ids >= 0).sum()
