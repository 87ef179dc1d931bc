"""Unit tests for the MSM routing observability accounting (fast tier).

The integration path (stats sown from ``_dynamic_test_mask``) is covered by
tests/test_dynamic_inference.py::test_routing_stats_sown.
"""

import numpy as np
import jax.numpy as jnp

from dynamask_tpu.models.dynamask_roi_head import routing_clip_stats


def test_histogram_and_demand():
    need = jnp.asarray([0, 0, 1, 2, 3, 3, 3, 1])
    s = routing_clip_stats(need, caps=(8, 4, 2, 1))
    np.testing.assert_array_equal(np.asarray(s['hist']), [2, 2, 1, 3])
    # demand >= stage j: 6 want >=28, 4 want >=56, 3 want 112
    np.testing.assert_array_equal(np.asarray(s['demand']), [6, 4, 3])
    np.testing.assert_array_equal(np.asarray(s['capacity']), [4, 2, 1])
    # clipped = demand - capacity, floored at 0
    np.testing.assert_array_equal(np.asarray(s['clipped']), [2, 2, 2])


def test_no_clip_when_capacity_covers_demand():
    need = jnp.asarray([0, 0, 0, 1])
    s = routing_clip_stats(need, caps=(4, 2, 1, 1))
    np.testing.assert_array_equal(np.asarray(s['clipped']), [0, 0, 0])
    assert int(np.asarray(s['hist']).sum()) == 4


def test_accepts_batched_need():
    need = jnp.zeros((2, 5), jnp.int32)
    s = routing_clip_stats(need, caps=(10, 5, 2, 1))
    assert int(np.asarray(s['hist'])[0]) == 10
