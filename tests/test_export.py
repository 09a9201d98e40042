"""jax.export serving artifact: serialize the fused step, reload it in a
fresh deserialized form, and check it reproduces the live engine."""

import jax
import jax.numpy as jnp
import numpy as np

from rmem_tpu.config import get_config
from rmem_tpu.tools.export import build_exported


def test_export_roundtrip_matches_live_step():
    hw = (33, 33)
    cfg = get_config("test", model="tiny_deaotl", compute_dtype="float32")
    exported, state, params = build_exported(cfg, hw=hw)

    blob = exported.serialize()
    assert len(blob) > 1000
    reloaded = jax.export.deserialize(blob)

    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.rand(1, *hw, 3), jnp.float32)
    new_state, label = reloaded.call(params, state, img)
    ref_state, ref_label = exported.call(params, state, img)
    np.testing.assert_array_equal(np.asarray(label), np.asarray(ref_label))
    assert label.shape == hw  # merged label (group dim aggregated away)
    # state pytree structure preserved through the artifact
    assert (jax.tree_util.tree_structure(new_state)
            == jax.tree_util.tree_structure(ref_state))
    np.testing.assert_allclose(
        np.asarray(new_state.bank.count), np.asarray(ref_state.bank.count))
