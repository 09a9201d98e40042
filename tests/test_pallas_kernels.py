"""Pallas kernel parity vs the XLA reference ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rmem_tpu.ops.attention import bank_attention


def _run_pallas(q, bk, bv, count, heads, interpret=True):
    from jax.experimental.pallas import tpu as pltpu
    from rmem_tpu.kernels.bank_attention import pallas_bank_attention
    if interpret:
        with pltpu.force_tpu_interpret_mode():
            return pallas_bank_attention(q, bk, bv, count, heads)
    return pallas_bank_attention(q, bk, bv, count, heads)


@pytest.mark.parametrize("heads,dh,dv,lq,lk", [
    (1, 128, 256, 200, 150),
    (2, 32, 32, 130, 128),
])
@pytest.mark.parametrize("n_valid", [1, 3])
def test_pallas_bank_attention_matches_xla(heads, dh, dv, lq, lk, n_valid):
    rng = np.random.RandomState(0)
    s, b = 4, 1
    q = jnp.asarray(rng.randn(b, lq, heads * dh).astype(np.float32))
    bk = jnp.asarray(rng.randn(s, b, lk, heads * dh).astype(np.float32))
    bv = jnp.asarray(rng.randn(s, b, lk, heads * dv).astype(np.float32))
    mask = jnp.arange(s) < n_valid

    ref_out, ref_rec = bank_attention(q, bk, bv, mask, heads,
                                      need_record=True)
    out, rec = _run_pallas(q, bk, bv, jnp.int32(n_valid), heads)

    np.testing.assert_allclose(np.asarray(out), np.asarray(ref_out),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(ref_rec),
                               atol=2e-5)
    # masses over valid slots sum to 1
    np.testing.assert_allclose(np.asarray(rec).sum(-1), 1.0, atol=1e-4)
    assert np.all(np.asarray(rec)[..., n_valid:] < 1e-6)
