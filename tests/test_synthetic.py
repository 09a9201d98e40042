"""On-device procedural clip generator (rmem_tpu.data.synthetic): trainer
batch contract, determinism (resume regenerates the same stream), and
non-degenerate variety across steps (VERDICT r4 Next #5a)."""

import jax
import jax.numpy as jnp
import numpy as np

from rmem_tpu.data.synthetic import DeviceGenLoader, gen_blob_batch


def test_gen_blob_batch_contract():
    b = gen_blob_batch(jax.random.PRNGKey(0), 2, 3, (65, 97))
    assert b["imgs"].shape == (2, 3, 65, 97, 3)
    assert b["imgs"].dtype == jnp.float32
    assert b["labels"].shape == (2, 3, 65, 97)
    assert b["labels"].dtype == jnp.int32
    assert b["obj_nums"].shape == (2,)
    imgs = np.asarray(b["imgs"])
    labs = np.asarray(b["labels"])
    nobj = np.asarray(b["obj_nums"])
    assert np.isfinite(imgs).all()
    assert ((nobj >= 2) & (nobj <= 3)).all()
    for i in range(2):
        assert labs[i].min() == 0
        assert labs[i].max() <= nobj[i]
        # disks actually cover pixels on every frame
        assert (labs[i] > 0).reshape(3, -1).any(axis=1).all()
    # objects move between frames
    assert (labs[:, 0] != labs[:, 1]).any()


def test_device_gen_loader_deterministic_stream():
    a0 = next(DeviceGenLoader(1, 2, (33, 49), seed=5))
    l = DeviceGenLoader(1, 2, (33, 49), seed=5)
    b0, b1 = next(l), next(l)
    np.testing.assert_array_equal(np.asarray(a0["imgs"]),
                                  np.asarray(b0["imgs"]))
    # resume-style skip-ahead sees the identical stream
    c1 = next(DeviceGenLoader(1, 2, (33, 49), seed=5, start=1))
    np.testing.assert_array_equal(np.asarray(b1["labels"]),
                                  np.asarray(c1["labels"]))
    # successive steps differ (unbounded variety, not a cycling pool)
    assert (np.asarray(b0["imgs"]) != np.asarray(b1["imgs"])).any()
    assert (np.asarray(b0["labels"]) != np.asarray(b1["labels"])).any()
