"""On-device procedural training clips: unbounded synthetic data at zero
host->device cost.

The r4 20k-step run proved the Trainer mechanics but fed it a 16-clip
device-resident pool the model memorizes by ~2k steps (ROUND_NOTES r4
caveat; VERDICT r4 Missing #2/Next #5a). A real dataset cannot be streamed
on this rig (the tunneled H2D link moves ~34-40 MB/s; a 465x465 seq-17
batch is ~44 MB/step at 0.28 s/it = ~157 MB/s), so this module generates
clips ON THE ACCELERATOR under jit from a PRNG key: the host uploads only a
seed, the generator is a trivially cheap fused elementwise graph, and every
step sees a fresh clip — the loss curve stays informative indefinitely.

Clip family mirrors benchmarks/full_train_run._blob_pool (smooth random
background + up to `max_objs` moving colored disks whose coverage masks are
the labels; disks wrap toroidally, later objects overdraw earlier ones)
so curves are comparable with the r4 run. Distribution match, not bitwise:
the host version resizes its background with cv2.INTER_LINEAR, this one
with align_corners=False bilinear.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from rmem_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD


def _gen_clip(key, seq_len: int, hw: Tuple[int, int], max_objs: int):
    """One clip: imgs [T, H, W, 3] normalized f32, labels [T, H, W] int32,
    n_obj scalar int32."""
    from rmem_tpu.ops.resize import resize_bilinear

    h, w = hw
    ks = jax.random.split(key, 7)
    base = jax.random.uniform(ks[0], (1, h // 8 + 2, w // 8 + 2, 3))
    base = resize_bilinear(base, (h, w), align_corners=False)[0] * 255.0
    n_obj = jax.random.randint(ks[1], (), 2, max_objs + 1)
    cy = jax.random.uniform(ks[2], (max_objs,)) * h
    cx = jax.random.uniform(ks[3], (max_objs,)) * w
    vy = jax.random.normal(ks[4], (max_objs,)) * 4.0
    vx = jax.random.normal(ks[5], (max_objs,)) * 4.0
    r = jax.random.randint(ks[6], (max_objs,), 25, 60).astype(jnp.float32)
    yy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ids = jnp.arange(max_objs)
    colors = jnp.stack([40.0 * (ids + 1), 255.0 - 60.0 * ids,
                        jnp.full((max_objs,), 128.0)], axis=-1)  # [O, 3]

    def frame(t):
        fr, lab = base, jnp.zeros((h, w), jnp.int32)

        def draw(i, carry):
            fr, lab = carry
            py = jnp.mod(cy[i] + vy[i] * t, h)
            px = jnp.mod(cx[i] + vx[i] * t, w)
            m = jnp.logical_and(
                (yy - py) ** 2 + (xx - px) ** 2 < r[i] ** 2, i < n_obj)
            fr = jnp.where(m[..., None], colors[i], fr)
            lab = jnp.where(m, i + 1, lab)
            return fr, lab

        fr, lab = jax.lax.fori_loop(0, max_objs, draw, (fr, lab))
        fr = (fr / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return fr.astype(jnp.float32), lab

    imgs, labels = jax.lax.map(frame, jnp.arange(seq_len, dtype=jnp.float32))
    return imgs, labels, n_obj


@functools.partial(jax.jit, static_argnames=("batch", "seq_len", "hw",
                                             "max_objs"))
def gen_blob_batch(key, batch: int, seq_len: int, hw: Tuple[int, int],
                   max_objs: int = 3):
    """Trainer-shaped batch dict, generated on device from `key`."""
    keys = jax.random.split(key, batch)
    imgs, labels, n_obj = jax.vmap(
        lambda k: _gen_clip(k, seq_len, hw, max_objs))(keys)
    return {"imgs": imgs, "labels": labels,
            "obj_nums": n_obj.astype(jnp.int32)}


class DeviceGenLoader:
    """Drop-in batch loader (next() -> batch dict) whose batches are
    generated on the accelerator: the feeder thread dispatches one cheap
    fused generation graph per step instead of a ~44 MB upload. Determinism:
    batch i is a pure function of (seed, i), so auto-resume at step k can
    skip ahead and see the identical stream."""

    def __init__(self, batch: int, seq_len: int, hw: Tuple[int, int],
                 max_objs: int = 3, seed: int = 0, start: int = 0):
        self.batch, self.seq_len = batch, seq_len
        self.hw, self.max_objs = tuple(hw), max_objs
        self.seed = seed
        self.i = start

    def __next__(self):
        key = jax.random.fold_in(jax.random.PRNGKey(self.seed), self.i)
        self.i += 1
        return gen_blob_batch(key, self.batch, self.seq_len, self.hw,
                              self.max_objs)

    def close(self):
        pass
