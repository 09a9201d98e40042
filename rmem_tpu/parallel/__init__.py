from rmem_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    make_parallel_train_step,
)
