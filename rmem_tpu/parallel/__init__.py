from rmem_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    make_parallel_train_step,
)
from rmem_tpu.parallel.tp import (  # noqa: F401
    spec_for_param,
    state_shardings,
)
from rmem_tpu.parallel.eval_sharding import (  # noqa: F401
    allreduce_stats,
    host_sequence_indices,
    maybe_initialize_distributed,
)
