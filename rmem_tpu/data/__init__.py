from rmem_tpu.data.transforms import (  # noqa: F401
    restrict_size,
    normalize_image,
    snap_stride,
)
from rmem_tpu.data.eval_datasets import (  # noqa: F401
    VideoSequence,
    SyntheticEvalDataset,
    VOSTestDataset,
    build_eval_dataset,
)
from rmem_tpu.data.train_datasets import (  # noqa: F401
    SyntheticTrainDataset,
    VOSTrainDataset,
    build_train_dataset,
)
