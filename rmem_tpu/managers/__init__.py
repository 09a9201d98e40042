from rmem_tpu.managers.evaluator import Evaluator  # noqa: F401
from rmem_tpu.managers.trainer import Trainer  # noqa: F401
