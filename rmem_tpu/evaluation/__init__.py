from rmem_tpu.evaluation.evaluation import Evaluation  # noqa: F401
from rmem_tpu.evaluation.metrics import db_eval_iou, db_statistics  # noqa: F401
