from rmem_tpu.engine.inference import (  # noqa: F401
    EngineState,
    InferenceEngine,
    separate_mask,
    soft_logit_aggregation,
)
