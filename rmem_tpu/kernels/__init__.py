from rmem_tpu.kernels.bank_attention import pallas_bank_attention  # noqa: F401
from rmem_tpu.kernels.local_attention import pallas_local_attention  # noqa: F401,E501
from rmem_tpu.kernels.stem import pallas_stem  # noqa: F401
