from rmem_tpu.kernels.bank_attention import pallas_bank_attention  # noqa: F401
