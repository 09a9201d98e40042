from rmem_tpu.memory.bank import (  # noqa: F401
    MemoryBank,
    ShortTermMemory,
    init_bank,
    bank_append,
    bank_compact,
    valid_slot_mask,
)
from rmem_tpu.memory.eviction import (  # noqa: F401
    evict_if_full,
    update_bank_inplace,
)
