from m2tts_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    replicate_tree,
)
from m2tts_tpu.parallel.partition import (  # noqa: F401
    TP_RULES,
    partition_specs,
    shard_tree,
    tree_shardings,
)
