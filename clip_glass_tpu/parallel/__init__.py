from clip_glass_tpu.parallel import distributed  # noqa: F401
from clip_glass_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    population_sharding,
    replicated_sharding,
    shard_state,
)
