from phylonium_tpu.parallel.mesh import make_mesh  # noqa: F401
from phylonium_tpu.parallel.distributed import (  # noqa: F401
    pair_counts_sharded,
)
