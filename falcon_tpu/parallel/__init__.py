from .mesh import (  # noqa: F401
    make_mesh,
    multichip_cluster_step,
    shard_rows,
)
