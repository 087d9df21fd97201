"""Multi-chip parallelism: device meshes, ray/patch sharding, SPMD steps."""
from .sharding import (  # noqa: F401
    ray_device_mesh,
    shard_rays,
    replicate,
    render_sharded,
    make_sharded_train_step,
)
from .patch_parallel import intersect_rays_patch_sharded  # noqa: F401
