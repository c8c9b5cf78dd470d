from pano_nerf_tpu.parallel.mesh import (  # noqa: F401
    get_mesh, shard_batch, replicate, batch_sharding, replicated_sharding)
