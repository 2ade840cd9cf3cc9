from block_lanczos_tpu.parallel.mesh import make_mesh
from block_lanczos_tpu.parallel.distributed import ShardedBlockLanczos

__all__ = ["make_mesh", "ShardedBlockLanczos"]
