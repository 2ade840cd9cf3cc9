from block_lanczos_tpu.parallel.mesh import make_mesh, make_mesh_grid
from block_lanczos_tpu.parallel.distributed import ShardedBlockLanczos


def __getattr__(name):
    # the wide/GF(2) mesh solvers import heavier modules; load lazily
    if name == "ShardedBlockLanczosWide":
        from block_lanczos_tpu.parallel.distributed_wide import \
            ShardedBlockLanczosWide
        return ShardedBlockLanczosWide
    if name == "ShardedBlockLanczosGF2":
        from block_lanczos_tpu.parallel.distributed_gf2 import \
            ShardedBlockLanczosGF2
        return ShardedBlockLanczosGF2
    raise AttributeError(name)


__all__ = ["make_mesh", "make_mesh_grid", "ShardedBlockLanczos",
           "ShardedBlockLanczosWide", "ShardedBlockLanczosGF2"]
