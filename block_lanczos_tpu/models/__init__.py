from block_lanczos_tpu.models.lanczos import BlockLanczos, SolveResult
from block_lanczos_tpu.models.lanczos_gf2 import BlockLanczosGF2
from block_lanczos_tpu.models.lanczos_wide import BlockLanczosWide

__all__ = ["BlockLanczos", "BlockLanczosGF2", "BlockLanczosWide",
           "SolveResult"]
