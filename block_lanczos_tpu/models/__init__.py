from block_lanczos_tpu.models.lanczos import BlockLanczos, SolveResult

__all__ = ["BlockLanczos", "SolveResult"]
