from block_lanczos_tpu.ops.gfp import GFp

__all__ = ["GFp"]
