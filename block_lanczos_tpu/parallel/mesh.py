"""Device mesh construction.

The reference builds an MPI_Dims_create 2D process grid with row/column
communicators (reference: mpi/lanczos_modp.c:505-566).  The TPU equivalent
is a jax.sharding.Mesh; v1 uses a 1D "rows" axis (the matrix is partitioned
by kernel-dimension bands and the vector block is band-sharded), which
needs only ONE collective per SpMV — an exact psum — instead of the
reference's scatter/compute/reduce/gather dance.
"""

from __future__ import annotations

import jax
import numpy as np

ROWS_AXIS = "rows"


def make_mesh(n_devices: int | None = None, axis: str = ROWS_AXIS) -> jax.sharding.Mesh:
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    if n_devices > len(devices):
        raise ValueError(
            f"requested {n_devices} devices, only {len(devices)} available")
    return jax.sharding.Mesh(np.array(devices[:n_devices]), (axis,))
