"""Host->device transfer helpers for tunneled TPUs.

The axon tunnel's host->device bandwidth degrades sharply for single
transfers beyond ~64 MB (measured: ~35 MB/s at 32-64 MB, ~9 MB/s at
128 MB, ~1 MB/s at 256 MB); splitting a large array into row slabs and
concatenating on device keeps the effective rate at the plateau.
"""

from typing import Optional

import numpy as np

_MAX_BYTES = 32 * 2**20


def device_put_chunked(array: np.ndarray, max_bytes: int = _MAX_BYTES):
    """Upload ``array`` in row slabs of at most ``max_bytes`` each."""
    import jax
    import jax.numpy as jnp

    nbytes = array.nbytes
    if nbytes <= max_bytes or array.ndim == 0 or array.shape[0] < 2:
        return jnp.asarray(array)
    rows = len(array)
    rows_per = max(1, int(rows * max_bytes / nbytes))
    slabs = [
        jax.device_put(array[r0:r0 + rows_per])
        for r0 in range(0, rows, rows_per)
    ]
    return jnp.concatenate(slabs, axis=0)
