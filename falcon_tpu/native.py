"""ctypes bindings for the first-party native host library.

``native/falcon_native.cc`` provides the sequential host-side algorithms
that have no efficient TPU mapping (SURVEY.md §2.3): nearest-neighbor-chain
agglomerative linkage (replacing fastcluster), distance-threshold tree cuts
(replacing ``scipy.cluster.hierarchy.fcluster``), and union-find connected
components for density clustering.

The shared library is built on demand with ``make -C native`` on first use;
if the toolchain is unavailable, a SciPy fallback keeps the pipeline
functional (used only as a fallback — the native path is the product).
"""

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

logger = logging.getLogger("falcon_tpu")

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libfalcon_native.so")

_METHODS = {"single": 0, "complete": 1, "average": 2}

_lib = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True,
            capture_output=True,
        )
        return True
    except (OSError, subprocess.CalledProcessError) as e:
        logger.warning("Could not build native library: %s", e)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if necessary) the native library, or None."""
    global _lib
    if _lib is not None:
        return _lib or None
    with _lib_lock:
        if _lib is not None:
            return _lib or None
        if not os.path.isfile(_LIB_PATH) and not _build():
            _lib = False
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fc_linkage.restype = ctypes.c_int
        lib.fc_linkage.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_int, ctypes.POINTER(ctypes.c_double),
        ]
        lib.fc_fcluster.restype = ctypes.c_int64
        lib.fc_fcluster.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
        ]
        lib.fc_connected_components.restype = ctypes.c_int64
        lib.fc_connected_components.argtypes = [
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return lib


def _as_double_ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _n_from_condensed(m: int) -> int:
    n = int(round((1 + np.sqrt(1 + 8 * m)) / 2))
    if n * (n - 1) // 2 != m:
        raise ValueError(f"invalid condensed matrix length {m}")
    return n


def linkage(condensed: np.ndarray, method: str) -> np.ndarray:
    """Agglomerative linkage on a condensed distance matrix.

    Returns the (n-1, 4) scipy-format linkage (rows sorted by distance).
    Reference behavior: ``fastcluster.linkage(pdist, linkage)``
    (``falcon/cluster/cluster.py:285``).
    """
    if method not in _METHODS:
        raise ValueError(f"unsupported linkage method {method!r}")
    n = _n_from_condensed(len(condensed))
    lib = get_lib()
    if lib is None:
        import scipy.cluster.hierarchy as sch

        return sch.linkage(condensed, method)
    work = np.ascontiguousarray(condensed, np.float64).copy()
    z = np.empty((n - 1, 4), np.float64)
    rc = lib.fc_linkage(
        _as_double_ptr(work), ctypes.c_int64(n),
        ctypes.c_int(_METHODS[method]), _as_double_ptr(z),
    )
    if rc != 0:
        raise RuntimeError(f"fc_linkage failed with code {rc}")
    return z


def fcluster(z: np.ndarray, t: float, n: Optional[int] = None) -> np.ndarray:
    """Flat clusters from a linkage via a distance-threshold cut.

    0-based labels grouped exactly as scipy's
    ``fcluster(Z, t, "distance")`` for monotone linkages (reference call
    sites ``falcon/cluster/cluster.py:283-290, 413-421``; the reference
    subtracts 1 from scipy's 1-based labels).
    """
    if n is None:
        n = z.shape[0] + 1
    lib = get_lib()
    if lib is None:
        import scipy.cluster.hierarchy as sch

        return (sch.fcluster(z, t, "distance") - 1).astype(np.int32)
    z = np.ascontiguousarray(z, np.float64)
    labels = np.empty(n, np.int32)
    k = lib.fc_fcluster(
        _as_double_ptr(z), ctypes.c_int64(n), ctypes.c_double(t),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if k < 0:
        raise RuntimeError("fc_fcluster failed")
    return labels


def connected_components(
    u: np.ndarray, v: np.ndarray, n_nodes: int
) -> Tuple[np.ndarray, int]:
    """Connected components over an undirected edge list.

    Returns (labels, n_components); labels numbered by first occurrence.
    """
    u = np.ascontiguousarray(u, np.int64)
    v = np.ascontiguousarray(v, np.int64)
    lib = get_lib()
    if lib is None:
        import scipy.sparse as ss
        import scipy.sparse.csgraph as csgraph

        graph = ss.coo_matrix(
            (np.ones(len(u), np.int8), (u, v)), shape=(n_nodes, n_nodes)
        )
        k, raw = csgraph.connected_components(graph, directed=False)
        # Renumber by first occurrence for determinism.
        _, first = np.unique(raw, return_index=True)
        remap = np.empty(k, np.int32)
        remap[raw[np.sort(first)]] = np.arange(k, dtype=np.int32)
        return remap[raw], k
    labels = np.empty(n_nodes, np.int32)
    k = lib.fc_connected_components(
        u.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(u)), ctypes.c_int64(n_nodes),
        labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if k < 0:
        raise RuntimeError("fc_connected_components failed")
    return labels, int(k)
