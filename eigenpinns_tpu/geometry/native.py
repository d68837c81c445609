"""ctypes bindings for the native geometry kernels (csrc/).

Loads `_native.so` (built by `make -C csrc`) and exposes drop-in
replacements for the hot host-side preprocessing loops. Every entry point
degrades gracefully: when the library is missing the pure-Python
implementations are used, so the framework never hard-depends on the
native build.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_LIB_TRIED = False


def _try_build() -> None:
    """One-shot automatic build: the .so is a build artifact that does
    not survive fresh checkouts, and a silent fallback to the Python
    paths costs minutes at 300k-1M nodes. Opt out with
    EIGENPINNS_NO_NATIVE_BUILD=1.

    The build targets a process-unique temp name and os.replace()s it
    into place: concurrent interpreters (the examples-smoke subprocess
    matrix on a fresh checkout) each produce a complete .so and the
    rename is atomic, so no process can dlopen a half-written file.
    A failed build warns with the compiler's stderr instead of silently
    handing callers the multi-minute Python paths."""
    if os.environ.get("EIGENPINNS_NO_NATIVE_BUILD"):
        return
    csrc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "csrc")
    if not os.path.exists(os.path.join(csrc, "Makefile")):
        return
    import subprocess
    import warnings

    final = os.path.join(os.path.dirname(__file__), "_native.so")
    tmp = f"{final}.build{os.getpid()}"
    try:
        proc = subprocess.run(["make", "-C", csrc, f"TARGET={tmp}"],
                              capture_output=True, timeout=120,
                              check=False, text=True)
        if proc.returncode == 0 and os.path.exists(tmp):
            os.replace(tmp, final)
        else:
            warnings.warn(
                "native geometry kernel build failed (falling back to "
                "the slow Python paths); make stderr:\n"
                f"{proc.stderr.strip()[-2000:]}", stacklevel=2)
    except Exception as e:  # pragma: no cover - timeout/missing make
        warnings.warn(
            f"native geometry kernel build errored ({type(e).__name__}: "
            f"{e}); falling back to the slow Python paths", stacklevel=2)
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def _bind(path):
    lib = ctypes.CDLL(path)
    c_d = ctypes.POINTER(ctypes.c_double)
    c_i = ctypes.POINTER(ctypes.c_int64)
    lib.epk_knn.restype = ctypes.c_int
    lib.epk_knn.argtypes = [c_d, ctypes.c_int64, ctypes.c_int64, c_i]
    lib.epk_fps.restype = ctypes.c_int
    lib.epk_fps.argtypes = [c_d, ctypes.c_int64, ctypes.c_int64,
                            ctypes.c_int64, c_i]
    lib.epk_local_triangulations_v2.restype = ctypes.c_int64
    lib.epk_local_triangulations_v2.argtypes = [
        c_d, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, c_i]
    lib.epk_delaunay_flips.restype = ctypes.c_int64
    lib.epk_delaunay_flips.argtypes = [
        c_d, ctypes.c_int64, c_i, c_d, c_d,
        ctypes.c_int64, ctypes.c_int64]
    return lib


def load_native():
    """The loaded CDLL or None (cached)."""
    global _LIB, _LIB_TRIED
    if _LIB_TRIED:
        return _LIB
    _LIB_TRIED = True
    path = os.path.join(os.path.dirname(__file__), "_native.so")
    if not os.path.exists(path):
        _try_build()
    if not os.path.exists(path):
        return None
    try:
        _LIB = _bind(path)
    except AttributeError:
        # Stale build artifact from an older checkout (missing a newer
        # entry point — ctypes raises AttributeError, not OSError):
        # rebuild once and retry before giving up.
        try:
            os.remove(path)
        except OSError:
            pass
        _try_build()
        try:
            _LIB = _bind(path) if os.path.exists(path) else None
        except (OSError, AttributeError):
            _LIB = None
    except OSError:
        _LIB = None
    return _LIB


def available() -> bool:
    return load_native() is not None


def _ptr_d(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _ptr_i(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def knn_native(points: np.ndarray, k: int) -> np.ndarray:
    """(n, k) nearest-neighbor indices (self excluded)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    out = np.empty((n, k), dtype=np.int64)
    rc = lib.epk_knn(_ptr_d(pts), n, k, _ptr_i(out))
    if rc != 0:
        raise ValueError(f"epk_knn failed (rc={rc}); k >= n?")
    return out


def fps_native(points: np.ndarray, n_samples: int,
               start: int = 0) -> np.ndarray:
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    out = np.empty(n_samples, dtype=np.int64)
    rc = lib.epk_fps(_ptr_d(pts), pts.shape[0], n_samples, start,
                     _ptr_i(out))
    if rc != 0:
        raise ValueError(f"epk_fps failed (rc={rc})")
    return out


def local_triangulations_native(points: np.ndarray,
                                n_neighbors: int = 30,
                                frame_neighbors: int | None = None,
                                ) -> np.ndarray:
    """Raw one-ring triangle soup (T, 3), NOT deduplicated — callers
    dedup/count exactly like the Python path. ``frame_neighbors``
    sizes the PCA tangent-frame neighborhood independently of the
    triangulation neighborhood (None -> same)."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    n = pts.shape[0]
    kf = 0 if frame_neighbors is None else int(frame_neighbors)
    max_tris = 12 * n  # one-rings emit ~6 tris/point; generous headroom
    out = np.empty((max_tris, 3), dtype=np.int64)
    cnt = lib.epk_local_triangulations_v2(
        _ptr_d(pts), n, n_neighbors, kf, max_tris, _ptr_i(out))
    if cnt == -2:
        max_tris *= 4
        out = np.empty((max_tris, 3), dtype=np.int64)
        cnt = lib.epk_local_triangulations_v2(
            _ptr_d(pts), n, n_neighbors, kf, max_tris, _ptr_i(out))
    if cnt < 0:
        raise ValueError(f"epk_local_triangulations failed ({cnt})")
    return out[:cnt]


def delaunay_flips_native(points: np.ndarray, tris: np.ndarray,
                          lengths: np.ndarray, weights: np.ndarray,
                          max_flips: int = -1) -> int:
    """In-place intrinsic Delaunay flips (csrc port of
    point_cloud.intrinsic_delaunay_flips). Returns the flip count."""
    lib = load_native()
    if lib is None:
        raise RuntimeError("native library not built (make -C csrc)")
    pts = np.ascontiguousarray(points, dtype=np.float64)
    assert tris.dtype == np.int64 and tris.flags.c_contiguous
    assert lengths.dtype == np.float64 and lengths.flags.c_contiguous
    assert weights.dtype == np.float64 and weights.flags.c_contiguous
    rc = lib.epk_delaunay_flips(_ptr_d(pts), pts.shape[0], _ptr_i(tris),
                                _ptr_d(lengths), _ptr_d(weights),
                                tris.shape[0], max_flips)
    if rc < 0:
        raise ValueError(f"epk_delaunay_flips failed (rc={rc})")
    return int(rc)
