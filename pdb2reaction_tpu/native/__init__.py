"""ctypes bindings for the native C++ runtime components.

- cell-list neighbor engine (csrc/cell_list.cpp): host-side O(N) radius
  queries for extraction / bond graphs on full proteins;
- L-BFGS-B solver core (csrc/nlp_solver.cpp): the native Ipopt-replacement
  driving the DMF constrained solve through an objective callback that
  evaluates on the accelerator.

The shared libraries are built on first use (``make -C csrc``); every
caller has a numpy/JAX fallback, so absence of a toolchain only costs
performance, never capability.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Callable, Optional, Tuple

import numpy as np

_DIR = Path(__file__).parent
_CSRC = _DIR.parent.parent / "csrc"

_cell = None
_nlp = None
_tried = False


def _build_and_load():
    global _cell, _nlp, _tried
    if _tried:
        return
    _tried = True
    try:
        if not (_DIR / "libcell_list.so").exists() \
                or not (_DIR / "libnlp_solver.so").exists():
            subprocess.run(["make", "-C", str(_CSRC)], check=True,
                           capture_output=True, timeout=120)
        _cell = ctypes.CDLL(str(_DIR / "libcell_list.so"))
        _cell.cell_list_pairs.restype = ctypes.c_int64
        _cell.cell_list_pairs.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]
        _cell.radius_query.restype = ctypes.c_int64
        _cell.radius_query.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int32,
            ctypes.c_double, ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64]

        _nlp = ctypes.CDLL(str(_DIR / "libnlp_solver.so"))
        _nlp.lbfgsb_minimize.restype = ctypes.c_int
        _nlp.lbfgsb_minimize.argtypes = [
            _OBJ_GRAD, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double),
            ctypes.c_int32, ctypes.c_double, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32)]
    except Exception:
        _cell = None
        _nlp = None


def available() -> bool:
    _build_and_load()
    return _cell is not None and _nlp is not None


def cell_list_pairs(coords: np.ndarray, cutoff: float) -> np.ndarray:
    """All (i<j) pairs within cutoff; [K,2] int32. Numpy fallback O(N^2)."""
    coords = np.ascontiguousarray(coords, dtype=np.float64).reshape(-1, 3)
    n = coords.shape[0]
    _build_and_load()
    if _cell is not None:
        cap = max(64, n * 64)
        for _ in range(4):
            buf = np.empty((cap, 2), dtype=np.int32)
            k = _cell.cell_list_pairs(
                coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                np.int32(n), ctypes.c_double(cutoff),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                np.int64(cap))
            if k >= 0:
                return buf[:k].copy()
            cap *= 4
    d = np.linalg.norm(coords[:, None] - coords[None, :], axis=-1)
    ii, jj = np.nonzero(np.triu(d <= cutoff, 1))
    return np.column_stack([ii, jj]).astype(np.int32)


def radius_query(coords: np.ndarray, centers: np.ndarray,
                 cutoff: float) -> np.ndarray:
    """All (atom, center) hits within cutoff; [K,2] int32 (atom, center)."""
    coords = np.ascontiguousarray(coords, dtype=np.float64).reshape(-1, 3)
    centers = np.ascontiguousarray(centers, dtype=np.float64).reshape(-1, 3)
    n, m = coords.shape[0], centers.shape[0]
    _build_and_load()
    if _cell is not None:
        cap = max(64, n * 8)
        for _ in range(4):
            buf = np.empty((cap, 2), dtype=np.int32)
            k = _cell.radius_query(
                coords.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                np.int32(n),
                centers.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                np.int32(m), ctypes.c_double(cutoff),
                buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                np.int64(cap))
            if k >= 0:
                return buf[:k].copy()
            cap *= 4
    d = np.linalg.norm(coords[:, None] - centers[None, :], axis=-1)
    ii, jj = np.nonzero(d <= cutoff)
    return np.column_stack([ii, jj]).astype(np.int32)


_OBJ_GRAD = ctypes.CFUNCTYPE(ctypes.c_double,
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.POINTER(ctypes.c_double),
                             ctypes.c_int64, ctypes.c_void_p)


def lbfgsb_minimize(
    fun_grad: Callable[[np.ndarray], Tuple[float, np.ndarray]],
    x0: np.ndarray,
    *,
    lower: Optional[np.ndarray] = None,
    upper: Optional[np.ndarray] = None,
    max_iter: int = 500,
    gtol: float = 1e-5,
    history: int = 10,
) -> Tuple[np.ndarray, float, int, bool]:
    """Native box-constrained L-BFGS over a Python objective callback.

    Returns (x, f, iters, converged). Falls back to a pure-numpy loop of
    the same algorithm when the native library is unavailable.
    """
    x = np.ascontiguousarray(x0, dtype=np.float64).copy().reshape(-1)
    dim = x.size
    _build_and_load()
    if _nlp is not None:
        def cb(x_ptr, g_ptr, d, _user):
            xv = np.ctypeslib.as_array(x_ptr, shape=(d,))
            f, g = fun_grad(xv.copy())
            gv = np.ctypeslib.as_array(g_ptr, shape=(d,))
            gv[:] = np.asarray(g, dtype=np.float64).reshape(-1)
            return float(f)

        c_cb = _OBJ_GRAD(cb)
        f_out = ctypes.c_double()
        it_out = ctypes.c_int32()
        lo = (np.ascontiguousarray(lower, dtype=np.float64)
              .ctypes.data_as(ctypes.POINTER(ctypes.c_double))
              if lower is not None else None)
        hi = (np.ascontiguousarray(upper, dtype=np.float64)
              .ctypes.data_as(ctypes.POINTER(ctypes.c_double))
              if upper is not None else None)
        status = _nlp.lbfgsb_minimize(
            c_cb, None,
            x.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            ctypes.c_int64(dim), lo, hi, np.int32(max_iter),
            ctypes.c_double(gtol), np.int32(history),
            ctypes.byref(f_out), ctypes.byref(it_out))
        return x, float(f_out.value), int(it_out.value), status == 0

    # numpy fallback: scipy L-BFGS-B
    from scipy.optimize import minimize as _sp_min
    bounds = None
    if lower is not None or upper is not None:
        lo = lower if lower is not None else np.full(dim, -np.inf)
        hi = upper if upper is not None else np.full(dim, np.inf)
        bounds = list(zip(lo, hi))
    res = _sp_min(lambda xv: fun_grad(xv)[0], x, jac=lambda xv: np.asarray(
        fun_grad(xv)[1]).reshape(-1), method="L-BFGS-B", bounds=bounds,
        options={"maxiter": max_iter, "gtol": gtol})
    return res.x, float(res.fun), int(res.nit), bool(res.success)
