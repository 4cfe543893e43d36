"""Native (C++) host kernels, built on demand and bound via ctypes.

The reference is Python throughout (SURVEY.md §2.1 — its native work
lives inside numpy/PyTorch); this framework's device path is XLA/Pallas,
and the one host path hot enough to justify native code is the per-note
emission refinement (joint refit variant descent: a Python-level loop of
sweeps x notes x variants tiny gathers, ~15.7 ms per 10-s clip in numpy
— docs/PERFORMANCE.md "Host emission budget").

Build model: ``refit.cc`` is compiled with ``g++ -O2 -shared`` into a
content-addressed ``.so`` under ``~/.cache/amt_saga_tpu`` (or
``AMT_NATIVE_CACHE``) on first use; no Python.h / pybind11 dependency
(the toolchain ships g++ but not pybind11).  If the compiler or a prior
build is unavailable the callers fall back to the numpy implementation
— behavior, not availability, is the contract (``AMT_NO_NATIVE=1``
forces the fallback; tests compare both).
"""

from __future__ import annotations

import ctypes
import hashlib
import logging
import os
import subprocess
import tempfile
import threading

import numpy as np

log = logging.getLogger(__name__)

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refit.cc")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _cache_dir() -> str:
    return os.environ.get(
        "AMT_NATIVE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "amt_saga_tpu"))


def _build() -> ctypes.CDLL | None:
    try:
        with open(_SRC, "rb") as f:
            src = f.read()
    except OSError as e:
        log.warning("native source unreadable (%s); using numpy path", e)
        return None
    digest = hashlib.sha1(b"refit-v1" + src).hexdigest()[:20]
    cache = _cache_dir()
    so_path = os.path.join(cache, f"refit_{digest}.so")
    if not os.path.exists(so_path):
        try:
            os.makedirs(cache, exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=cache, suffix=".so")
            os.close(fd)
            cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17",
                   "-o", tmp, _SRC]
            r = subprocess.run(cmd, capture_output=True, text=True,
                               timeout=120)
            if r.returncode != 0:
                log.warning("native build failed (%s); using numpy path",
                            r.stderr.strip()[:500])
                os.unlink(tmp)
                return None
            os.replace(tmp, so_path)  # atomic: concurrent builds race safely
            log.info("built native refit kernel -> %s", so_path)
        except (OSError, subprocess.SubprocessError) as e:
            log.warning("native build unavailable (%s); using numpy path", e)
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError as e:
        log.warning("native library unloadable (%s); using numpy path", e)
        return None
    i64 = ctypes.c_int64
    lib.refit_descend.restype = None
    lib.refit_descend.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        i64, i64, i64, i64, i64, i64, i64,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.refit_gains.restype = None
    lib.refit_gains.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        i64, i64]
    lib.refit_variants_batch.restype = None
    lib.refit_variants_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
        i64, i64, i64, i64, i64, i64, i64, i64,
        ctypes.c_void_p, ctypes.c_double,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    return lib


def get() -> ctypes.CDLL | None:
    """The loaded native library, or None (build failure / opt-out)."""
    global _lib, _tried
    if os.environ.get("AMT_NO_NATIVE") == "1":
        return None
    with _lock:
        if not _tried:
            _tried = True
            _lib = _build()
        return _lib


def available() -> bool:
    return get() is not None


def impl_id() -> str:
    """Which refit implementation this process runs: ``native:<digest>``
    or ``numpy``.  Recorded in run/bench metadata because native vs
    numpy-BLAS gains differ in summation-order ulps — bit-reproducibility
    of golden MIDI across machines with and without a compiler requires
    matching this (pin ``AMT_NO_NATIVE=1`` for cross-machine
    comparisons)."""
    lib = get()
    if lib is None:
        return "numpy"
    try:
        with open(_SRC, "rb") as f:
            digest = hashlib.sha1(b"refit-v1" + f.read()).hexdigest()[:20]
        return f"native:{digest[:12]}"
    except OSError:
        return "native:unknown"


def _ptr(a: np.ndarray) -> ctypes.c_void_p:
    return ctypes.c_void_p(a.ctypes.data)


def refit_descend(t: np.ndarray, qd_var: np.ndarray, d_var: np.ndarray,
                  i_var: np.ndarray, d0: np.ndarray,
                  allowed: np.ndarray | None, gram: np.ndarray,
                  tmax: int, n_pitches: int, n_durations: int, sweeps: int,
                  p: np.ndarray, prog: np.ndarray, dsel: np.ndarray,
                  h: np.ndarray, qb: np.ndarray) -> None:
    """One variant-descent stage; mutates prog/dsel/h/qb in place.

    Array contracts: t/p/prog/dsel/qb int64 [n]; qd_var/d_var/i_var
    int64 [n, V]; d0 float64 [n, V]; allowed uint8 [n, V] or None;
    gram float32 C-contiguous [2*tmax-1, QD, QD]; h float64 [n].
    """
    lib = get()
    assert lib is not None
    n, V = qd_var.shape
    qd_n = gram.shape[1]
    assert gram.dtype == np.float32 and gram.flags.c_contiguous
    for a in (t, p, prog, dsel, qb):
        assert a.dtype == np.int64 and a.flags.c_contiguous
    assert h.dtype == np.float64 and h.flags.c_contiguous
    # Contiguous copies MUST be bound to locals that outlive the foreign
    # call: ``_ptr(np.ascontiguousarray(x))`` would drop the only
    # reference to a fresh copy before the C code reads it
    # (use-after-free).  Dtypes asserted — a silent ascontiguousarray
    # dtype pass-through with the wrong itemsize would mis-stride in C.
    qd_c = np.ascontiguousarray(qd_var, dtype=np.int64)
    dv_c = np.ascontiguousarray(d_var, dtype=np.int64)
    iv_c = np.ascontiguousarray(i_var, dtype=np.int64)
    d0_c = np.ascontiguousarray(d0, dtype=np.float64)
    al_c = (np.ascontiguousarray(allowed, dtype=np.uint8)
            if allowed is not None else None)
    lib.refit_descend(
        _ptr(t), _ptr(qd_c), _ptr(dv_c), _ptr(iv_c), _ptr(d0_c),
        _ptr(al_c) if al_c is not None else ctypes.c_void_p(0),
        _ptr(gram), qd_n, tmax, n, V, n_pitches, n_durations, sweeps,
        _ptr(p), _ptr(prog), _ptr(dsel), _ptr(h), _ptr(qb))


def refit_variants_batch(t: np.ndarray, p: np.ndarray,
                         d_orig: np.ndarray, counts: np.ndarray,
                         d0_all: np.ndarray, gram: np.ndarray,
                         tmax: int, n_i: int, n_pitches: int,
                         n_durations: int, sweeps: int,
                         grid_sec: np.ndarray, max_step: float,
                         prog: np.ndarray, dsel: np.ndarray,
                         h: np.ndarray, changed: np.ndarray) -> None:
    """Whole-batch joint-refit stages 1+2; mutates prog/dsel/h/changed
    in place.  Array contracts: t/p/d_orig/prog/dsel int64 [B, cap];
    counts int64 [B]; d0_all float64 [B, cap, n_i*3]; h float64
    [B, cap] (squared gains); changed uint8 [B, cap]; gram float32
    C-contiguous [2*tmax-1, QD, QD]; grid_sec float64 [n_durations].
    Per-lane results are bit-identical to looping refit_descend
    (stages share descend_core)."""
    lib = get()
    assert lib is not None
    B, cap = t.shape
    qd_n = gram.shape[1]
    assert gram.dtype == np.float32 and gram.flags.c_contiguous
    for a in (t, p, d_orig, counts, prog, dsel):
        assert a.dtype == np.int64 and a.flags.c_contiguous
    assert d0_all.dtype == np.float64 and d0_all.flags.c_contiguous
    assert h.dtype == np.float64 and h.flags.c_contiguous
    assert changed.dtype == np.uint8 and changed.flags.c_contiguous
    grid_c = np.ascontiguousarray(grid_sec, dtype=np.float64)
    lib.refit_variants_batch(
        _ptr(t), _ptr(p), _ptr(d_orig), _ptr(counts), _ptr(d0_all),
        _ptr(gram), qd_n, tmax, B, cap, n_i, n_pitches, n_durations,
        sweeps, _ptr(grid_c), ctypes.c_double(float(max_step)),
        _ptr(prog), _ptr(dsel), _ptr(h), _ptr(changed))


def refit_gains(G: np.ndarray, diag: np.ndarray, d0: np.ndarray,
                g: np.ndarray, sweeps: int) -> None:
    """Cyclic coordinate descent sweeps; mutates g in place."""
    lib = get()
    assert lib is not None
    n = g.shape[0]
    assert g.dtype == np.float64 and g.flags.c_contiguous
    # Locals hold the contiguous copies alive across the call (see
    # refit_descend); g is mutated in place and must arrive contiguous.
    g_c = np.ascontiguousarray(G, dtype=np.float64)
    diag_c = np.ascontiguousarray(diag, dtype=np.float64)
    d0_c = np.ascontiguousarray(d0, dtype=np.float64)
    lib.refit_gains(_ptr(g_c), _ptr(diag_c), _ptr(d0_c), _ptr(g),
                    n, sweeps)
