"""AOT-serialized executables (SURVEY.md §5 checkpoint/resume analogue for
COMPILES; round-1 verdict: compile time dwarfs run time).

The flagship transcription program compiles in minutes through the axon
remote-compile service while executing in milliseconds, and the JAX
persistent *compilation* cache does not shortcut recompiles on that
backend.  This module serializes the COMPILED executable itself
(``jax.experimental.serialize_executable``: PJRT executable bytes + arg
pytree defs) keyed by (device kind, config, input shapes), so a later
process skips tracing AND XLA backend compile entirely — true ahead-of-
time deployment, the TPU-native replacement for "ship a torchscript
file".

Not every PJRT plugin supports executable serialization; ``try_load`` /
``try_save`` degrade to None (with a logged reason) and callers fall
back to plain jit — behavior, not availability, is the contract here.
"""

from __future__ import annotations

import hashlib
import os
import pickle
from typing import Any, Callable

import jax

from ..utils.logging import get_logger

log = get_logger(__name__)

_FORMAT_VERSION = 1


def _code_fingerprint() -> str:
    """Content hash of the package's Python sources.  Without it, a code
    change that alters the traced program (same config, same shapes)
    would silently reload a STALE executable from the cache — computed
    once per process, a few ms for the whole tree."""
    global _CODE_FP
    if _CODE_FP is None:
        import glob

        pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = hashlib.sha256()
        for path in sorted(glob.glob(os.path.join(pkg, "**", "*.py"),
                                     recursive=True)):
            with open(path, "rb") as f:
                # Package-relative: a relocated checkout (or two identical
                # checkouts) keeps the same fingerprint and shares a cache.
                h.update(os.path.relpath(path, pkg).encode())
                h.update(f.read())
        _CODE_FP = h.hexdigest()[:16]
    return _CODE_FP


_CODE_FP: str | None = None


def cache_key(cfg_json: str, shapes: Any,
              devices: list | None = None) -> str:
    """Content-addressed filename: device kind/count + jax version +
    package code fingerprint + config + abstract input shapes/dtypes.
    Python's builtin hash() is randomized per process, so hash
    explicitly via sha256.  ``devices`` is the execution device list —
    a sharded executable (mesh mode) keys differently from the
    single-device program of the same config/shapes."""
    devs = devices if devices else jax.devices()[:1]
    dev = devs[0]
    ident = "|".join([
        f"v{_FORMAT_VERSION}", jax.__version__, dev.platform,
        getattr(dev, "device_kind", "?"), f"n{len(devs)}",
        _code_fingerprint(), cfg_json, repr(shapes),
    ])
    return hashlib.sha256(ident.encode()).hexdigest()[:24] + ".aotx"


def try_save(compiled, path: str) -> bool:
    """Serialize a ``jax.stages.Compiled`` to ``path``; False if the
    backend does not support executable serialization."""
    try:
        from jax.experimental import serialize_executable as se

        payload = se.serialize(compiled)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)
        return True
    except Exception as e:  # backend-dependent; degrade, don't crash
        log.warning("AOT serialize unsupported here (%s); falling back "
                    "to jit", e)
        return False


def try_load(path: str, devices: list | None = None) -> Callable | None:
    """Deserialize a compiled executable; None on any failure (missing
    file, backend/device mismatch, version skew).  ``devices`` must
    match the device list the executable was compiled for — device 0
    for the single-chip program (the default execution_devices is ALL
    local devices, which mismatches a 1-shard executable on the
    8-virtual-device test backend), the mesh's device list for a
    sharded one."""
    if not os.path.exists(path):
        return None
    try:
        from jax.experimental import serialize_executable as se

        with open(path, "rb") as f:
            payload = pickle.load(f)
        loaded = se.deserialize_and_load(
            *payload,
            execution_devices=devices if devices else jax.devices()[:1])
        log.info("AOT executable loaded from %s (no compile)", path)
        return loaded
    except Exception as e:
        log.warning("AOT load failed for %s (%s); falling back to jit",
                    path, e)
        return None


class AotCache:
    """Directory-backed executable cache for one traced function.

    ``fn`` must be a plain Python callable (it is wrapped in jax.jit
    here); ``cfg_json`` keys the cache entry together with the concrete
    input shapes of each call.

    Startup cost is isolated from the serving path (round-2 verdict
    item #2): the first execution of a deserialized executable can pay a
    server-side finalize on the axon backend (0.3-310 s observed —
    about half a cold compile), so :meth:`warmup_async` resolves +
    validates executables on a background thread while the host scans
    the corpus / loads WAVs; per-key ``stats`` split the cost into
    load_s / compile_s / first_exec_s so benchmarks report the finalize
    honestly instead of folding it into "compile".
    """

    def __init__(self, fn: Callable | None, cfg_json: str, directory: str,
                 jit_fn: Callable | None = None,
                 devices: list | None = None):
        """``fn``: plain callable to wrap in jax.jit, OR pass an
        already-jitted function via ``jit_fn`` (e.g. the sharded
        transcriber with in/out_shardings — mesh mode).  ``devices``:
        execution device list the executable compiles for; defaults to
        device 0 (single-chip).  A mesh-mode cache entry keys on the
        device count, so single- and multi-device programs of the same
        config/shapes never collide."""
        import threading

        self._fn = fn
        self._jit = jit_fn if jit_fn is not None else jax.jit(fn)
        self._devices = list(devices) if devices else None
        self._cfg_json = cfg_json
        self._dir = directory
        os.makedirs(directory, exist_ok=True)
        self._loaded: dict[str, Callable] = {}
        self.stats: dict[str, dict] = {}
        self._locks: dict[str, Any] = {}
        self._locks_guard = threading.Lock()

    def _key(self, args) -> str:
        shapes = jax.tree.map(
            lambda a: (getattr(a, "shape", ()), str(getattr(a, "dtype",
                                                            type(a)))),
            args)
        return cache_key(self._cfg_json, shapes, self._devices)

    def _lock_for(self, key: str):
        import threading

        with self._locks_guard:
            return self._locks.setdefault(key, threading.Lock())

    def _resolve(self, key: str, args):
        """Load-or-compile + validating first execution (FETCHED).

        The fetch validates runnability: some AOT loaders (notably
        XLA:CPU) accept an executable at deserialize time but fail at
        run time, and with async dispatch that error would surface at
        the caller's device_get.  Fetch — not block_until_ready, which
        can return before execution on the axon backend (see bench.py).
        Returns (entry, fetched_output_of_args).
        """
        import time

        path = os.path.join(self._dir, key)
        st = {"load_s": 0.0, "compile_s": 0.0, "first_exec_s": 0.0,
              "source": "compile"}
        t0 = time.time()
        entry = try_load(path, self._devices)
        st["load_s"] = round(time.time() - t0, 3)
        out = None
        if entry is not None:
            try:
                t0 = time.time()
                out = entry(*args)
                jax.device_get(out)
                st["first_exec_s"] = round(time.time() - t0, 3)
                st["source"] = "aot"
            except Exception as e:
                log.warning(
                    "AOT executable from %s failed to execute (%s); "
                    "recompiling and refreshing the cache entry",
                    path, e)
                entry, out = None, None
        if entry is None:
            t0 = time.time()
            entry = self._jit.lower(*args).compile()
            st["compile_s"] = round(time.time() - t0, 3)
            try_save(compiled=entry, path=path)
            t0 = time.time()
            out = entry(*args)
            jax.device_get(out)
            st["first_exec_s"] = round(time.time() - t0, 3)
        self.stats[key] = st
        self._loaded[key] = entry
        return entry, out

    def warmup_async(self, *args):
        """Resolve + validate the executable for these shapes on a
        daemon thread; a concurrent serving call for the same shapes
        blocks on the per-key lock (i.e. joins the warmup) instead of
        duplicating the work.  Errors surface on the serving path's own
        resolve, not here."""
        import threading

        key = self._key(args)

        def run():
            with self._lock_for(key):
                if key not in self._loaded:
                    try:
                        self._resolve(key, args)
                    except Exception as e:
                        log.warning("warmup failed (%s); the serving "
                                    "call will retry", e)

        t = threading.Thread(target=run, daemon=True,
                             name=f"aot-warmup-{key[:8]}")
        t.start()
        return t

    def __call__(self, *args):
        key = self._key(args)
        entry = self._loaded.get(key)
        if entry is not None:
            return entry(*args)
        with self._lock_for(key):
            entry = self._loaded.get(key)
            if entry is not None:  # a warmup finished while we waited
                return entry(*args)
            entry, out = self._resolve(key, args)
            return out if out is not None else entry(*args)
