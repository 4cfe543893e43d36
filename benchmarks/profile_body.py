"""Per-iteration loop-body decomposition microbench (round-3 perf work).

Times CHAINED ``saga.loop._loop_body`` applications (carry feeds carry —
no CSE between steps) minus a chain-0 program (spectrogram + init only),
under config toggles that isolate body components:

* default            — the production body (K=4, Pallas K2, all gates)
* gates_off          — shadow + harmonic suppression disabled
* offsets_1          — one onset offset instead of 3 (windows gather and
                       candidate-dots matmul shrink 3x)
* k_1 / k_2          — n_extract scaling (sequential extract stage)
* xla_subtract       — use_pallas=False: K2 -> vmapped XLA subtract
                       (also switches K1; the chain-0 subtraction removes
                       the spectrogram difference from the body delta)

Axon methodology (docs/PERFORMANCE.md): validate by device_get, amortize
dispatch over the chain, median of repeats.
"""

from __future__ import annotations

import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from amt_saga_tpu import default_config
from amt_saga_tpu.saga import loop as L
from amt_saga_tpu.saga.loop import NotesBatch


def build_waves(cfg, batch: int, seconds: float) -> jnp.ndarray:
    from amt_saga_tpu.runtime.fixtures import make_clip

    waves = np.stack([
        make_clip(cfg, kind=("isol" if i % 2 == 0 else "mus"),
                  seconds=seconds, n_notes=8, n_voices=3, seed=i)[0]
        for i in range(batch)])
    return jnp.asarray(waves)


def make_prog(cfg, chain: int):
    """waves -> scalar after `chain` chained body applications."""

    def prog(waves, tmpl):
        spec = L.spectrogram_batch(waves, cfg)
        n_frames = spec.shape[1]
        cap = cfg.loop.max_notes
        b = spec.shape[0]
        res = L.pad_residual(spec, cfg)
        e0 = jnp.sum(jnp.square(res), axis=(1, 2))
        notes0 = NotesBatch(
            onset=jnp.zeros((b, cap), jnp.int32),
            dur=jnp.zeros((b, cap), jnp.int32),
            pitch=jnp.zeros((b, cap), jnp.int32),
            gain=jnp.zeros((b, cap), jnp.float32),
            program=jnp.zeros((b, cap), jnp.int32),
            d_idx=jnp.zeros((b, cap), jnp.int32),
            sd=jnp.zeros((b, cap, len(cfg.synth.duration_grid)),
                         jnp.float32),
            dot0=jnp.zeros((b, cap, cfg.synth.n_instruments * 3),
                           jnp.float32),
            vel_pred=jnp.zeros((b, cap), jnp.float32),
            count=jnp.zeros((b,), jnp.int32),
            residual_energy=e0,
            poison=jnp.zeros((b,), bool),
            saturated=jnp.zeros((b,), bool),
            iterations=jnp.zeros((), jnp.int32),
        )
        c = L._Carry(res, notes0, jnp.zeros((b,), bool), e0,
                     jnp.zeros((), jnp.int32))
        band = L.band_matrix(tmpl.env, n_frames, res.shape[1])
        score_fn = partial(L.heuristic_scores, band=band,
                           precision=L.matmul_precision(cfg))
        body = partial(L._loop_body, cfg=cfg, tmpl=tmpl,
                       n_frames=n_frames, score_fn=score_fn)
        for _ in range(chain):
            c = body(c)
        return (c.notes.residual_energy.sum() + c.notes.gain.sum()
                + c.notes.count.sum())

    return jax.jit(prog)


def run(cfg, waves, chain: int, repeats: int = 5) -> dict:
    tmpl = jax.device_put(L.load_template_arrays(cfg))
    f = make_prog(cfg, chain)
    t0 = time.time()
    jax.device_get(f(waves, tmpl))
    compile_s = time.time() - t0
    ts = []
    for _ in range(repeats):
        t0 = time.time()
        jax.device_get(f(waves, tmpl))
        ts.append(time.time() - t0)
    return {"chain": chain, "compile_s": round(compile_s, 1),
            "median_s": float(np.median(ts)), "min_s": float(np.min(ts))}


def main():
    batch, seconds, chain = 64, 10.0, 24
    # Mirror the bench configuration: the production fast path runs the
    # Pallas kernels (bench.py sets run.use_pallas=True; the repo-wide
    # default stays False for maximum-compatibility CPU/golden runs).
    base = default_config().override(**{"run.use_pallas": True})
    waves = build_waves(base, batch, seconds)
    variants = [
        ("default", base),
        ("dots_full", base),
        ("gates_off", base.override(**{"loop.shadow_gain_frac": 0.0,
                                       "loop.harmonic_shadow_frac": 0.0})),
        ("offsets_1", base.override(**{"loop.onset_offsets": (0,)})),
        ("k_1", base.override(**{"loop.n_extract": 1})),
        ("k_2", base.override(**{"loop.n_extract": 2})),
        ("xla_subtract", base.override(**{"run.use_pallas": False})),
    ]
    out = {}
    zero = {}
    real_groups = L._duration_groups
    for name, cfg in variants:
        # A/B the duration-grouped dots matmul: "dots_full" restores the
        # single full-extent matmul (what _duration_groups returns for
        # the neural bank).
        L._duration_groups = (
            (lambda c: ((0, len(c.synth.duration_grid),
                         c.synth.template_frames),))
            if name == "dots_full" else real_groups)
        pallas = cfg.run.use_pallas
        if pallas not in zero:
            zero[pallas] = run(cfg, waves, 0)
            print(json.dumps({"variant": f"chain0_pallas={pallas}",
                              **zero[pallas]}), flush=True)
        r = run(cfg, waves, chain)
        per_iter_ms = (r["median_s"] - zero[pallas]["median_s"]) / chain * 1e3
        out[name] = {**r, "per_iter_ms": round(per_iter_ms, 3)}
        print(json.dumps({"variant": name, **out[name]}), flush=True)
    print(json.dumps({"summary": {k: v["per_iter_ms"]
                                  for k, v in out.items()}}))


if __name__ == "__main__":
    main()
