"""Bit-parity tests for the fused selection-chain kernel
(ops/select_pallas.py) against saga.loop._select_chain_xla — the
contract stated in the kernel's module docstring.  On the CPU test
backend the kernel runs in Pallas interpret mode (same kernel code the
TPU compiles); `selftest --on-chip` re-checks the compiled kernel on
real hardware."""

import jax.numpy as jnp
import numpy as np
import pytest

from amt_saga_tpu.ops.select_pallas import select_chain_pallas
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import (
    NotesBatch,
    Transcriber,
    _select_chain_xla,
    load_template_arrays,
    quantize_decisions,
)


def _random_state(cfg, tmpl, b, rng, *, empty_notes=False):
    loop = cfg.loop
    n_q, n_d = tmpl.norms.shape
    n_o = len(loop.onset_offsets)
    n_k = max(1, loop.n_extract)
    n_p = cfg.synth.n_pitches
    cap = loop.max_notes
    n_frames = 160

    # Dots on the scale of real window*template products, signs mixed.
    dots0 = rng.standard_normal((b, n_k, n_o, n_q * n_d)).astype(
        np.float32) * np.asarray(tmpl.norms).reshape(-1)[None, None, None]
    t_sel = rng.integers(0, n_frames, (b, n_k))
    offs = np.asarray(loop.onset_offsets)
    t_cand = np.clip(t_sel[:, :, None] + offs[None, None, :], 0,
                     n_frames - 1).astype(np.int32)
    valid = rng.random((b, n_k)) < 0.9
    active = rng.random((b,)) < 0.9
    thr = np.asarray(quantize_decisions(
        jnp.asarray(rng.random((b,)).astype(np.float32) * 1e-3)))

    count = (np.zeros((b,), np.int64) if empty_notes
             else rng.integers(0, cap - 2, (b,)))
    onset = rng.integers(0, n_frames, (b, cap)).astype(np.int32)
    pitch = rng.integers(0, n_p, (b, cap)).astype(np.int32)
    program = rng.integers(0, max(1, n_q // n_p), (b, cap)).astype(
        np.int32)
    gain = (rng.random((b, cap)) * 2.0).astype(np.float32)
    notes = NotesBatch(
        onset=jnp.asarray(onset),
        dur=jnp.zeros((b, cap), jnp.int32),
        pitch=jnp.asarray(pitch),
        gain=jnp.asarray(gain),
        program=jnp.asarray(program),
        d_idx=jnp.zeros((b, cap), jnp.int32),
        sd=jnp.zeros((b, cap, n_d), jnp.float32),
        dot0=jnp.zeros((b, cap, 3), jnp.float32),
        vel_pred=jnp.zeros((b, cap), jnp.float32),
        count=jnp.asarray(count, jnp.int32),
        residual_energy=jnp.ones((b,), jnp.float32),
        poison=jnp.zeros((b,), bool),
        saturated=jnp.asarray(rng.random((b,)) < 0.05),
        iterations=jnp.zeros((), jnp.int32),
    )
    return (jnp.asarray(dots0), jnp.asarray(t_cand), jnp.asarray(valid),
            jnp.asarray(active), jnp.asarray(thr), notes)


def _assert_tuple_equal(a, b):
    """All decision outputs bit-equal; the unquantized gain may drift
    by compiler-contraction ulps (FMA fusion differs between the
    interpreted kernel and the XLA chain) — the same drift class the
    DECISION_DROP_BITS contract absorbs between CPU and TPU backends.
    The end-to-end test below pins the surface that actually matters:
    identical emitted notes."""
    names = ("t", "q", "d", "g", "acc", "sd", "acc_cum", "sat", "any")
    for name, x, y in zip(names, a, b):
        x, y = np.asarray(x), np.asarray(y)
        if name == "g":
            np.testing.assert_allclose(x, y, rtol=1e-5, atol=0,
                                       err_msg="output g")
        else:
            np.testing.assert_array_equal(x, y, err_msg=f"output {name}")


@pytest.fixture(scope="module")
def pallas_cfg(tiny_config):
    return tiny_config.override(**{"run.use_pallas": True,
                                   "run.pallas_select": True})


@pytest.fixture(scope="module")
def pallas_tmpl(pallas_cfg):
    return load_template_arrays(pallas_cfg)


@pytest.mark.parametrize("b,seed", [(1, 0), (8, 1), (13, 2)])
def test_select_chain_parity_random(pallas_cfg, pallas_tmpl, b, seed):
    rng = np.random.default_rng(seed)
    args = _random_state(pallas_cfg, pallas_tmpl, b, rng)
    ref = _select_chain_xla(*args, pallas_cfg, pallas_tmpl)
    out = select_chain_pallas(*args, pallas_cfg, pallas_tmpl)
    _assert_tuple_equal(out, ref)


def test_select_chain_parity_empty_notes(pallas_cfg, pallas_tmpl):
    rng = np.random.default_rng(3)
    args = _random_state(pallas_cfg, pallas_tmpl, 4, rng,
                         empty_notes=True)
    ref = _select_chain_xla(*args, pallas_cfg, pallas_tmpl)
    out = select_chain_pallas(*args, pallas_cfg, pallas_tmpl)
    _assert_tuple_equal(out, ref)


def test_select_chain_parity_near_capacity(pallas_cfg, pallas_tmpl):
    # Saturation path: counts sit at cap-1/cap so the capacity gate and
    # the saturated flag both fire.
    rng = np.random.default_rng(4)
    args = list(_random_state(pallas_cfg, pallas_tmpl, 8, rng))
    cap = pallas_cfg.loop.max_notes
    notes = args[5]
    args[5] = notes._replace(count=jnp.asarray(
        np.minimum(cap, np.arange(8) + cap - 4), jnp.int32))
    ref = _select_chain_xla(*args, pallas_cfg, pallas_tmpl)
    out = select_chain_pallas(*args, pallas_cfg, pallas_tmpl)
    _assert_tuple_equal(out, ref)


def test_select_chain_parity_quantized_ties(pallas_cfg, pallas_tmpl):
    # Force exact score ties: duplicate every dot value across pitch
    # pairs so the quantized argmax must fall back to the shared
    # first-in-(q,d,o)-order rule on both paths.
    rng = np.random.default_rng(5)
    args = list(_random_state(pallas_cfg, pallas_tmpl, 8, rng))
    d = np.array(args[0])
    n_qd = d.shape[-1]
    half = (n_qd // 2) * 2
    d[..., 1:half:2] = d[..., 0:half:2]
    args[0] = jnp.asarray(d)
    ref = _select_chain_xla(*args, pallas_cfg, pallas_tmpl)
    out = select_chain_pallas(*args, pallas_cfg, pallas_tmpl)
    _assert_tuple_equal(out, ref)


def test_pallas_select_end_to_end_matches_xla_chain(tiny_config):
    """Full transcription on fixture audio: the kernel-selected loop
    must emit exactly the same notes as the XLA selection chain."""
    # Refractory gating and the peak-rejection mask off: the loop
    # routes around the kernel when either is on (the kernel consumes
    # neither the duration mask nor reports rejection flags), which
    # would make this comparison vacuous.
    cfg_on = tiny_config.override(**{"run.use_pallas": True,
                                     "run.pallas_select": True,
                                     "loop.onset_refractory_frac": 0.0,
                                     "loop.peak_rejection_mask": False})
    cfg_off = tiny_config.override(**{"run.use_pallas": True,
                                      "run.pallas_select": False,
                                      "loop.onset_refractory_frac": 0.0,
                                      "loop.peak_rejection_mask": False})
    waves = []
    for seed in range(3):
        wave, _ = make_clip(tiny_config, kind="mus", seconds=3.0,
                            n_voices=3, seed=seed)
        waves.append(wave)
    waves = np.stack(waves)
    seqs_on = Transcriber(cfg_on).transcribe_batch(waves)
    seqs_off = Transcriber(cfg_off).transcribe_batch(waves)
    for a, b in zip(seqs_on, seqs_off):
        assert a.notes == b.notes


def test_select_chain_parity_template_window(tiny_config):
    """Legacy blanket shadow window (shadow_window='template'): the
    kernel's other branch must also match the XLA chain."""
    from amt_saga_tpu.saga.loop import load_template_arrays

    cfg = tiny_config.override(**{"run.use_pallas": True,
                                  "run.pallas_select": True,
                                  "loop.shadow_window": "template"})
    tmpl = load_template_arrays(cfg)
    rng = np.random.default_rng(9)
    args = _random_state(cfg, tmpl, 8, rng)
    ref = _select_chain_xla(*args, cfg, tmpl)
    out = select_chain_pallas(*args, cfg, tmpl)
    _assert_tuple_equal(out, ref)
