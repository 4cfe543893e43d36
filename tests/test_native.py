"""Native (C++) emission-refit kernel vs the numpy reference
(amt_saga_tpu/native/refit.cc vs core/notes.refit_gains_variants_host's
descend closure).  The contract: identical DISCRETE decisions
(instrument, duration — both implementations compare the same
mantissa-truncated f32 objectives) and gains equal up to summation-order
ulps; and end-to-end, the full golden pipeline emits the same notes
with either implementation."""

import numpy as np
import pytest

from amt_saga_tpu import native
from amt_saga_tpu.core.notes import refit_gains_variants_host


def _random_gram(rng, qd, tmax, f=5):
    """A real banded template-overlap Gram from a random nonneg bank
    (keeps the PSD / symmetry structure the refit relies on)."""
    bank = rng.uniform(0.0, 1.0, size=(qd, tmax, f)).astype(np.float32)
    band = 2 * tmax - 1
    gram = np.empty((band, qd, qd), dtype=np.float32)
    flat = bank.reshape(qd, -1)
    for dt in range(tmax):
        a = bank[:, dt:].reshape(qd, -1)
        b = bank[:, :tmax - dt].reshape(qd, -1)
        g = a @ b.T
        gram[tmax - 1 + dt] = g
        gram[tmax - 1 - dt] = g.T
    del flat
    return gram


def _case(rng, n, n_i, n_p, n_d, tmax):
    qd = n_i * n_p * n_d
    gram = _random_gram(rng, qd, tmax)
    t = rng.integers(0, 4 * tmax, size=n)
    p = rng.integers(0, n_p, size=n)
    d = rng.integers(0, n_d, size=n)
    prog = rng.integers(0, n_i, size=n)
    d0 = rng.uniform(0.0, 50.0, size=(n, n_i * 3))
    gains = rng.uniform(0.0, 1.0, size=n)
    grid = np.cumsum(rng.uniform(0.2, 0.5, size=n_d))
    return dict(onset_frames=t, pitches=p, d_idx=d, programs=prog,
                dot0_pow=d0, gains=gains, count=n, gram_pow=gram,
                n_pitches=n_p, n_durations=n_d, duration_grid=grid)


@pytest.mark.skipif(not native.available(),
                    reason="native kernel unavailable (no g++?)")
@pytest.mark.parametrize("n,n_i", [(1, 1), (7, 3), (40, 1), (24, 4)])
def test_refit_variants_native_matches_numpy(monkeypatch, n, n_i):
    rng = np.random.default_rng(20260818 + n + n_i)
    kw = _case(rng, n=n, n_i=n_i, n_p=6, n_d=4, tmax=5)

    g_nat, p_nat, d_nat, ch_nat = refit_gains_variants_host(**kw)
    monkeypatch.setattr(native, "available", lambda: False)
    g_np, p_np, d_np, ch_np = refit_gains_variants_host(**kw)

    np.testing.assert_array_equal(p_nat, p_np)
    np.testing.assert_array_equal(d_nat, d_np)
    np.testing.assert_array_equal(ch_nat, ch_np)
    np.testing.assert_allclose(g_nat, g_np, rtol=1e-7, atol=1e-12)


@pytest.mark.skipif(not native.available(),
                    reason="native kernel unavailable (no g++?)")
def test_golden_pipeline_identical_with_and_without_native(
        monkeypatch, tiny_config):
    """End-to-end: the golden pipeline's emitted note events are
    identical whichever refit implementation runs (the emission chain
    consumes quantized decisions and velocity-rounded gains)."""
    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.golden.pipeline import transcribe_golden
    from amt_saga_tpu.runtime.fixtures import render_notes

    cfg = tiny_config
    truth = NoteSequence()
    truth.add(0.10, 0.30, 62, 90, 0)
    truth.add(0.32, 0.25, 69, 70, 0)
    truth.add(0.70, 0.40, 62, 55, 0)
    wave = render_notes(truth, cfg, cfg.dsp.sample_rate * 2)

    seq_nat = transcribe_golden(wave, cfg).sequence.sorted()
    monkeypatch.setattr(native, "available", lambda: False)
    seq_np = transcribe_golden(wave, cfg).sequence.sorted()

    assert [(n.onset, n.duration, n.pitch, n.velocity, n.program)
            for n in seq_nat.notes] == \
           [(n.onset, n.duration, n.pitch, n.velocity, n.program)
            for n in seq_np.notes]


@pytest.mark.skipif(not native.available(),
                    reason="native kernel unavailable (no g++?)")
@pytest.mark.parametrize("n_i", [1, 3])
def test_refit_variants_batch_bitwise_matches_per_lane(n_i):
    """refit_gains_variants_batch_host must reproduce the per-lane
    native path EXACTLY: identical discrete decisions AND bitwise-equal
    gains (same descent core, same variant construction), with rows
    past each lane's count untouched."""
    from amt_saga_tpu.core.notes import refit_gains_variants_batch_host

    rng = np.random.default_rng(99)
    n_p, n_d, tmax = 5, 4, 6
    B, cap = 9, 32
    qd = n_i * n_p * n_d
    gram = _random_gram(rng, qd, tmax)
    grid = np.cumsum(rng.uniform(0.2, 0.5, size=n_d))
    counts = rng.integers(0, cap + 1, size=B)
    counts[0] = 0
    counts[1] = cap
    t = rng.integers(0, 4 * tmax, size=(B, cap))
    p = rng.integers(0, n_p, size=(B, cap))
    d = rng.integers(0, n_d, size=(B, cap))
    prog = rng.integers(0, n_i, size=(B, cap))
    d0 = rng.uniform(0.0, 50.0, size=(B, cap, n_i * 3))
    gains = rng.uniform(0.0, 1.0, size=(B, cap))

    out = refit_gains_variants_batch_host(
        t, p, d, prog, d0, gains, counts, gram, n_p, n_d, sweeps=4,
        duration_grid=grid, context_frames=0)
    assert out is not None
    bg, bp, bd, bch = out
    for b in range(B):
        g1, p1, d1, ch1 = refit_gains_variants_host(
            t[b], p[b], d[b], prog[b], d0[b], gains[b],
            int(counts[b]), gram, n_p, n_d, sweeps=4,
            duration_grid=grid, context_frames=0)
        n = int(counts[b])
        assert np.array_equal(bg[b][:n], g1[:n]), b       # bitwise
        assert np.array_equal(bp[b][:n], p1[:n]), b
        assert np.array_equal(bd[b][:n], d1[:n]), b
        assert np.array_equal(bch[b][:n], ch1), b
        # Rows past count keep caller values exactly.
        assert np.array_equal(bg[b][n:], gains[b][n:].astype(np.float64))
        assert np.array_equal(bp[b][n:], prog[b][n:])
        assert np.array_equal(bd[b][n:], d[b][n:])
        assert not bch[b][n:].any()


@pytest.mark.skipif(not native.available(),
                    reason="native kernel unavailable (no g++?)")
def test_refit_variants_batch_declines_context_vote():
    """The batch fast path must decline (return None) when the stage-3
    context vote is active with multiple instruments — that stage is
    per-lane Python only."""
    from amt_saga_tpu.core.notes import refit_gains_variants_batch_host

    rng = np.random.default_rng(5)
    n_i, n_p, n_d, tmax = 2, 3, 3, 4
    gram = _random_gram(rng, n_i * n_p * n_d, tmax)
    grid = np.cumsum(rng.uniform(0.2, 0.5, size=n_d))
    z = np.zeros((2, 4), dtype=np.int64)
    out = refit_gains_variants_batch_host(
        z, z, z, z, np.zeros((2, 4, n_i * 3)), np.zeros((2, 4)),
        np.array([2, 2]), gram, n_p, n_d, sweeps=2,
        duration_grid=grid, context_frames=10)
    assert out is None
