"""TPU-path SAGA loop vs golden CPU oracle: decision-level parity
(SURVEY.md §4.4: same jitted code runs on CPU backend in CI and on the
TPU chip; BASELINE north star: MIDI bit-for-bit on the same audio)."""

import numpy as np

from amt_saga_tpu.core.midi import notes_to_midi_bytes
from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.golden.pipeline import transcribe_golden
from amt_saga_tpu.runtime.fixtures import make_clip, make_corpus
from amt_saga_tpu.saga.loop import Transcriber


def _assert_sequences_identical(pred, gold):
    a, b = pred.sorted().notes, gold.sorted().notes
    assert len(a) == len(b), (a, b)
    for x, y in zip(a, b):
        assert x == y, (x, y)
    assert notes_to_midi_bytes(pred) == notes_to_midi_bytes(gold)


def test_single_clip_bitwise_parity_isol(tiny_config, tiny_transcriber):
    wave, ref = make_clip(tiny_config, kind="isol", seconds=6.0,
                          n_notes=5, seed=0)
    tr = tiny_transcriber
    pred = tr.transcribe(wave)
    gold = transcribe_golden(wave, tiny_config).sequence
    _assert_sequences_identical(pred, gold)
    assert note_f1(pred, ref).f1 == 1.0


def test_batched_lockstep_parity(tiny_config, tiny_transcriber):
    clips = make_corpus(tiny_config, kind="isol", n_clips=3, seconds=4.0,
                        n_notes=3, seed=10)
    waves = np.stack([w for w, _ in clips])
    tr = tiny_transcriber
    preds = tr.transcribe_batch(waves)
    for (wave, ref), pred in zip(clips, preds):
        gold = transcribe_golden(wave, tiny_config).sequence
        _assert_sequences_identical(pred, gold)
        assert note_f1(pred, ref).f1 == 1.0


def test_polyphonic_parity(tiny_config, tiny_transcriber):
    wave, ref = make_clip(tiny_config, kind="mus", seconds=5.0,
                          n_voices=2, seed=1)
    tr = tiny_transcriber
    pred = tr.transcribe(wave)
    gold = transcribe_golden(wave, tiny_config).sequence
    _assert_sequences_identical(pred, gold)
    assert note_f1(pred, ref).f1 >= 0.75


def test_batch_with_silent_lane(tiny_config, tiny_transcriber):
    wave, ref = make_clip(tiny_config, kind="isol", seconds=4.0,
                          n_notes=3, seed=2)
    silent = np.zeros_like(wave)
    tr = tiny_transcriber
    preds = tr.transcribe_batch(np.stack([wave, silent]))
    assert len(preds[1]) == 0
    assert note_f1(preds[0], ref).f1 == 1.0


def test_heterogeneous_lane_lengths_terminate_independently(tiny_config, tiny_transcriber):
    # One busy lane, one nearly-empty lane: the empty lane must stop
    # appending while the busy lane continues (done-mask correctness).
    busy, ref_busy = make_clip(tiny_config, kind="mus", seconds=5.0,
                               n_voices=2, seed=3)
    sparse, ref_sparse = make_clip(tiny_config, kind="isol", seconds=5.0,
                                   n_notes=1, seed=4)
    tr = tiny_transcriber
    preds = tr.transcribe_batch(np.stack([busy, sparse]))
    assert len(preds[1]) == len(ref_sparse)
    gold_busy = transcribe_golden(busy, tiny_config).sequence
    _assert_sequences_identical(preds[0], gold_busy)


def test_decision_quantizers_bit_identical():
    """The golden (NumPy) and loop (JAX) decision quantizers must agree
    bit-for-bit on every float class — they are the parity foundation."""
    import jax.numpy as jnp

    from amt_saga_tpu.golden.pipeline import quantize_decisions_np
    from amt_saga_tpu.saga.loop import quantize_decisions

    rng = np.random.default_rng(0)
    vals = np.concatenate([
        (rng.standard_normal(1000)
         * 10.0 ** rng.integers(-6, 6, 1000)).astype(np.float32),
        np.array([0.0, -0.0, 1.0, -1.0, np.inf, -np.inf,
                  np.finfo(np.float32).tiny, np.finfo(np.float32).max],
                 np.float32),
    ])
    a = quantize_decisions_np(vals)
    b = np.asarray(quantize_decisions(jnp.asarray(vals)))
    np.testing.assert_array_equal(a.view(np.int32), b.view(np.int32))
    # quantization is idempotent and monotone
    np.testing.assert_array_equal(quantize_decisions_np(a), a)
    x = np.sort(rng.standard_normal(500).astype(np.float32))
    q = quantize_decisions_np(x)
    assert np.all(np.diff(q) >= 0)


def test_nan_lane_poisoned_not_garbage(tiny_config, tiny_transcriber):
    """Sanitizer (SURVEY.md §5): a NaN-injected lane degrades to an empty
    sequence + poison flag; clean lanes in the same batch are unaffected."""
    import jax
    import numpy as np

    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import notes_batch_to_sequences

    cfg = tiny_config
    clean, ref = make_clip(cfg, kind="isol", seconds=4.0, n_notes=3, seed=3)
    bad = clean.copy()
    bad[len(bad) // 2] = np.nan
    notes = jax.device_get(tiny_transcriber._fn(
        jax.numpy.asarray(np.stack([clean, bad]))))
    assert not bool(notes.poison[0])
    assert bool(notes.poison[1])
    seqs = notes_batch_to_sequences(notes, cfg)
    assert len(seqs[0]) > 0      # clean lane transcribed normally
    assert len(seqs[1]) == 0     # poisoned lane emits empty, not garbage
    assert int(notes.iterations) >= 1


def test_refit_gains_exact_recovery_linear(tiny_config):
    """The joint gain re-projection (core.notes.refit_gains_host) must
    recover the true gains of overlapping atoms exactly in the linear-
    superposition regime (where the model ||spec - sum g W||^2 is exact),
    including the ill-conditioned same-pitch-different-duration case that
    greedy extraction biases."""
    import numpy as np

    from amt_saga_tpu.core.notes import refit_gains_host
    from amt_saga_tpu.synth.templates import gram_from_bank, template_bank

    cfg = tiny_config
    bank = template_bank(cfg.synth, cfg.dsp)
    n_i, n_p, n_d, tmax, f = bank.shape
    gram = gram_from_bank(bank.reshape(n_i * n_p * n_d, tmax, f))
    notes = [(10, 12, 2, 0.9), (14, 19, 2, 0.5), (20, 12, 1, 0.7)]
    spec = np.zeros((120 + tmax, f), np.float32)
    for t, p, d, g in notes:
        spec[t:t + tmax] += g * bank[0, p, d]
    onset = np.array([n[0] for n in notes])
    qd = np.array([(0 * n_p + n[1]) * n_d + n[2] for n in notes])
    dot0 = np.array(
        [spec[t:t + tmax].reshape(-1) @ bank[0, p, d].reshape(-1)
         for t, p, d, _ in notes], np.float32)
    out = refit_gains_host(onset, qd, dot0,
                           np.array([1.1, 0.3, 0.9]), 3, gram, sweeps=4)
    np.testing.assert_allclose(out[:3], [0.9, 0.5, 0.7], atol=0.01)
    # Entries beyond count are untouched.
    out2 = refit_gains_host(
        np.array([10, 0]), np.array([qd[0], 0]),
        np.array([dot0[0], 123.0]), np.array([0.2, 0.33]), 1, gram)
    assert out2[1] == 0.33


def test_refit_gains_power_exact_recovery(tiny_config):
    """The production power-domain refit (core.notes
    .refit_gains_power_host) recovers true gains exactly when magnitudes
    add in quadrature — the physics of overlapping notes with random
    relative phase."""
    import numpy as np

    from amt_saga_tpu.core.notes import refit_gains_power_host
    from amt_saga_tpu.synth.templates import gram_from_bank, template_bank

    cfg = tiny_config
    bank = template_bank(cfg.synth, cfg.dsp)
    n_i, n_p, n_d, tmax, f = bank.shape
    bank_pow = np.square(bank)
    gram_pow = gram_from_bank(
        bank_pow.reshape(n_i * n_p * n_d, tmax, f))
    notes = [(10, 12, 2, 0.9), (14, 19, 2, 0.5), (20, 12, 1, 0.7)]
    spec_pow = np.zeros((120 + tmax, f), np.float32)
    for t, p, d, g in notes:  # quadrature superposition: powers add
        spec_pow[t:t + tmax] += (g * g) * bank_pow[0, p, d]
    onset = np.array([n[0] for n in notes])
    qd = np.array([(0 * n_p + n[1]) * n_d + n[2] for n in notes])
    dot0p = np.array(
        [spec_pow[t:t + tmax].reshape(-1) @ bank_pow[0, p, d].reshape(-1)
         for t, p, d, _ in notes], np.float32)
    out = refit_gains_power_host(
        onset, qd, dot0p, np.array([1.1, 0.3, 0.9]), 3, gram_pow,
        sweeps=4)
    np.testing.assert_allclose(out[:3], [0.9, 0.5, 0.7], atol=0.01)


def test_refit_gains_improves_polyphonic_velocity(tiny_config,
                                                  tiny_transcriber):
    """On 3-voice polyphony the joint refit must track rendered
    velocities at least as well as the greedy gains (roadmap #5); on
    isolated notes both are exact."""
    import numpy as np

    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = tiny_config
    greedy = Transcriber(cfg.override(**{"loop.refit_gains": False}))

    def vel_mae(tr, kind, **kw):
        errs = []
        for s in range(4):
            wave, ref = make_clip(cfg, kind=kind, seconds=6.0,
                                  seed=900 + s, **kw)
            pred = tr.transcribe(wave)
            for rn in ref:
                hits = [pn for pn in pred if pn.pitch == rn.pitch
                        and abs(pn.onset - rn.onset) <= 0.05]
                if hits:
                    best = min(hits, key=lambda pn: abs(pn.onset - rn.onset))
                    errs.append(abs(best.velocity - rn.velocity))
        return float(np.mean(errs))

    assert vel_mae(tiny_transcriber, "isol", n_notes=4) == 0.0
    mus_refit = vel_mae(tiny_transcriber, "mus", n_voices=3)
    mus_greedy = vel_mae(greedy, "mus", n_voices=3)
    # Power-domain fit: measured 4.6 vs 14.3 greedy on this workload.
    assert mus_refit <= 8.0, (mus_refit, mus_greedy)
    assert mus_refit <= mus_greedy - 5.0, (mus_refit, mus_greedy)


def test_parity_fuzz_random_configs():
    """MIDI bit-parity TPU-path-vs-golden must hold across RANDOM config
    variations (duration grids, n_extract, onset offsets, instruments,
    refinement toggles) — not just the defaults the other tests pin."""
    import numpy as np

    from amt_saga_tpu.config import (Config, DSPConfig, LoopConfig,
                                     SynthConfig)
    from amt_saga_tpu.core.midi import notes_to_midi_bytes
    from amt_saga_tpu.golden.pipeline import transcribe_golden
    from amt_saga_tpu.runtime.fixtures import make_clip

    rng = np.random.default_rng(123)
    for trial in range(3):
        grid = sorted(rng.choice(
            [0.2, 0.3, 0.45, 0.6, 0.8, 1.1], size=3, replace=False))
        n_i = int(rng.integers(1, 3))
        cfg = Config(
            dsp=DSPConfig(sample_rate=8000, n_fft=512, hop=256,
                          fmin=55.0, bins_per_octave=12, n_bins=72,
                          pad_frames_to=8),
            synth=SynthConfig(pitch_min=40, pitch_max=76, n_harmonics=5,
                              template_frames=36,
                              duration_grid=tuple(float(g) for g in grid),
                              n_instruments=n_i),
            loop=LoopConfig(
                max_notes=16,
                n_extract=int(rng.integers(1, 5)),
                onset_offsets=tuple(sorted(rng.choice(
                    [-2, -1, 0, 1, 2], size=3, replace=False))),
                refine_duration=bool(rng.integers(0, 2)),
                refit_gains=bool(rng.integers(0, 2)),
                shadow_window=str(rng.choice(["duration", "template"])),
                onset_refractory_frac=float(rng.choice([0.0, 0.5])),
                # Emission refinement chain (saga/snap.py) — shared host
                # code, but fuzz it anyway: the gating and the spf/frame
                # arithmetic must agree across backends at odd framings.
                onset_snap_frames=int(rng.choice([0, 5, 8])),
                restrike_split=bool(rng.integers(0, 2)),
                dedup_twins=bool(rng.integers(0, 2)),
                peak_rejection_mask=bool(rng.integers(0, 2)),
                stop_patience=int(rng.integers(1, 6)),
                min_score_rel0=float(rng.choice([0.0, 1e-4, 3e-4])),
            ))
        kind = "multi" if n_i > 1 else "mus"
        wave, _ = make_clip(cfg, kind=kind, seconds=4.0,
                            seed=300 + trial, n_voices=2)
        g = transcribe_golden(wave, cfg).sequence
        t = Transcriber(cfg).transcribe(wave)
        assert notes_to_midi_bytes(g) == notes_to_midi_bytes(t), (
            trial, cfg.loop, cfg.synth.duration_grid)


def test_stacked_dispatch_parity(tiny_config, tiny_transcriber):
    """[M, B, N] stacked execution (one-dispatch lax.map) emits exactly
    the per-batch results."""
    import jax

    from amt_saga_tpu.saga.loop import transcribe_waves

    clips = make_corpus(tiny_config, kind="isol", n_clips=4, seconds=3.0,
                        n_notes=3, seed=30)
    waves = np.stack([w for w, _ in clips])          # [4, N]
    tr = tiny_transcriber
    flat = jax.device_get(tr._fn(waves))
    stacked = jax.device_get(
        jax.jit(lambda w, t: transcribe_waves(w, tiny_config, t))(
            waves.reshape(2, 2, -1), tr.tmpl))
    for field in ("onset", "dur", "pitch", "gain", "program", "count"):
        a = np.asarray(getattr(flat, field)).reshape(2, 2, *np.asarray(
            getattr(flat, field)).shape[1:])
        b = np.asarray(getattr(stacked, field))
        assert np.array_equal(a, b), field
    assert np.asarray(stacked.iterations).shape == (2,)


def test_peak_rejection_mask_extends_extraction(tiny_config):
    """Persistent quality-rejected residue peaks must not stall the
    lane while extractable notes remain (LoopConfig.peak_rejection_mask;
    traced on 8-voice fixtures: the no-mask loop latched done
    re-rejecting the same 4 shadow-rejected peaks with ~20 true notes
    left).  On dense 6-voice mixtures the masked loop keeps extracting
    past the no-mask stall point; sparse content is untouched (same
    notes, same trip count — the bench-mix invariant in the ledger)."""
    cfg_on = tiny_config.override(**{"loop.max_notes": 64})
    cfg_off = cfg_on.override(**{"loop.peak_rejection_mask": False})
    t_on, t_off = Transcriber(cfg_on), Transcriber(cfg_off)
    extended = 0
    for seed in (7, 177):
        clips = make_corpus(cfg_on, kind="mus", n_clips=1, seconds=5.0,
                            n_voices=6, seed=seed)
        for w, _ in clips:
            n_on = len(t_on.transcribe(w))
            n_off = len(t_off.transcribe(w))
            assert n_on >= n_off, (seed, n_on, n_off)
            extended += int(n_on > n_off)
    assert extended >= 1  # the stall actually breaks somewhere

    # Sparse content: identical emission with the mask on and off.
    w, ref = make_clip(cfg_on, kind="isol", seconds=4.0, n_notes=5,
                       seed=11)
    assert t_on.transcribe(w).notes == t_off.transcribe(w).notes


def test_restruck_pitch_recovered(tiny_config, tiny_transcriber):
    """Soft re-strikes of a pitch right after a loud strike: the
    OPT-IN repeated-note configuration (duration-aware shadow window +
    onset-refractory duration gate, see LoopConfig.onset_refractory_frac
    for why it is not the default) must emit them as separate notes,
    where the default greedy pursuit prefers one long atom spanning
    all the strikes."""
    from amt_saga_tpu.core.notes import NoteSequence
    from amt_saga_tpu.runtime.fixtures import render_notes

    ref = NoteSequence()
    t = 0.3
    for pitch, vels in [(52, (110, 45, 40)), (64, (100, 50, 44)),
                        (71, (105, 42, 48))]:
        for v in vels:
            ref.add(t, 0.28, pitch, v, 0)
            t += 0.42
        t += 0.3
    wave = render_notes(ref, tiny_config,
                        int(5.5 * tiny_config.dsp.sample_rate))
    cfg_rep = tiny_config.override(**{
        "loop.shadow_window": "duration",
        "loop.onset_refractory_frac": 0.35})
    res = note_f1(Transcriber(cfg_rep).transcribe(wave), ref)
    assert res.recall >= 0.85, (res.recall, res.precision, res.n_pred)
    assert res.precision >= 0.85, (res.recall, res.precision)

    # The default config is the ablation: greedy pursuit swallows
    # re-strikes into one long atom (this is the measured tradeoff
    # documented in LoopConfig — if the default ever catches up, the
    # refractory knob can be retired).
    res_def = note_f1(tiny_transcriber.transcribe(wave), ref)
    assert res.recall >= res_def.recall, (res.recall, res_def.recall)
