"""Training-example generator (SURVEY.md C13); corpus formats live in datasets.py.

Produces dense per-frame label maps for the fully-convolutional classifier
from (audio, ground-truth NoteSequence) pairs:

* ``onset_pitch`` [T, Q]: 1 where a note of flat class q starts at frame t.
* ``duration``    [T]: duration-grid class index at onset frames, -1 else.
* ``presence``    [T]: 1 where any onset occurs.

Residual-style augmentation (SURVEY.md C13: the classifier runs on
RESIDUALS inside the loop, not just full mixes): with probability
``residual_p`` a random subset of ground-truth notes is subtracted from
the spectrogram using the same template bank the loop uses, and those
notes are removed from the labels — mimicking mid-loop states.

Dataset semantics of MAPS (ISOL/MUS), MAESTRO (long) and MusicNet (multi)
are reproduced by the fixture generator (:mod:`.fixtures`); real corpora
are not downloadable in this environment (SURVEY.md §4.3).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..config import Config
from ..core.notes import NoteSequence
from ..golden.dsp_np import spectrogram_np
from ..synth.templates import template_bank, template_lead
from .fixtures import make_clip


@dataclass
class ExampleBatch:
    spec: np.ndarray         # [B, T, F] float32 linear magnitude
    onset_pitch: np.ndarray  # [B, T, Q] float32 0/1
    duration: np.ndarray     # [B, T] int32 class or -1
    presence: np.ndarray     # [B, T] float32 0/1
    velocity: np.ndarray     # [B, T, Q] float32 velocity/127 at onsets


def _labels_for(seq: NoteSequence, cfg: Config, n_frames: int
                ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    n_q = cfg.synth.n_instruments * cfg.synth.n_pitches
    n_d = len(cfg.synth.duration_grid)
    onset_pitch = np.zeros((n_frames, n_q), dtype=np.float32)
    duration = np.full((n_frames,), -1, dtype=np.int32)
    presence = np.zeros((n_frames,), dtype=np.float32)
    velocity = np.zeros((n_frames, n_q), dtype=np.float32)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    grid = np.asarray(cfg.synth.duration_grid)
    for n in seq:
        t = int(round(n.onset / spf))
        if not (0 <= t < n_frames):
            continue
        pi = n.pitch - cfg.synth.pitch_min
        if not (0 <= pi < cfg.synth.n_pitches):
            continue
        if not (0 <= n.program < cfg.synth.n_instruments):
            # Out-of-vocabulary instrument (e.g. MusicNet strings with a
            # piano-only config): no label target for it.
            continue
        q = n.program * cfg.synth.n_pitches + pi
        onset_pitch[t, q] = 1.0
        # Soft neighbors: a 1-frame onset ambiguity is within the 50 ms
        # eval tolerance; hard single-frame targets make the model
        # over-penalize near-misses and under-commit.
        for dt in (-1, 1):
            if 0 <= t + dt < n_frames:
                onset_pitch[t + dt, q] = max(onset_pitch[t + dt, q], 0.4)
        duration[t] = int(np.argmin(np.abs(grid - n.duration))) % n_d
        presence[t] = 1.0
        velocity[t, q] = n.velocity / 127.0
    return onset_pitch, duration, presence, velocity


def _subtract_notes(spec: np.ndarray, notes: list, cfg: Config
                    ) -> np.ndarray:
    """Subtract the templates of given ground-truth notes (host NumPy)."""
    bank = template_bank(cfg.synth, cfg.dsp)
    lead = template_lead(cfg.dsp)
    tmax = cfg.synth.template_frames
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    grid = np.asarray(cfg.synth.duration_grid)
    res = np.concatenate([
        np.zeros((lead, spec.shape[1]), np.float32),
        spec,
        np.zeros((tmax, spec.shape[1]), np.float32),
    ])
    for n in notes:
        t = int(round(n.onset / spf))
        pi = n.pitch - cfg.synth.pitch_min
        di = int(np.argmin(np.abs(grid - n.duration)))
        g = n.velocity / 127.0
        w = bank[n.program, pi, di]
        res[t:t + tmax] = np.maximum(res[t:t + tmax] - g * w, 0.0)
    return res[lead:lead + spec.shape[0]]


def make_example_batch(
    cfg: Config,
    *,
    batch_size: int = 8,
    seconds: float = 4.0,
    seed: int = 0,
    kind: str = "mus",
    residual_p: float = 0.5,
    noise: float = 0.0,
    programs: tuple[int, ...] = (0,),
) -> ExampleBatch:
    rng = np.random.default_rng(seed)
    specs, ops, durs, pres, vels = [], [], [], [], []
    for b in range(batch_size):
        wave, seq = make_clip(cfg, kind=kind, seconds=seconds,
                              seed=seed * 1000 + b, noise=noise,
                              programs=programs)
        spec = spectrogram_np(wave, cfg.dsp)
        notes = list(seq)
        if notes and rng.random() < residual_p:
            k = int(rng.integers(1, max(2, len(notes))))
            idx = rng.permutation(len(notes))[:k]
            removed = [notes[i] for i in idx]
            spec = _subtract_notes(spec, removed, cfg)
            notes = [n for i, n in enumerate(notes) if i not in set(idx)]
        op, du, pr, ve = _labels_for(NoteSequence(notes), cfg,
                                     spec.shape[0])
        specs.append(spec)
        ops.append(op)
        durs.append(du)
        pres.append(pr)
        vels.append(ve)
    return ExampleBatch(
        spec=np.stack(specs), onset_pitch=np.stack(ops),
        duration=np.stack(durs), presence=np.stack(pres),
        velocity=np.stack(vels))


class LoopStateSampler:
    """Training examples from the loop's OWN mid-transcription states.

    Round 1 approximated mid-loop residuals by subtracting random
    ground-truth subsets with EXACT gains; the real loop subtracts
    estimated notes (refit gains, occasional off-by-one onsets, grid-
    snapped durations), leaving characteristic artifacts the classifier
    must score through.  This sampler runs the actual jitted loop
    (saga.loop.transcribe_partial) to a random iteration cut, takes the
    device residual, and labels the notes NOT yet extracted — extracted
    notes are matched to ground truth by (q, onset within ``match_tol``
    frames) and removed from the label maps.

    One compiled program serves every cut (``max_iters`` is traced).
    """

    def __init__(self, cfg: Config):
        import jax
        import jax.numpy as jnp

        from ..saga.loop import load_template_arrays, transcribe_partial

        # The sampler feeds host spectrograms straight into the loop, so
        # keep unpadded bins (the Pallas front-end's 128-aligned padding
        # never enters this path).
        self.cfg = cfg.override(**{"run.use_pallas": False})
        self.tmpl = load_template_arrays(self.cfg)
        self._tmpl_dev = jax.device_put(self.tmpl)
        self._jit = jax.jit(
            lambda spec, tmpl, k: transcribe_partial(
                spec, self.cfg, tmpl, k))
        self._jnp = jnp

    def batch(self, *, batch_size: int = 8, seconds: float = 4.0,
              seed: int = 0, kind: str = "mus", noise: float = 0.0,
              match_tol: int = 2) -> ExampleBatch:
        import jax

        cfg = self.cfg
        rng = np.random.default_rng(seed)
        waves, refs = [], []
        for b in range(batch_size):
            w, seq = make_clip(cfg, kind=kind, seconds=seconds,
                               seed=seed * 1000 + b, noise=noise)
            waves.append(spectrogram_np(w, cfg.dsp))
            refs.append(seq)
        spec0 = np.stack(waves)
        # Random cut: 0 = clean input (the loop's first iteration also
        # sees the raw spectrogram), else mid-transcription.
        k = int(rng.integers(0, 13))
        notes, res = jax.device_get(self._jit(
            self._jnp.asarray(spec0), self._tmpl_dev,
            self._jnp.asarray(k, np.int32)))

        spf = cfg.dsp.hop / cfg.dsp.sample_rate
        specs, ops, durs, pres, vels = [], [], [], [], []
        for b in range(batch_size):
            remaining = list(refs[b])
            for i in range(int(notes.count[b])):
                q = int(notes.program[b, i]) * cfg.synth.n_pitches + int(
                    notes.pitch[b, i])
                t = int(notes.onset[b, i])
                best, best_dt = None, match_tol + 1
                for j, n in enumerate(remaining):
                    pi = n.pitch - cfg.synth.pitch_min
                    qj = n.program * cfg.synth.n_pitches + pi
                    dt = abs(int(round(n.onset / spf)) - t)
                    if qj == q and dt < best_dt:
                        best, best_dt = j, dt
                if best is not None:
                    remaining.pop(best)
                # Unmatched extraction = a false positive the loop
                # subtracted anyway; its artifact stays in the residual
                # (realistic), nothing to remove from the labels.
            op, du, pr, ve = _labels_for(NoteSequence(remaining), cfg,
                                         res.shape[1])
            specs.append(res[b])
            ops.append(op)
            durs.append(du)
            pres.append(pr)
            vels.append(ve)
        return ExampleBatch(
            spec=np.stack(specs), onset_pitch=np.stack(ops),
            duration=np.stack(durs), presence=np.stack(pres),
            velocity=np.stack(vels))
