"""Synthetic dataset fixture generator (SURVEY.md §4.3, C10-C12 stand-ins).

Real MAPS/MAESTRO/MusicNet cannot be downloaded in this environment, so
their semantics are encoded here (SURVEY.md §7 "hard parts"):

* ``isol``  — MAPS ISOL: monophonic, non-overlapping notes.
* ``mus``   — MAPS MUS: 2-4 voice polyphony.
* ``long``  — MAESTRO: long recordings (exercises chunked streaming).
* ``multi`` — MusicNet: multi-instrument, per-note instrument labels.

Audio is rendered with the SAME additive synthesizer the transcription
templates come from (:mod:`amt_saga_tpu.synth.templates`), so clean
fixtures are exactly representable and tests can assert F1 = 1.0 and
bit-for-bit golden/TPU MIDI parity.
"""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.notes import NoteSequence, gain_to_velocity
from ..synth.templates import note_waveform

# Gains chosen to sit far from velocity-quantization boundaries.
_GAIN_LEVELS = (0.3505, 0.5005, 0.7005, 0.9005)


def render_notes(seq: NoteSequence, cfg: Config,
                 n_samples: int) -> np.ndarray:
    """Render a NoteSequence to audio with the template synthesizer."""
    wave = np.zeros(n_samples, dtype=np.float64)
    sr = cfg.dsp.sample_rate
    for n in seq:
        start = int(round(n.onset * sr))
        if start >= n_samples:
            continue
        gain = n.velocity / 127.0
        nw = note_waveform(n.pitch, n.duration, cfg.synth, cfg.dsp,
                           amplitude=gain, instrument=n.program)
        end = min(n_samples, start + len(nw))
        wave[start:end] += nw[:end - start]
    return wave.astype(np.float32)


def _snap_duration(rng: np.random.Generator, cfg: Config) -> float:
    return float(rng.choice(cfg.synth.duration_grid))


def _frame_onset(frame: int, cfg: Config) -> float:
    """Onsets land exactly on frame boundaries for clean fixtures."""
    return frame * cfg.dsp.hop / cfg.dsp.sample_rate


def make_clip(
    cfg: Config,
    *,
    kind: str = "isol",
    seconds: float = 10.0,
    n_notes: int = 8,
    n_voices: int = 3,
    seed: int = 0,
    noise: float = 0.0,
    programs: tuple[int, ...] = (0,),
) -> tuple[np.ndarray, NoteSequence]:
    """Generate one (audio, ground-truth NoteSequence) fixture pair."""
    rng = np.random.default_rng(seed)
    sr = cfg.dsp.sample_rate
    n_samples = int(round(seconds * sr))
    spf = cfg.dsp.hop / sr
    tmax_frames = int(seconds / spf)
    seq = NoteSequence()

    def add_note(frame: int, pitch: int, program: int = 0) -> None:
        dur = _snap_duration(rng, cfg)
        gain = float(rng.choice(_GAIN_LEVELS))
        vel = gain_to_velocity(gain)
        seq.add(_frame_onset(frame, cfg), dur, pitch, vel, program)

    pmin, pmax = cfg.synth.pitch_min + 12, cfg.synth.pitch_max - 12

    if kind == "isol":
        # Monophonic, well-separated onsets (MAPS ISOL).
        gap = max(4, tmax_frames // max(1, n_notes) - 1)
        frame = 4
        for _ in range(n_notes):
            if frame >= tmax_frames - 8:
                break
            add_note(frame, int(rng.integers(pmin, pmax)))
            frame += gap
    elif kind in ("mus", "long"):
        # Polyphonic 2-4 voices (MAPS MUS); "long" is the same content but
        # the caller asks for a big ``seconds`` (MAESTRO stand-in).
        for v in range(n_voices):
            frame = 4 + int(rng.integers(0, 6))
            while frame < tmax_frames - 8:
                add_note(frame, int(rng.integers(pmin, pmax)))
                frame += int(rng.integers(10, 30))
    elif kind == "multi":
        # Multi-instrument (MusicNet stand-in): voices on distinct programs.
        for v in range(n_voices):
            program = programs[v % len(programs)]
            frame = 4 + int(rng.integers(0, 6))
            while frame < tmax_frames - 8:
                add_note(frame, int(rng.integers(pmin, pmax)), program)
                frame += int(rng.integers(10, 30))
    else:
        raise ValueError(f"unknown fixture kind: {kind}")

    wave = render_notes(seq, cfg, n_samples)
    if noise > 0:
        wave = wave + noise * rng.standard_normal(n_samples).astype(
            np.float32)
    return wave.astype(np.float32), seq.sorted()


def make_corpus(cfg: Config, *, kind: str = "isol", n_clips: int = 4,
                seconds: float = 10.0, seed: int = 0,
                **kw) -> list[tuple[np.ndarray, NoteSequence]]:
    return [
        make_clip(cfg, kind=kind, seconds=seconds, seed=seed + i, **kw)
        for i in range(n_clips)
    ]
