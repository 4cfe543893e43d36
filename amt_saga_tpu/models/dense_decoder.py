"""Standalone dense-CNN transcription — the bank-free fallback mode
(SURVEY.md C7/L2; round-2 verdict "missing #1").

The default `cnn` classifier mode COMPOSES the template matched filter
with a learned gate (models/classifier.py): structurally zero clean-data
regression, but if the template bank badly mismatches the real
instrument the matched filter and its gate collapse together.  The
reference's CNN classifies spectrogram patches on its own [SURVEY.md
C7]; this module is that capability, TPU-shaped: ONE fully-convolutional
forward over the whole spectrogram and a vectorized peak decode — no
template bank, no SAGA loop, no per-patch recropping.

Decode (all static shapes, one jitted program):

1. ``score[t, q] = P(onset q at t) * P(any onset at t)`` from the
   trained heads.
2. Temporal non-max suppression per q (the training labels carry soft
   ±1-frame neighbors at 0.4, so real onsets produce a 3-frame plateau
   with a strict center — ``reduce_window`` max over ±peak_radius).
3. ``top_k`` over the flattened [T*Q] map caps emissions at
   ``loop.max_notes`` (densest-first, deterministic).
4. Duration = duration-head argmax at the onset frame (grid seconds);
   velocity = velocity head at (t, q) — the loop-free analogues of the
   refit/refiner stages.

This mode trades the loop's subtractive exactness for independence from
the synthesizer: it is the escape hatch when templates cannot be
trusted, and the dense analogue of onset-and-frames-style decoders.
Accuracy is gated by ``selftest`` (bar pinned from the shipped
checkpoint's measured fixtures performance, benchmarks/history.jsonl).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core.notes import NoteSequence
from .classifier import build_classifier


def decode_dense(cfg: Config, heads: dict[str, jnp.ndarray],
                 threshold: float | None = None,
                 peak_radius: int | None = None) -> dict[str, jnp.ndarray]:
    """Raw classifier heads -> capped note-event arrays (jittable).

    Returns ``onset_frame``/``q``/``dur_idx`` int32 [B, cap],
    ``velocity`` float32 [B, cap] in [0, 1], ``valid`` bool [B, cap],
    ``count`` int32 [B]; entries are score-descending per lane.
    """
    thr = cfg.model.dense_threshold if threshold is None else threshold
    rad = cfg.model.dense_peak_radius if peak_radius is None else peak_radius
    onset = jax.nn.sigmoid(heads["onset_pitch"])          # [B, T, Q]
    pres = jax.nn.sigmoid(heads["presence"])              # [B, T]
    score = onset * pres[..., None]
    b, t, n_q = score.shape

    # Temporal NMS per q: a cell survives iff it equals the window max.
    # Ties inside one plateau admit every tied cell; float scores make
    # exact ties vanishingly rare and top_k keeps the result capped.
    neigh = jax.lax.reduce_window(
        score, -jnp.inf, jax.lax.max,
        window_dimensions=(1, 2 * rad + 1, 1),
        window_strides=(1, 1, 1), padding="SAME")
    peak = (score >= neigh) & (score > thr)

    cap = min(cfg.loop.max_notes, t * n_q)
    flat = jnp.where(peak, score, -1.0).reshape(b, t * n_q)
    vals, idx = jax.lax.top_k(flat, cap)                  # [B, cap]
    tf = (idx // n_q).astype(jnp.int32)
    q = (idx % n_q).astype(jnp.int32)
    valid = vals > thr

    dur_idx = jnp.argmax(heads["duration"], axis=-1)      # [B, T]
    dur_sel = jnp.take_along_axis(dur_idx, tf, axis=1).astype(jnp.int32)
    vel = jnp.take_along_axis(
        jnp.take_along_axis(heads["velocity"], tf[:, :, None], axis=1),
        q[:, :, None], axis=2)[..., 0]
    return {"onset_frame": tf, "q": q, "dur_idx": dur_sel,
            "velocity": vel, "valid": valid,
            "count": valid.sum(axis=1).astype(jnp.int32)}


class DenseTranscriber:
    """Transcriber-shaped front door for the standalone CNN mode
    (``run.classifier="cnn_dense"``): same ``transcribe`` /
    ``transcribe_batch`` surface as :class:`saga.loop.Transcriber`, but
    the device program is spectrogram -> classifier forward -> dense
    decode — the template bank is never built."""

    def __init__(self, cfg: Config, params: Any):
        self.cfg = cfg
        self.mesh = None
        self.input_sharding = None
        model = build_classifier(cfg)

        from ..dsp.cqt import logf_spectrogram
        from ..dsp.stft import stft_magnitude

        def fn(waves: jnp.ndarray) -> dict[str, jnp.ndarray]:
            mag = jax.vmap(lambda w: stft_magnitude(w, cfg.dsp))(waves)
            spec = logf_spectrogram(mag, cfg.dsp)
            return decode_dense(cfg, model.apply({"params": params}, spec))

        self._call = jax.jit(fn)

    def _emit(self, arrs: dict, b: int) -> NoteSequence:
        """Decoded arrays for lane ``b`` -> a sorted NoteSequence."""
        spf = self.cfg.dsp.hop / self.cfg.dsp.sample_rate
        grid = np.asarray(self.cfg.synth.duration_grid, np.float64)
        n_p = self.cfg.synth.n_pitches
        seq = NoteSequence()
        for i in range(int(arrs["count"][b])):
            if not arrs["valid"][b, i]:
                continue
            q = int(arrs["q"][b, i])
            vel = int(round(float(arrs["velocity"][b, i]) * 127.0))
            seq.add(onset=float(arrs["onset_frame"][b, i]) * spf,
                    duration=float(grid[int(arrs["dur_idx"][b, i])]),
                    pitch=self.cfg.synth.pitch_min + q % n_p,
                    velocity=int(np.clip(vel, 1, 127)),
                    program=q // n_p)
        return seq.sorted()

    def transcribe_batch(self, waves: np.ndarray) -> list[NoteSequence]:
        arrs = jax.device_get(self._call(jnp.asarray(waves)))
        return [self._emit(arrs, b)
                for b in range(arrs["onset_frame"].shape[0])]

    def transcribe(self, wave: np.ndarray) -> NoteSequence:
        return self.transcribe_batch(np.asarray(wave)[None])[0]

    def warmup(self, batch: int, lengths) -> None:
        """Plain-jit warmup on a daemon thread (no AOT cache: the dense
        program is a fraction of the loop's compile cost)."""
        import threading

        def run():
            for n in lengths:
                try:
                    jax.device_get(self._call(
                        jnp.zeros((batch, int(n)), jnp.float32)))
                except Exception as e:
                    from ..utils.logging import get_logger

                    get_logger("amt_saga_tpu.models").warning(
                        "dense warmup failed (%s)", e)
                    return

        threading.Thread(target=run, daemon=True,
                         name="dense-warmup").start()

    def startup_stats(self) -> dict:
        return {}
