"""Chunked streaming transcription (SURVEY.md 3.5/§5, BASELINE config 4).

Long recordings (MAESTRO stand-in) are split into fixed-length overlapping
chunks, transcribed batched/data-parallel like any other clips, and the
note events are overlap-stitched:

* chunk starts are multiples of the STFT hop, so chunk-local frame indices
  map exactly onto absolute frames (no re-quantization drift);
* a note whose onset falls in an overlap region is emitted by both
  adjacent chunks — the copy FARTHER from its own chunk boundary is kept
  (it saw more context), the other is dropped [SURVEY.md §5];
* onsets are rebased to absolute time on the host in float64.

This is the domain's long-input scaling mechanism — there is no attention
and hence no ring/Ulysses analogue (SURVEY.md §2.3): sequence parallelism
IS batch parallelism over chunks.
"""

from __future__ import annotations

import numpy as np

from ..config import Config
from ..core.notes import Note, NoteSequence


def chunk_plan(n_samples: int, cfg: Config) -> list[tuple[int, int]]:
    """[(start_sample, length_sample)] covering the waveform.

    Starts are multiples of hop; all chunks share one static length so a
    single compiled program serves the whole file (last chunk zero-padded).
    """
    sr = cfg.dsp.sample_rate
    hop = cfg.dsp.hop
    chunk = int(round(cfg.stream.chunk_seconds * sr)) // hop * hop
    overlap = int(round(cfg.stream.overlap_seconds * sr)) // hop * hop
    if chunk <= overlap:
        raise ValueError("chunk_seconds must exceed overlap_seconds")
    step = chunk - overlap
    if n_samples <= chunk:
        return [(0, chunk)]
    starts = list(range(0, n_samples - overlap, step))
    return [(s, chunk) for s in starts]


def make_chunks(wave: np.ndarray, cfg: Config) -> tuple[np.ndarray, list[int]]:
    """waveform -> ([N, chunk_samples] float32, chunk start samples)."""
    plan = chunk_plan(len(wave), cfg)
    chunk_len = plan[0][1]
    out = np.zeros((len(plan), chunk_len), dtype=np.float32)
    starts = []
    for i, (s, ln) in enumerate(plan):
        seg = wave[s:s + ln]
        out[i, :len(seg)] = seg
        starts.append(s)
    return out, starts


def stitch(
    sequences: list[NoteSequence],
    starts: list[int],
    cfg: Config,
    *,
    onset_tol: float | None = None,
) -> NoteSequence:
    """Merge per-chunk NoteSequences into one absolute-time sequence."""
    sr = cfg.dsp.sample_rate
    chunk_s = (int(round(cfg.stream.chunk_seconds * sr))
               // cfg.dsp.hop * cfg.dsp.hop) / sr
    if onset_tol is None:
        onset_tol = 2.5 * cfg.dsp.hop / sr  # ~2 frames

    # Core-region ownership: chunk k owns local onsets in
    # [left, chunk - (overlap - left)), where left = the template lead
    # time.  Cores tile the timeline exactly, and an owned onset always
    # has a full template extent of right context (validated below), so
    # boundary-truncated partial fits are dropped instead of stitched.
    from ..synth.templates import template_lead

    hop = cfg.dsp.hop
    overlap_s = (int(round(cfg.stream.overlap_seconds * sr)) // hop * hop
                 ) / sr
    left = template_lead(cfg.dsp) * hop / sr
    extent_s = (cfg.synth.template_frames + 1) * hop / sr
    if len(sequences) > 1 and overlap_s - left < extent_s:
        raise ValueError(
            f"stream.overlap_seconds ({overlap_s:.2f}s effective) must "
            f"cover template extent + lead ({extent_s + left:.2f}s); "
            "boundary notes would be truncated")
    last = len(sequences) - 1

    # (absolute note, distance to own chunk boundary, chunk index)
    cands: list[tuple[Note, float, int]] = []
    for ci, (seq, start) in enumerate(zip(sequences, starts)):
        t0 = start / sr
        core_lo = left if ci > 0 else 0.0
        core_hi = (chunk_s - (overlap_s - left)) if ci < last else np.inf
        for n in seq:
            if not (core_lo <= n.onset < core_hi):
                continue
            abs_note = Note(t0 + n.onset, n.duration, n.pitch, n.velocity,
                            n.program)
            margin = min(n.onset, max(0.0, chunk_s - n.onset))
            cands.append((abs_note, margin, ci))

    # Deterministic order: by (pitch, program, onset tick), then prefer the
    # larger boundary margin, then the earlier chunk.
    cands.sort(key=lambda c: (c[0].pitch, c[0].program, c[0].onset,
                              -c[1], c[2]))
    # Kept notes accumulate in the same sort order, so a duplicate (same
    # pitch/program, onset within tolerance) is always among the most
    # recently kept notes — a short reverse scan suffices.  Exact-onset
    # duplicates sort larger-margin-first, so the kept copy is the one
    # farther from its chunk boundary.  Only a CROSS-chunk pair is a
    # stitching duplicate: two genuine fast repeats of the same pitch
    # emitted by one chunk must both survive (they were already vetted by
    # the loop's own shadow suppression).
    kept: list[Note] = []
    kept_ci: list[int] = []
    for note, margin, ci in cands:
        dup = False
        for j in range(len(kept) - 1, -1, -1):
            prev = kept[j]
            if prev.pitch != note.pitch or prev.program != note.program:
                break
            if note.onset - prev.onset > onset_tol:
                break
            if abs(prev.onset - note.onset) <= onset_tol and kept_ci[j] != ci:
                dup = True
                break
        if not dup:
            kept.append(note)
            kept_ci.append(ci)
    return NoteSequence(kept).sorted()


def transcribe_long(wave: np.ndarray, transcriber, cfg: Config,
                    batch_size: int | None = None) -> NoteSequence:
    """Full chunked pipeline: chunk -> batched transcribe -> stitch.

    Pipelined like the corpus runner (cli.py): batch i+1 is dispatched
    BEFORE batch i's results are fetched, so JAX's async dispatch overlaps
    device compute with the host-side note conversion — a long MAESTRO
    recording streams at the chip's sustained (not sequential-latency)
    throughput.
    """
    import jax

    from ..saga.loop import notes_batch_to_sequences

    chunks, starts = make_chunks(np.asarray(wave, dtype=np.float32), cfg)
    bs = batch_size or cfg.run.batch_size
    seqs: list[NoteSequence] = []

    gram = (transcriber.host_gram()
            if hasattr(transcriber, "host_gram") else None)
    refiner = (transcriber.duration_refiner()
               if hasattr(transcriber, "duration_refiner") else None)

    snap = (transcriber.snaps_onsets()
            if hasattr(transcriber, "snaps_onsets")
            else cfg.loop.onset_snap_frames > 0)
    ev = (transcriber.evidence_runner()
          if hasattr(transcriber, "evidence_runner") else None)

    def fetch(pending, n_keep, host_batch, dev_batch):
        host = jax.device_get(pending)
        out = notes_batch_to_sequences(
            host, cfg, gram=gram, refiner=refiner,
            snap_waves=host_batch if snap and ev is None else None)
        if ev is not None:
            import numpy as _np

            out = ev.refine_batch(out, dev_batch, host_batch,
                                  snap_w=_np.asarray(host.snap_w),
                                  obs_w=_np.asarray(host.obs_w))
        seqs.extend(out[:n_keep])

    pending = None  # (device NotesBatch, n_real, host batch, dev batch)
    for i in range(0, len(chunks), bs):
        batch = chunks[i:i + bs]
        n_real = len(batch)
        if n_real < bs and len(chunks) > bs:
            # pad the tail batch so one compiled program serves all batches
            pad = np.zeros((bs - n_real, chunks.shape[1]), np.float32)
            batch = np.concatenate([batch, pad])
        dev_batch = jax.numpy.asarray(batch)
        notes = transcriber._fn(dev_batch)  # async dispatch
        if pending is not None:
            fetch(*pending)
        pending = (notes, n_real, batch, dev_batch)
    if pending is not None:
        fetch(*pending)
    return stitch(seqs, starts, cfg)
