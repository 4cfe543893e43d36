"""Capacity saturation flag + length-bucket planning (SURVEY.md §5
failure detection / §7 length bucketing; round-2 verdict item #4)."""

import dataclasses

import jax
import numpy as np

from amt_saga_tpu.golden.pipeline import transcribe_golden
from amt_saga_tpu.runtime.bucketing import bucket_for, choose_length_buckets
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import (
    Transcriber,
    load_template_arrays,
    notes_batch_to_sequences,
    transcribe_waves,
)


def _tiny_cap_cfg(tiny_config, cap=3):
    # recover_absent off: this file pins the LOOP's truncation
    # semantics, and the emission-side recovery scan (correctly)
    # salvages notes a saturated lane never emitted, changing counts.
    return dataclasses.replace(
        tiny_config, loop=dataclasses.replace(tiny_config.loop,
                                              max_notes=cap,
                                              recover_absent=False))


def test_saturation_flagged_not_silent(tiny_config):
    """A clip with more notes than max_notes sets NotesBatch.saturated."""
    cfg = _tiny_cap_cfg(tiny_config, cap=3)
    wave, ref = make_clip(cfg, kind="isol", seconds=6.0, n_notes=6, seed=3)
    tmpl = load_template_arrays(cfg)
    notes = jax.device_get(
        jax.jit(lambda w, t: transcribe_waves(w, cfg, t))(
            wave[None], tmpl))
    assert int(notes.count[0]) == 3
    assert bool(notes.saturated[0])
    gold = transcribe_golden(wave, cfg)
    assert gold.count == 3
    assert gold.saturated


def test_saturation_warns_and_still_emits(tiny_config, capsys):
    cfg = _tiny_cap_cfg(tiny_config, cap=3)
    wave, _ = make_clip(cfg, kind="isol", seconds=6.0, n_notes=6, seed=3)
    tr = Transcriber(cfg)
    seqs = tr.transcribe_batch(wave[None])
    assert len(seqs[0]) == 3  # truncated, not empty
    # The package logger writes to stderr (propagate=False).
    assert "max_notes" in capsys.readouterr().err


def test_unsaturated_clip_not_flagged(tiny_config, tiny_transcriber):
    wave, _ = make_clip(tiny_config, kind="isol", seconds=4.0, n_notes=3,
                        seed=2)
    tmpl = tiny_transcriber.tmpl
    notes = jax.device_get(tiny_transcriber._fn(np.asarray(wave)[None]))
    assert not bool(notes.saturated[0])


# ---- length buckets ----


def test_buckets_uniform_corpus_single_shape():
    assert choose_length_buckets([1000] * 64, 4, quantum=256) == [1024]


def test_buckets_outlier_isolated():
    lens = [8000] * 63 + [80000]
    b = choose_length_buckets(lens, 4, quantum=1000)
    assert b[-1] == 80000
    assert b[0] == 8000
    assert len(b) == 2  # one extra compile, 63 clips stop paying 10x


def test_buckets_respect_quantum_and_cover_max():
    lens = [1001, 5000, 12345, 70000]
    b = choose_length_buckets(lens, 3, quantum=1024)
    assert all(x % 1024 == 0 for x in b)
    assert b[-1] >= 70000
    for n in lens:
        assert bucket_for(n, b, 1024) >= n


def test_bucket_for_beyond_plan_never_truncates():
    b = [8192]
    assert bucket_for(10000, b, 1024) == 10240


def test_buckets_stable_under_resume_subset():
    """Buckets are a function of the FULL corpus; any todo-subset of it
    maps into the same planned shapes."""
    full = [8000] * 10 + [16000] * 10 + [64000]
    b = choose_length_buckets(full, 4, quantum=1000)
    done_removed = full[3:]  # a resumed run's remainder
    for n in done_removed:
        assert bucket_for(n, b, 1000) in b
