"""Standalone dense-CNN decode tests (SURVEY.md C7/L2; the bank-free
fallback mode — models/dense_decoder.py)."""

import jax
import numpy as np
import pytest

from amt_saga_tpu.models.classifier import build_classifier, init_params
from amt_saga_tpu.models.dense_decoder import DenseTranscriber, decode_dense


def _heads_with_onsets(cfg, t_frames, events, base_logit=-8.0,
                       peak_logit=8.0):
    """Synthetic raw heads with hard onset peaks at given (t, q, d, vel)."""
    n_q = cfg.synth.n_instruments * cfg.synth.n_pitches
    n_d = len(cfg.synth.duration_grid)
    onset = np.full((1, t_frames, n_q), base_logit, np.float32)
    pres = np.full((1, t_frames), base_logit, np.float32)
    dur = np.zeros((1, t_frames, n_d), np.float32)
    vel = np.full((1, t_frames, n_q), 0.5, np.float32)
    for t, q, d, v in events:
        onset[0, t, q] = peak_logit
        pres[0, t] = peak_logit
        dur[0, t, :] = -8.0
        dur[0, t, d] = 8.0
        vel[0, t, q] = v
    return {"onset_pitch": onset, "presence": pres, "duration": dur,
            "velocity": vel}


def test_decode_dense_recovers_events(tiny_config):
    cfg = tiny_config
    events = [(5, 2, 1, 0.25), (20, 7, 2, 0.75)]
    heads = _heads_with_onsets(cfg, 40, events)
    out = jax.device_get(decode_dense(cfg, heads))
    assert int(out["count"][0]) == 2
    got = {(int(out["onset_frame"][0, i]), int(out["q"][0, i]),
            int(out["dur_idx"][0, i]),
            round(float(out["velocity"][0, i]), 2))
           for i in range(2)}
    assert got == {(5, 2, 1, 0.25), (20, 7, 2, 0.75)}


def test_decode_dense_nms_suppresses_neighbors(tiny_config):
    """Soft ±1-frame label neighbors produce sub-peak probabilities next
    to a real onset; temporal NMS must emit exactly one event."""
    cfg = tiny_config
    heads = _heads_with_onsets(cfg, 40, [(10, 3, 0, 0.5)])
    # shoulder cells: above threshold but below the center
    heads["onset_pitch"][0, 9, 3] = 2.0
    heads["onset_pitch"][0, 11, 3] = 2.0
    out = jax.device_get(decode_dense(cfg, heads))
    assert int(out["count"][0]) == 1
    assert int(out["onset_frame"][0, 0]) == 10


def test_decode_dense_threshold_and_cap(tiny_config):
    cfg = tiny_config
    heads = _heads_with_onsets(cfg, 40, [])
    out = jax.device_get(decode_dense(cfg, heads))
    assert int(out["count"][0]) == 0            # nothing above threshold
    # every frame a peak -> capped at loop.max_notes, all valid
    many = [(t, t % 4, 0, 0.5) for t in range(2, 38, 3)]
    heads = _heads_with_onsets(cfg, 40, many)
    out = jax.device_get(decode_dense(cfg, heads))
    assert int(out["count"][0]) == min(len(many), cfg.loop.max_notes)


def test_dense_transcriber_end_to_end_shapes(tiny_config):
    """Untrained params: the full wave -> notes path runs and emits a
    valid (possibly empty) NoteSequence with in-range fields."""
    from amt_saga_tpu.runtime.fixtures import make_clip

    cfg = tiny_config
    params = init_params(cfg, jax.random.PRNGKey(0))
    tr = DenseTranscriber(cfg, params)
    wave, _ = make_clip(cfg, kind="isol", seconds=3.0, n_notes=3, seed=0)
    seq = tr.transcribe(wave)
    assert len(seq) <= cfg.loop.max_notes
    for n in seq:
        assert cfg.synth.pitch_min <= n.pitch <= cfg.synth.pitch_max
        assert 1 <= n.velocity <= 127
        assert n.duration in cfg.synth.duration_grid
        assert 0 <= n.program < cfg.synth.n_instruments


def test_dense_transcriber_learns_fixture(tiny_config):
    """Trained end-to-end on the tiny config, the dense mode must
    recover an isolated-note fixture reasonably (the bank-free bar: no
    template matched filter anywhere in the path)."""
    from amt_saga_tpu.evaluation.f1 import note_f1
    from amt_saga_tpu.models.train import train
    from amt_saga_tpu.runtime.fixtures import make_clip

    cfg = tiny_config.override(**{"train.batch_size": 4,
                                  "train.learning_rate": 1e-3,
                                  "train.steps": 300,
                                  # SHORT-run recipe only: at 300 steps a
                                  # low positive weight converges faster.
                                  # At full scale pos_weight=64 wins by
                                  # 24 pts mean F1 (eval_dense sweeps,
                                  # docs/PERFORMANCE.md round 3) and is
                                  # the production default.
                                  "train.pos_weight": 8.0,
                                  "model.dense_threshold": 0.8})
    state = train(cfg, steps=300, kind="isol", seconds=3.0,
                  cache_batches=4, checkpoint=False)
    tr = DenseTranscriber(cfg, state.params)
    f1s = []
    for seed in range(3):
        wave, ref = make_clip(cfg, kind="isol", seconds=3.0, n_notes=3,
                              seed=seed)
        f1s.append(note_f1(tr.transcribe(wave), ref).f1)
    assert np.mean(f1s) >= 0.5, f1s


def test_cli_accepts_cnn_dense(tiny_config, tmp_path):
    """_make_transcriber builds a DenseTranscriber for cnn_dense and
    fails with a clear error when no checkpoint exists."""
    from amt_saga_tpu.cli import _make_transcriber
    from amt_saga_tpu.models.train import create_state, save_checkpoint

    cfg = tiny_config.override(**{"train.checkpoint_dir": str(tmp_path),
                                  "run.classifier": "cnn_dense"})
    # Empty checkpoint_dir falls back to the shipped default-config
    # checkpoint, whose shapes mismatch the tiny config -> loud
    # ValueError from load_checkpoint's shape validation.
    with pytest.raises((SystemExit, ValueError)):
        _make_transcriber(cfg)
    state, _ = create_state(cfg, jax.random.PRNGKey(0))
    save_checkpoint(cfg, state)
    tr = _make_transcriber(cfg)
    assert isinstance(tr, DenseTranscriber)
