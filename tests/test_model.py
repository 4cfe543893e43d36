"""Classifier + trainer tests (SURVEY.md C7/C13/C14)."""

import numpy as np
import jax
import pytest

from amt_saga_tpu.models.classifier import (
    build_classifier,
    init_params,
    make_cnn_score_fn,
)
from amt_saga_tpu.models.train import (
    batch_iterator,
    create_state,
    load_checkpoint,
    save_checkpoint,
    train,
    train_step,
)
from amt_saga_tpu.runtime.examples import make_example_batch


def test_classifier_shapes(tiny_config):
    cfg = tiny_config
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = build_classifier(cfg)
    spec = np.random.default_rng(0).random((2, 48, cfg.dsp.n_bins),
                                           dtype=np.float32)
    out = model.apply({"params": params}, spec)
    n_q = cfg.synth.n_instruments * cfg.synth.n_pitches
    assert out["onset_pitch"].shape == (2, 48, n_q)
    assert out["duration"].shape == (2, 48, len(cfg.synth.duration_grid))
    assert out["presence"].shape == (2, 48)
    assert out["velocity"].shape == (2, 48, n_q)
    v = np.asarray(out["velocity"])
    assert np.all((v >= 0.0) & (v <= 1.0))


def test_example_batch_labels(tiny_config):
    cfg = tiny_config
    eb = make_example_batch(cfg, batch_size=2, seconds=3.0, seed=0,
                            kind="isol", residual_p=0.0)
    assert eb.spec.shape[0] == 2
    assert eb.onset_pitch.shape[:2] == eb.spec.shape[:2]
    # every full-strength onset label has presence and a duration class
    # (soft +-1-frame neighbor labels carry 0.4 and no duration)
    t, q = np.nonzero(eb.onset_pitch[0] == 1.0)
    assert len(t) > 0
    assert np.all(eb.presence[0][t] == 1.0)
    assert np.all(eb.duration[0][t] >= 0)


def test_residual_augmentation_reduces_labels(tiny_config):
    cfg = tiny_config
    full = make_example_batch(cfg, batch_size=4, seconds=3.0, seed=1,
                              kind="mus", residual_p=0.0)
    aug = make_example_batch(cfg, batch_size=4, seconds=3.0, seed=1,
                             kind="mus", residual_p=1.0)
    assert aug.onset_pitch.sum() < full.onset_pitch.sum()
    # augmented spectrogram has less energy than the full mix
    assert aug.spec.sum() < full.spec.sum()


def test_training_reduces_loss(tiny_config):
    cfg = tiny_config.override(**{"train.batch_size": 2,
                                  "train.learning_rate": 1e-3})
    state, tx = create_state(cfg, jax.random.PRNGKey(0))
    from amt_saga_tpu.models.classifier import build_classifier
    model = build_classifier(cfg)
    it = batch_iterator(cfg, seconds=2.0, kind="isol", seed=0)
    batch = next(it)  # overfit one batch: loss must drop sharply
    losses = []
    for _ in range(15):
        state, m = train_step(state, batch, cfg, model, tx)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses


def test_checkpoint_roundtrip(tiny_config, tmp_path):
    cfg = tiny_config.override(**{"train.checkpoint_dir": str(tmp_path),
                                  "train.batch_size": 2})
    state, _ = create_state(cfg, jax.random.PRNGKey(0))
    path = save_checkpoint(cfg, state)
    restored = load_checkpoint(cfg, path)
    leaves_a = jax.tree.leaves(state.params)
    leaves_b = jax.tree.leaves(restored)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_warm_start(tiny_config, tmp_path):
    """train(init_from=...) continues from a saved checkpoint's params
    (fresh optimizer state) instead of re-initializing."""
    from amt_saga_tpu.models.train import train

    cfg = tiny_config.override(**{"train.checkpoint_dir": str(tmp_path),
                                  "train.batch_size": 2,
                                  "train.checkpoint_every": 100000})
    state, _ = create_state(cfg, jax.random.PRNGKey(7))
    path = save_checkpoint(cfg, state)
    out = train(cfg, steps=30, seconds=2.0, kind="isol",
                checkpoint=False, init_from=path)
    # A few steps from the warm start must differ from the checkpoint
    # but stay close (same starting point; the lr schedule's warmup
    # makes the first step a no-op); a fresh init would differ wildly.
    a = jax.tree.leaves(state.params)
    b = jax.tree.leaves(out.params)
    deltas = [float(np.abs(np.asarray(x) - np.asarray(y)).max())
              for x, y in zip(a, b)]
    assert max(deltas) > 0.0                  # it trained
    assert max(deltas) < 0.1, deltas          # from THESE params


def test_train_freeze_heads(tiny_config):
    """train(freeze_heads=("head_duration",)) must leave that head's
    parameters bit-identical while the rest train (the warm-start
    continuation fix: a fresh optimizer's moments + warmup collapse a
    converged sharply-curved head — benchmarks/history.jsonl dense
    continuation negative)."""
    from amt_saga_tpu.models.train import train

    cfg = tiny_config.override(**{"train.batch_size": 2})
    out = train(cfg, steps=8, seconds=2.0, kind="isol",
                checkpoint=False, freeze_heads=("head_duration",),
                flat_lr=1e-3)
    init, _ = create_state(cfg, jax.random.PRNGKey(cfg.train.seed))
    frozen = jax.tree.map(np.asarray, out.params["head_duration"])
    frozen0 = jax.tree.map(np.asarray, init.params["head_duration"])
    assert all(np.array_equal(a, b) for a, b in
               zip(jax.tree.leaves(frozen), jax.tree.leaves(frozen0)))
    moved = [float(np.abs(np.asarray(x) - np.asarray(y)).max())
             for x, y in zip(jax.tree.leaves(out.params["head_onset_pitch"]),
                             jax.tree.leaves(
                                 init.params["head_onset_pitch"]))]
    assert max(moved) > 0.0  # the unfrozen heads trained

    import pytest

    with pytest.raises(ValueError, match="freeze names"):
        create_state(cfg, jax.random.PRNGKey(0), freeze=("no_such_head",))


def test_cnn_score_fn_plugs_into_loop(tiny_config, tiny_transcriber):
    # Smoke: an untrained CNN drops into the loop's score_fn slot and the
    # whole device program still compiles and terminates.
    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = tiny_config
    params = init_params(cfg, jax.random.PRNGKey(0))
    tr = Transcriber(cfg, score_fn=make_cnn_score_fn(cfg, params))
    wave, _ = make_clip(cfg, kind="isol", seconds=3.0, n_notes=2, seed=0)
    seq = tr.transcribe(wave)
    assert len(seq) <= cfg.loop.max_notes


def test_score_fn_contract_spec_space_alignment(tiny_config):
    """score_fn contract: coarse[t] scores a TRUE onset at frame t.

    Regression for an off-by-`lead` bug: the residual is front-padded by
    the template lead, and an adapter that feeds padded rows to a
    spec-space model shifts every onset by +lead frames.  Uses a config
    with lead=3 (hop=n_fft/4) and an oracle classifier that marks the
    ground-truth onsets in SPEC space — exact recovery proves the loop
    maps score indices to true frames correctly.
    """
    import jax.numpy as jnp

    from amt_saga_tpu.evaluation.f1 import note_f1
    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber
    from amt_saga_tpu.synth.templates import template_lead

    cfg = tiny_config.override(**{"dsp.hop": 128, "dsp.pad_frames_to": 8})
    assert template_lead(cfg.dsp) == 3
    wave, ref = make_clip(cfg, kind="isol", seconds=3.0, n_notes=3, seed=0)
    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    onsets = {(round(n.onset / spf), n.pitch - cfg.synth.pitch_min)
              for n in ref}

    def oracle_score_fn(res, tmpl, n_frames):
        n_q = tmpl.norms.shape[0]
        scores = jnp.full((res.shape[0], n_frames, n_q), -1e6)
        for t, q in onsets:
            scores = scores.at[:, t, q].set(1.0)
        return scores

    tr = Transcriber(cfg, score_fn=oracle_score_fn)
    pred = tr.transcribe(wave)
    r = note_f1(pred, ref)
    assert r.f1 == 1.0, (r, pred.to_arrays(), ref.to_arrays())
    for p, g in zip(pred.sorted().notes, ref.sorted().notes):
        assert abs(p.onset - g.onset) < 1e-6


def test_untrained_hybrid_cnn_matches_heuristic(tiny_config,
                                                tiny_transcriber):
    """The v2 score head composes the matched filter with a learned gate
    whose heads are ZERO-INITIALIZED: an untrained CNN transcriber must
    make bit-identical decisions to the heuristic (the gate is a uniform
    positive scale, which preserves every argmax / local max / quantized
    comparison).  This is the structural clean-data floor — training can
    only move away from heuristic behavior where the loss says so."""
    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = tiny_config
    params = init_params(cfg, jax.random.PRNGKey(3))
    tr_cnn = Transcriber(cfg, score_fn=make_cnn_score_fn(cfg, params))
    for kind, seed in (("isol", 5), ("mus", 7)):
        wave, _ = make_clip(cfg, kind=kind, seconds=3.0, n_notes=4,
                            n_voices=3, seed=seed)
        a = tiny_transcriber.transcribe(wave)
        b = tr_cnn.transcribe(wave)
        assert a.sorted().notes == b.sorted().notes, (kind, seed)


def test_static_gate_cnn_untrained_matches_heuristic(tiny_config,
                                                     tiny_transcriber):
    """run.cnn_gate="static" keeps the same zero-init invariance: the
    precomputed gate is uniform gate0, so gate_rel == 1.0 elementwise and
    the loop's decisions are bit-identical to the heuristic — while the
    conv tower runs once per batch instead of once per iteration."""
    from amt_saga_tpu.runtime.fixtures import make_clip
    from amt_saga_tpu.saga.loop import Transcriber

    cfg = tiny_config.override(**{"run.cnn_gate": "static"})
    params = init_params(cfg, jax.random.PRNGKey(3))
    fn = make_cnn_score_fn(cfg, params)
    assert getattr(fn, "precompute_gate", None) is not None
    tr_static = Transcriber(cfg, score_fn=fn)
    for kind, seed in (("isol", 5), ("mus", 7)):
        wave, _ = make_clip(cfg, kind=kind, seconds=3.0, n_notes=4,
                            n_voices=3, seed=seed)
        a = tiny_transcriber.transcribe(wave)
        b = tr_static.transcribe(wave)
        assert a.sorted().notes == b.sorted().notes, (kind, seed)


def test_static_gate_rejects_unknown_mode(tiny_config):
    import pytest

    cfg = tiny_config.override(**{"run.cnn_gate": "sometimes"})
    params = init_params(cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="cnn_gate"):
        make_cnn_score_fn(cfg, params)


def test_loop_state_sampler(tiny_config):
    """Mid-transcription training states: residual comes from the REAL
    loop, labels are the not-yet-extracted notes."""
    from amt_saga_tpu.runtime.examples import LoopStateSampler

    cfg = tiny_config
    s = LoopStateSampler(cfg)
    full = make_example_batch(cfg, batch_size=2, seconds=3.0, seed=11,
                              kind="mus", residual_p=0.0)
    eb = s.batch(batch_size=2, seconds=3.0, seed=11, kind="mus")
    assert eb.spec.shape == full.spec.shape
    assert eb.onset_pitch.shape == full.onset_pitch.shape
    # The loop extracted some notes -> fewer remaining labels, less
    # residual energy than the untouched mix (cut may be 0; use a seed
    # whose cut is > 0).
    extracted = full.onset_pitch.sum() - eb.onset_pitch.sum()
    assert extracted >= 0
    assert eb.spec.sum() <= full.spec.sum() + 1e-3
    # Velocity labels live exactly on the hard onset cells.
    assert np.all((eb.velocity > 0) <= (eb.onset_pitch == 1.0))


def test_velocity_head_learns(tiny_config):
    """The velocity regression head (SURVEY.md C7) fits onset velocities:
    overfitting one batch drives masked-MSE well below the variance of
    the velocity labels themselves."""
    cfg = tiny_config.override(**{"train.batch_size": 2,
                                  "train.learning_rate": 1e-3})
    state, tx = create_state(cfg, jax.random.PRNGKey(0))
    model = build_classifier(cfg)
    it = batch_iterator(cfg, seconds=2.0, kind="mus", seed=3)
    batch = next(it)
    first = last = None
    for _ in range(30):
        state, m = train_step(state, batch, cfg, model, tx)
        if first is None:
            first = float(m["l_vel"])
        last = float(m["l_vel"])
    assert last < first * 0.5, (first, last)


def test_predict_dense_surfaces(tiny_config):
    from amt_saga_tpu.models.classifier import predict_dense

    cfg = tiny_config
    params = init_params(cfg, jax.random.PRNGKey(0))
    spec = np.random.default_rng(0).random((1, 32, cfg.dsp.n_bins),
                                           dtype=np.float32)
    out = predict_dense(cfg, params, spec)
    for k in ("onset_pitch", "duration", "presence", "velocity"):
        a = np.asarray(out[k])
        assert np.all((a >= 0.0) & (a <= 1.0)), k
    # duration is a softmax distribution over the grid
    np.testing.assert_allclose(np.asarray(out["duration"]).sum(-1), 1.0,
                               rtol=1e-5)


def test_bfloat16_conv_tower(tiny_config):
    """ModelConfig.dtype='bfloat16': conv tower computes in bf16 (MXU
    native) while heads stay float32."""
    import jax.numpy as jnp

    cfg = tiny_config.override(**{"model.dtype": "bfloat16"})
    params = init_params(cfg, jax.random.PRNGKey(0))
    model = build_classifier(cfg)
    spec = np.random.default_rng(0).random((2, 32, cfg.dsp.n_bins),
                                           dtype=np.float32)
    out = model.apply({"params": params}, spec)
    assert out["onset_pitch"].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out["onset_pitch"])))
