"""On-disk corpus loader tests (SURVEY.md C10-C12)."""

import os

import numpy as np
import pytest

from amt_saga_tpu.cli import main
from amt_saga_tpu.runtime.corpus import PairedCorpus


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory, tiny_config):
    d = tmp_path_factory.mktemp("corpus")
    cfg_file = d / "cfg.json"
    cfg_file.write_text(tiny_config.to_json())
    assert main(["fixtures", str(d), "--kind", "mus", "--clips", "6",
                 "--seconds", "4.0", "--config", str(cfg_file)]) == 0
    os.remove(cfg_file)
    return str(d)


def test_scan_and_pairing(corpus_dir, tiny_config):
    c = PairedCorpus(corpus_dir)
    assert len(c) == 6
    for it in c.items:
        assert it.midi_path and os.path.exists(it.midi_path)


def test_split_is_deterministic_and_disjoint(corpus_dir):
    c = PairedCorpus(corpus_dir)
    tr1, te1 = c.split(0.3)
    tr2, te2 = c.split(0.3)
    assert [i.name for i in tr1.items] == [i.name for i in tr2.items]
    assert not set(i.name for i in tr1.items) & set(
        i.name for i in te1.items)
    assert len(tr1) + len(te1) == len(c)


def test_load_pairs(corpus_dir, tiny_config):
    c = PairedCorpus(corpus_dir)
    wave, ref = c.load(c.items[0], tiny_config)
    assert wave.dtype == np.float32 and len(ref) > 0


def test_iter_waves_fixed_shape(corpus_dir, tiny_config):
    c = PairedCorpus(corpus_dir)
    batches = list(c.iter_waves(tiny_config, batch_size=4))
    assert len(batches) == 2
    (items0, w0), (items1, w1) = batches
    assert w0.shape == w1.shape  # padded tail batch
    assert len(items0) == 4 and len(items1) == 2


def test_example_batches_from_midi_labels(corpus_dir, tiny_config):
    c = PairedCorpus(corpus_dir)
    eb = next(c.example_batches(tiny_config, batch_size=2, seconds=2.0,
                                seed=0))
    assert eb.spec.shape[0] == 2
    t, q = np.nonzero(eb.onset_pitch[0] == 1.0)
    # crops of a polyphonic clip contain onsets; labels land on frames
    assert eb.onset_pitch.sum() > 0
    assert np.all(eb.presence[0][t] == 1.0)


def test_training_on_real_corpus_batches(corpus_dir, tiny_config):
    import jax

    from amt_saga_tpu.models.classifier import build_classifier
    from amt_saga_tpu.models.train import create_state, train_step

    cfg = tiny_config.override(**{"train.batch_size": 2})
    c = PairedCorpus(corpus_dir)
    state, tx = create_state(cfg, jax.random.PRNGKey(0))
    model = build_classifier(cfg)
    it = c.example_batches(cfg, batch_size=2, seconds=2.0, seed=0)
    import jax.numpy as jnp
    eb = next(it)
    batch = {"spec": jnp.asarray(eb.spec),
             "onset_pitch": jnp.asarray(eb.onset_pitch),
             "duration": jnp.asarray(eb.duration),
             "presence": jnp.asarray(eb.presence),
             "velocity": jnp.asarray(eb.velocity)}
    state2, m = train_step(state, batch, cfg, model, tx)
    assert np.isfinite(float(m["loss"]))


def test_cli_train_on_corpus(corpus_dir, tiny_config, tmp_path):
    cfg_file = tmp_path / "cfg.json"
    cfg = tiny_config.override(**{"train.batch_size": 2, "train.steps": 3,
                                  "train.checkpoint_dir":
                                      str(tmp_path / "ck")})
    cfg_file.write_text(cfg.to_json())
    assert main(["train", "--corpus", corpus_dir, "--steps", "3",
                 "--config", str(cfg_file)]) == 0
    import glob
    assert glob.glob(str(tmp_path / "ck" / "step_*"))
