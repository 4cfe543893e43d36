"""Sharding tests on the 8 virtual CPU devices (SURVEY.md §4.5):
pjit/mesh data-parallel transcription and DP x TP training, exactly as
they would run on a v4-8."""

import jax
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from amt_saga_tpu.models.classifier import build_classifier
from amt_saga_tpu.models.train import batch_iterator, create_state, train_step
from amt_saga_tpu.parallel.mesh import make_mesh
from amt_saga_tpu.parallel.sharding import (
    make_sharded_train_step,
    make_sharded_transcriber,
    param_shardings,
)
from amt_saga_tpu.runtime.fixtures import make_corpus
from amt_saga_tpu.saga.loop import notes_batch_to_sequences


def test_mesh_shape():
    mesh = make_mesh(8, model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert len(jax.devices()) == 8  # conftest forced 8 virtual devices


def test_sharded_transcribe_matches_unsharded(tiny_config, tiny_transcriber):
    cfg = tiny_config
    mesh = make_mesh(8, model_parallel=1)
    clips = make_corpus(cfg, kind="isol", n_clips=8, seconds=3.0,
                        n_notes=2, seed=20)
    waves = np.stack([w for w, _ in clips])
    fn = make_sharded_transcriber(cfg, mesh, tiny_transcriber.tmpl)
    notes = jax.device_get(fn(waves))
    sharded = notes_batch_to_sequences(notes, cfg)
    unsharded = tiny_transcriber.transcribe_batch(waves)
    for a, b in zip(sharded, unsharded):
        assert a.sorted().notes == b.sorted().notes


def test_param_shardings_are_tensor_parallel(tiny_config):
    mesh = make_mesh(8, model_parallel=2)
    state, _ = create_state(tiny_config, jax.random.PRNGKey(0))
    specs = param_shardings(state.params, mesh)
    assert specs["trunk"]["kernel"].spec == P(None, "model")
    assert specs["head_onset_pitch"]["kernel"].spec == P("model", None)
    assert specs["conv0"]["kernel"].spec == P()


@pytest.mark.parametrize("model_parallel", [1, 2])
def test_sharded_train_step_matches_unsharded(tiny_config, model_parallel):
    cfg = tiny_config.override(**{"train.batch_size": 8})
    mesh = make_mesh(8, model_parallel=model_parallel)
    model = build_classifier(cfg)
    state, tx = create_state(cfg, jax.random.PRNGKey(0))
    batch = next(batch_iterator(cfg, seconds=2.0, kind="isol", seed=0))

    ref_state, ref_m = train_step(state, batch, cfg, model, tx)

    state2, _ = create_state(cfg, jax.random.PRNGKey(0))
    step, shard_state = make_sharded_train_step(cfg, mesh, model, tx, state2)
    sharded = shard_state(state2)
    new_state, m = step(sharded, batch)

    assert abs(float(m["loss"]) - float(ref_m["loss"])) < 1e-4
    # parameters end up numerically equal to the single-device update
    for a, b in zip(jax.tree.leaves(ref_state.params),
                    jax.tree.leaves(jax.device_get(new_state.params))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)
    # and the trunk kernel really lives sharded over the model axis
    trunk = new_state.params["trunk"]["kernel"]
    assert trunk.sharding.spec == P(None, "model") or model_parallel == 1
