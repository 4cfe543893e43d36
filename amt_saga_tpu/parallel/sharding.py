"""Sharded transcription + training (SURVEY.md §2.3/§2.4, layer L6).

Data-parallel transcription: the batched while_loop is embarrassingly
parallel over clips — shard the batch dim over the ``data`` axis and jit;
no collectives are needed inside the loop (each lane is independent), so
scaling is linear over ICI.

Tensor-parallel training: the classifier's trunk Dense layer is sharded
column-wise and the head kernels row-wise over the ``model`` axis; XLA
inserts the psum for the row-sharded matmuls.  Data-parallel gradients
fall out of jitting the global-batch loss with a sharded batch.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..saga.loop import (
    ScoreFn,
    TemplateArrays,
    heuristic_scores,
    transcribe_waves,
)
from .mesh import DATA_AXIS, MODEL_AXIS, data_sharding


def sharded_transcribe_fn(cfg: Config, mesh: Mesh, tmpl: TemplateArrays,
                          score_fn: ScoreFn = heuristic_scores):
    """(jitted (waves, tmpl) -> NotesBatch, replicated-tmpl shardings).

    Waves [B, N] (B % data-axis == 0) and the output note arrays shard
    over the 'data' axis; templates replicate.  Used both by
    :func:`make_sharded_transcriber` and by ``saga.loop.Transcriber``'s
    multi-device mode (the CLI's zero-flag all-chips path).
    """
    in_s = data_sharding(mesh, 2)
    repl = jax.tree.map(lambda _: NamedSharding(mesh, P()), tmpl)
    batch_dim = NamedSharding(mesh, P(DATA_AXIS))
    out_s = jax.tree.map(lambda _: batch_dim, _notes_batch_structure())
    # `iterations` is a batch-independent scalar: replicated, not sharded.
    out_s = out_s._replace(iterations=NamedSharding(mesh, P()))

    fn = jax.jit(
        lambda waves, t: transcribe_waves(waves, cfg, t, score_fn),
        in_shardings=(in_s, repl),
        out_shardings=out_s,
    )
    return fn, repl, in_s


def make_sharded_transcriber(cfg: Config, mesh: Mesh,
                             tmpl: TemplateArrays,
                             score_fn: ScoreFn = heuristic_scores):
    """Returns a jitted fn: waves [B, N] (B % data-axis == 0) -> NotesBatch,
    batch sharded over the 'data' axis, note arrays sharded the same way.

    Templates are a replicated jit ARGUMENT (uploaded once here), not a
    closure constant — the Gram tensor is hundreds of MB at default config
    and would blow the axon remote-compile request limit if baked into the
    program (see saga.loop.Transcriber).
    """
    fn, repl, _ = sharded_transcribe_fn(cfg, mesh, tmpl, score_fn)
    tmpl_dev = jax.device_put(tmpl, repl)
    return lambda waves: fn(waves, tmpl_dev)


def _notes_batch_structure():
    from ..saga.loop import NotesBatch

    return NotesBatch(onset=0, dur=0, pitch=0, gain=0, program=0, d_idx=0,
                      sd=0, dot0=0, vel_pred=0, count=0, residual_energy=0,
                      poison=0, saturated=0, iterations=0, snap_w=0,
                      obs_w=0)


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Tensor-parallel PartitionSpecs for the classifier parameters.

    trunk kernel [in, hidden]   -> shard hidden (columns) over 'model'
    trunk bias   [hidden]       -> shard over 'model'
    head kernels [hidden, out]  -> shard hidden (rows) over 'model'
                                    (XLA adds the psum)
    everything else             -> replicated
    """

    def spec_for(path, leaf) -> NamedSharding:
        names = [getattr(p, "key", str(p)) for p in path]
        joined = "/".join(names)
        if "trunk" in joined and names[-1] == "kernel":
            return NamedSharding(mesh, P(None, MODEL_AXIS))
        if "trunk" in joined and names[-1] == "bias":
            return NamedSharding(mesh, P(MODEL_AXIS))
        if "head_" in joined and names[-1] == "kernel":
            return NamedSharding(mesh, P(MODEL_AXIS, None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(spec_for, params)


def make_sharded_train_step(cfg: Config, mesh: Mesh, model, tx,
                            state_template):
    """Returns (jitted_step, shard_state) for DP(batch) x TP(model) training.

    ``shard_state`` places a host TrainState onto the mesh with TP param
    shardings; the jitted step keeps it there (donated).
    """
    from ..models.train import TrainState, train_step

    p_shard = param_shardings(state_template.params, mesh)
    opt_shard = jax.tree.map(
        lambda leaf: (p_shard if _is_params_like(leaf, state_template.params)
                      else NamedSharding(mesh, P())),
        state_template.opt_state,
        is_leaf=lambda x: _is_params_like(x, state_template.params),
    )
    state_shardings = TrainState(
        params=p_shard, opt_state=opt_shard,
        step=NamedSharding(mesh, P()))
    batch_shardings = {
        "spec": data_sharding(mesh, 3),
        "onset_pitch": data_sharding(mesh, 3),
        "duration": data_sharding(mesh, 2),
        "presence": data_sharding(mesh, 2),
        "velocity": data_sharding(mesh, 3),
    }

    step = jax.jit(
        partial(train_step, cfg=cfg, model=model, tx=tx),
        in_shardings=(state_shardings, batch_shardings),
        out_shardings=(state_shardings, NamedSharding(mesh, P())),
        donate_argnums=0,
    )

    def shard_state(state):
        return jax.device_put(state, state_shardings)

    return step, shard_state


def _is_params_like(x, params) -> bool:
    """True if x is a pytree with the same structure as params (e.g. the
    mu/nu slots inside the Adam optimizer state)."""
    return (jax.tree_util.tree_structure(x)
            == jax.tree_util.tree_structure(params))
