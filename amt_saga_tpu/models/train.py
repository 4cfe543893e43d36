"""Classifier training loop (SURVEY.md C14, call stack 3.2).

The reference trains its CNN with a standard PyTorch loop + torch.save
checkpoints [SURVEY.md C14].  TPU-native: one jitted ``train_step``
(donated state, optax AdamW), host-side synthetic-fixture batch generation
(:mod:`amt_saga_tpu.runtime.examples`), Orbax checkpointing, JSONL metrics.

Losses (heads of :class:`amt_saga_tpu.models.classifier.NoteClassifier`):
* onset_pitch: sigmoid BCE over the [T, Q] map with positive-class
  weighting (onsets are sparse),
* duration: softmax CE at labeled onset frames only,
* presence: sigmoid BCE with positive weighting.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Iterator, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..runtime.examples import ExampleBatch, make_example_batch
from ..utils.logging import MetricsWriter, get_logger
from .classifier import build_classifier, init_params

log = get_logger(__name__)



class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_state(cfg: Config, rng: jax.Array,
                 freeze: tuple[str, ...] = (),
                 flat_lr: float | None = None) -> tuple[TrainState, Any]:
    """Init (state, optimizer).

    ``freeze``: top-level param-collection names (e.g. "head_duration")
    whose parameters receive ZERO updates — the warm-start continuation
    fix: a fresh optimizer's moments + lr warmup kick a sharply-curved
    converged head out of its minimum (measured: the 12k dense
    checkpoint's duration head collapsed l_dur 0.24 -> 3.4 right after
    warmup at BOTH 3e-4 and 6e-5 peak lr, benchmarks/history.jsonl).
    The frozen head's loss term stays in the objective, so the trunk
    keeps being shaped to serve it.  ``flat_lr`` replaces the
    warmup+cosine schedule with a constant rate (the other half of the
    same fix — no warmup spike on a warm start)."""
    params = init_params(cfg, rng)
    if flat_lr is not None:
        schedule: Any = flat_lr
    else:
        # Cosine decay with linear warmup over the configured step
        # budget.
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=cfg.train.learning_rate,
            warmup_steps=max(1, cfg.train.steps // 20),
            decay_steps=max(2, cfg.train.steps),
            end_value=cfg.train.learning_rate * 0.05)
    tx = optax.adamw(schedule, weight_decay=cfg.train.weight_decay)
    if freeze:
        frozen = set(freeze)
        unknown = frozen - set(params.keys())
        if unknown:
            raise ValueError(f"freeze names not in param tree: "
                             f"{sorted(unknown)} (have "
                             f"{sorted(params.keys())})")
        tx = optax.multi_transform(
            {"train": tx, "frozen": optax.set_to_zero()},
            {k: ("frozen" if k in frozen else "train") for k in params})
    return TrainState(params, tx.init(params), jnp.zeros((), jnp.int32)), tx


def loss_fn(params: Any, batch: dict[str, jnp.ndarray], cfg: Config,
            model, rng: jax.Array
            ) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    out = model.apply({"params": params}, batch["spec"], train=True,
                      rngs={"dropout": rng})

    # Onset/pitch BCE with positive weighting (TrainConfig.pos_weight).
    pw = cfg.train.pos_weight
    logits = out["onset_pitch"]
    labels = batch["onset_pitch"]
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    w = 1.0 + (pw - 1.0) * labels
    l_onset = jnp.sum(bce * w) / jnp.sum(w)

    # Duration CE at labeled frames.
    dur_labels = batch["duration"]
    mask = (dur_labels >= 0).astype(jnp.float32)
    safe = jnp.maximum(dur_labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        out["duration"], safe)
    l_dur = jnp.sum(ce * mask) / jnp.maximum(jnp.sum(mask), 1.0)

    # Presence BCE.
    pres = batch["presence"]
    bce_p = optax.sigmoid_binary_cross_entropy(out["presence"], pres)
    w_p = 1.0 + (pw - 1.0) * pres
    l_pres = jnp.sum(bce_p * w_p) / jnp.sum(w_p)

    # Velocity regression (MSE at hard onset cells only — the soft
    # neighbor labels of onset_pitch are < 1 and carry no velocity).
    vmask = (labels >= 1.0).astype(jnp.float32)
    sq = jnp.square(out["velocity"] - batch["velocity"])
    l_vel = jnp.sum(sq * vmask) / jnp.maximum(jnp.sum(vmask), 1.0)

    loss = l_onset + 0.5 * l_dur + 0.5 * l_pres + 0.5 * l_vel
    return loss, {"loss": loss, "l_onset": l_onset, "l_dur": l_dur,
                  "l_pres": l_pres, "l_vel": l_vel}


@partial(jax.jit, static_argnames=("cfg", "model", "tx"), donate_argnums=0)
def train_step(state: TrainState, batch: dict[str, jnp.ndarray],
               cfg: Config, model, tx) -> tuple[TrainState, dict]:
    rng = jax.random.fold_in(jax.random.PRNGKey(cfg.train.seed),
                             state.step)
    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
    (_, metrics), grads = grad_fn(state.params, batch, cfg, model, rng)
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return TrainState(params, opt_state, state.step + 1), metrics


def _batch_dict(eb: ExampleBatch) -> dict[str, np.ndarray]:
    return {
        "spec": eb.spec,
        "onset_pitch": eb.onset_pitch,
        "duration": eb.duration,
        "presence": eb.presence,
        "velocity": eb.velocity,
    }


def batch_iterator(cfg: Config, *, seconds: float = 4.0, kind: str = "mus",
                   seed: int = 0, noise: float = 0.0, prefetch: int = 0,
                   loop_state_p: float = 0.0, cache_batches: int = 0
                   ) -> Iterator[dict[str, jnp.ndarray]]:
    """Training batches; with ``prefetch`` > 0, host-side generation
    overlaps device compute via a background thread (the host has one
    core here, so generation is the training bottleneck otherwise).

    ``loop_state_p``: fraction of batches sampled from the loop's OWN
    mid-transcription residual states (runtime.examples.LoopStateSampler)
    instead of the synthetic subtract-a-random-subset approximation —
    the distribution the classifier actually scores inside the loop.

    ``noise`` is a per-batch MAXIMUM: each batch draws its noise level
    uniformly from [0, noise], so one run covers the clean regime (the
    learned gate must not suppress real peaks there) through the noisy
    one (where suppression is the whole point).

    ``kind="mix"`` alternates mus/isol batches (3:1) — the standalone
    dense decoder must fire on sparse monophonic content too, which a
    pure 3-voice diet under-represents.

    ``cache_batches``: epoch-cached pool — generate this many distinct
    batches, then CYCLE them with a fresh shuffle per epoch.  At ~3 s of
    single-core host generation per batch, an uncached 6000-step run
    would be generation-bound for hours; a 300-batch pool (4800 distinct
    clips) converges the same on this synthetic domain at 1/20 the wall
    clock.  0 = generate every batch fresh (round-2 behavior).
    """
    sampler = None
    if loop_state_p > 0.0:
        from ..runtime.examples import LoopStateSampler

        sampler = LoopStateSampler(cfg)

    def gen():
        i = seed
        rng = np.random.default_rng(seed + 17)
        pool: list[dict[str, np.ndarray]] = []
        while True:
            if cache_batches > 0 and len(pool) >= cache_batches:
                for j in rng.permutation(len(pool)):
                    yield pool[j]
                continue
            noise_i = float(rng.uniform(0.0, noise)) if noise > 0 else 0.0
            kind_i = kind if kind != "mix" else (
                "isol" if i % 4 == 3 else "mus")
            if sampler is not None and rng.random() < loop_state_p:
                eb = sampler.batch(
                    batch_size=cfg.train.batch_size, seconds=seconds,
                    seed=i, kind=kind_i, noise=noise_i)
            else:
                eb = make_example_batch(
                    cfg, batch_size=cfg.train.batch_size, seconds=seconds,
                    seed=i, kind=kind_i, noise=noise_i)
            d = _batch_dict(eb)
            if cache_batches > 0:
                pool.append(d)
            yield d
            i += 1

    if prefetch > 0:
        from ..runtime.feeder import prefetch_to_device

        yield from prefetch_to_device(gen(), depth=prefetch)
    else:
        for b in gen():
            yield jax.tree.map(jnp.asarray, b)


def save_checkpoint(cfg: Config, state: TrainState, path: str | None = None
                    ) -> str:
    import orbax.checkpoint as ocp

    path = path or os.path.abspath(cfg.train.checkpoint_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"step_{int(state.step)}"),
               jax.device_get(state.params), force=True)
    ckptr.wait_until_finished()
    return os.path.join(path, f"step_{int(state.step)}")


def load_checkpoint(cfg: Config, path: str) -> Any:
    import orbax.checkpoint as ocp

    rng = jax.random.PRNGKey(0)
    template = jax.device_get(init_params(cfg, rng))
    ckptr = ocp.StandardCheckpointer()
    # Orbax requires absolute paths and fails with a cryptic tensorstore
    # error on relative ones.
    restored = ckptr.restore(os.path.abspath(path), template)
    # Orbax restores whatever was saved even if the template disagrees;
    # validate shapes so a config/checkpoint mismatch fails HERE, not at
    # some later apply().
    for kp, (a, b) in zip(
            jax.tree_util.tree_leaves_with_path(template),
            zip(jax.tree.leaves(template), jax.tree.leaves(restored))):
        if np.shape(a) != np.shape(b):
            raise ValueError(
                f"checkpoint/config mismatch at {jax.tree_util.keystr(kp[0])}: "
                f"config expects {np.shape(a)}, checkpoint has {np.shape(b)}")
    return restored


def corpus_batch_iterator(cfg: Config, corpus_dir: str, *,
                          seconds: float = 4.0, seed: int = 0,
                          prefetch: int = 2, corpus_format: str = "paired",
                          split: str | None = None
                          ) -> Iterator[dict[str, jnp.ndarray]]:
    """Training batches from an on-disk corpus (C10-C12): labels come from
    the user's MIDI/CSV files, not the synthesizer.  ``corpus_format``
    selects the on-disk convention (paired|musicnet|maestro|maps, see
    runtime/datasets.py)."""
    from ..runtime.datasets import open_corpus
    from ..runtime.feeder import prefetch_to_device

    corpus = open_corpus(corpus_dir, corpus_format, split=split)

    def gen():
        for eb in corpus.example_batches(
                cfg, batch_size=cfg.train.batch_size, seconds=seconds,
                seed=seed):
            yield _batch_dict(eb)

    if prefetch > 0:
        yield from prefetch_to_device(gen(), depth=prefetch)
    else:
        for b in gen():
            yield jax.tree.map(jnp.asarray, b)


def train(cfg: Config, *, steps: int | None = None, seconds: float = 4.0,
          kind: str = "mus", noise: float = 0.0,
          corpus_dir: str | None = None, corpus_format: str = "paired",
          corpus_split: str | None = None, loop_state_p: float = 0.0,
          cache_batches: int = 0,
          metrics: MetricsWriter | None = None,
          checkpoint: bool = True,
          init_from: str | None = None,
          freeze_heads: tuple[str, ...] = (),
          flat_lr: float | None = None) -> TrainState:
    """Run the training loop; returns final state.

    With ``corpus_dir``, batches come from the user's on-disk corpus
    (``corpus_format``: paired|musicnet|maestro|maps); otherwise from the
    synthetic fixture generator (``kind``), optionally mixed with
    mid-transcription loop states (``loop_state_p``).
    """
    steps = steps if steps is not None else cfg.train.steps
    rng = jax.random.PRNGKey(cfg.train.seed)
    state, tx = create_state(cfg, rng, freeze=tuple(freeze_heads),
                             flat_lr=flat_lr)
    if freeze_heads:
        log.info("frozen param collections: %s%s",
                 ",".join(freeze_heads),
                 f" (flat lr {flat_lr})" if flat_lr is not None else "")
    if init_from:
        # Warm start: continue training an existing checkpoint's
        # parameters (fresh optimizer state + step counter — the saved
        # tree holds params only).
        params = load_checkpoint(cfg, init_from)
        state = state._replace(params=params)
        log.info("warm start from %s", init_from)
    model = build_classifier(cfg)
    # Zero-flag multi-device (SURVEY.md §2.3): DP over the batch x TP
    # over run.model_parallel whenever more than one chip is visible.
    from ..parallel.mesh import auto_mesh

    mesh = auto_mesh(cfg.train.batch_size, cfg.run.model_parallel)
    if mesh is not None:
        from ..parallel.sharding import make_sharded_train_step

        log.info("sharded training over %d devices %s",
                 mesh.devices.size, dict(mesh.shape))
        step_fn, shard_state = make_sharded_train_step(
            cfg, mesh, model, tx, state)
        state = shard_state(state)
    else:
        def step_fn(s, b):
            return train_step(s, b, cfg, model, tx)
    if corpus_dir is not None:
        it = corpus_batch_iterator(cfg, corpus_dir, seconds=seconds,
                                   seed=cfg.train.seed,
                                   corpus_format=corpus_format,
                                   split=corpus_split)
    else:
        it = batch_iterator(cfg, seconds=seconds, kind=kind,
                            seed=cfg.train.seed, noise=noise, prefetch=2,
                            loop_state_p=loop_state_p,
                            cache_batches=cache_batches)
    mw = metrics or MetricsWriter()
    every = max(1, cfg.train.checkpoint_every)
    for i in range(steps):
        batch = next(it)
        state, m = step_fn(state, batch)
        if i % 20 == 0 or i == steps - 1:
            m = {k: float(v) for k, v in m.items()}
            mw.write({"event": "train_step", "step": i, **m})
            log.info("step %d loss %.4f", i, m["loss"])
        if checkpoint and (i + 1) % every == 0 and i != steps - 1:
            # Periodic mid-flight checkpoint (TrainConfig.checkpoint_every):
            # a long run that dies resumes from the last one instead of
            # losing everything.
            path = save_checkpoint(cfg, state)
            mw.write({"event": "checkpoint", "path": path,
                      "step": int(state.step)})
    if checkpoint:
        path = save_checkpoint(cfg, state)
        mw.write({"event": "checkpoint", "path": path,
                  "step": int(state.step)})
    return state
