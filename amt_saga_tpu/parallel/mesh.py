"""Device mesh construction (SURVEY.md §2.3/§2.4, layer L6).

The reference is single-process/single-device; ALL parallel structure is
new here [SURVEY.md §2.3].  Axes:

* ``data``  — the primary axis: batches of clips shard across chips
  (BASELINE: "batch=32 clips ... on v4-8").
* ``model`` — tensor-parallel axis, plumbed through the classifier's
  widest layers.  The CNN is small so ``model=1`` is the default, but the
  shardings are real and exercised by tests/dryrun (SURVEY.md §2.3 "leaves
  a ('model',) mesh axis unused but plumbed").

Collectives ride ICI via XLA from jit + NamedSharding; there is no custom
transport layer (the idiomatic replacement for the reference's "no
backend", SURVEY.md §2.4).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(n_devices: int | None = None, model_parallel: int = 1,
              devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(
            f"{n} devices not divisible by model_parallel={model_parallel}")
    import numpy as np

    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def auto_mesh(batch_size: int, model_parallel: int = 1) -> Mesh | None:
    """Zero-flag multi-device: a DATA x MODEL mesh over the visible
    devices, or None when sharding is pointless (single device, or a
    batch the data axis cannot divide).

    The data axis is the largest device count that divides
    ``batch_size`` (DP needs B % data == 0); ``model_parallel`` comes
    from ``RunConfig.model_parallel``.  Consumed by the CLI so a v4-8
    user gets all chips from ``transcribe-corpus``/``train`` with zero
    flags (SURVEY.md §2.3 DP row).
    """
    n_dev = len(jax.devices())
    mp = max(1, model_parallel)
    if n_dev <= 1 or mp > n_dev:
        return None
    n_data = max((d for d in range(1, n_dev // mp + 1)
                  if batch_size % d == 0), default=1)
    if n_data * mp <= 1:
        return None
    return make_mesh(n_data * mp, model_parallel=mp)


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
