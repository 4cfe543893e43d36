"""SING-style neural note synthesizer (SURVEY.md Lsynth/C8, PAPERS.md).

The reference's second synthesis path is a neural symbol-to-instrument
generator (SING): embed the symbolic note, decode a spectro-temporal
patch.  TPU-native integration (SURVEY.md 3.4 build note): the decoder
GENERATES the template bank — all (instrument, pitch, duration) atoms are
decoded once per checkpoint into the same ``[Q, D, Tmax, F]`` array the
analytic synthesizer produces, and the SAGA loop consumes either bank
identically (synthesis inside the loop stays a pure gather + scale).

Architecture (SING-lite): per-symbol embeddings -> MLP -> factorized
patch: a spectral profile [F], a temporal envelope [Tmax], and a low-rank
correction, combined as ``profile x envelope + sum_r u_r x v_r``.  The
factorization matches the physics (harmonic stack x decay) and keeps the
parameter count small.

Training: supervised distillation to the analytic template bank (the
environment has no real instrument corpora — SURVEY.md §4.3); with real
data the same decoder trains against measured note spectrograms.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import Config
from ..utils.logging import get_logger

log = get_logger(__name__)

LOW_RANK = 4


class SynthDecoder(nn.Module):
    """(instrument, pitch, duration) -> linear-magnitude patch [Tmax, F]."""

    n_instruments: int
    n_pitches: int
    n_durations: int
    tmax: int
    n_bins: int
    hidden: int = 128

    @nn.compact
    def __call__(self, instrument: jnp.ndarray, pitch: jnp.ndarray,
                 duration: jnp.ndarray) -> jnp.ndarray:
        e = jnp.concatenate([
            nn.Embed(self.n_instruments, 16, name="emb_instr")(instrument),
            nn.Embed(self.n_pitches, 48, name="emb_pitch")(pitch),
            nn.Embed(self.n_durations, 16, name="emb_dur")(duration),
        ], axis=-1)
        h = nn.relu(nn.Dense(self.hidden, name="fc1")(e))
        h = nn.relu(nn.Dense(self.hidden, name="fc2")(h))

        r = LOW_RANK
        profile = nn.softplus(nn.Dense(self.n_bins, name="profile")(h))
        envelope = nn.softplus(nn.Dense(self.tmax, name="envelope")(h))
        u = nn.Dense(self.tmax * r, name="u")(h).reshape(
            *h.shape[:-1], self.tmax, r)
        v = nn.Dense(self.n_bins * r, name="v")(h).reshape(
            *h.shape[:-1], self.n_bins, r)
        # Raw (signed) sqrt-magnitude prediction.  No output clamp: a
        # clamp here kills gradients once the patch goes negative (dead
        # output ReLU); non-negativity is applied at generation time
        # (relu then square).
        return (envelope[..., :, None] * profile[..., None, :]
                + jnp.einsum("...tr,...fr->...tf", u, v))


def build_decoder(cfg: Config) -> SynthDecoder:
    return SynthDecoder(
        n_instruments=cfg.synth.n_instruments,
        n_pitches=cfg.synth.n_pitches,
        n_durations=len(cfg.synth.duration_grid),
        tmax=cfg.synth.template_frames,
        n_bins=cfg.dsp.n_bins,
    )


def _all_symbols(cfg: Config) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    n_i = cfg.synth.n_instruments
    n_p = cfg.synth.n_pitches
    n_d = len(cfg.synth.duration_grid)
    ii, pp, dd = np.meshgrid(np.arange(n_i), np.arange(n_p),
                             np.arange(n_d), indexing="ij")
    return (jnp.asarray(ii.ravel()), jnp.asarray(pp.ravel()),
            jnp.asarray(dd.ravel()))


def distill(cfg: Config, *, steps: int = 2000, learning_rate: float = 3e-3,
            seed: int = 0, log_every: int = 200) -> Any:
    """Train the decoder to reproduce the analytic template bank."""
    from ..synth.templates import template_bank

    bank = template_bank(cfg.synth, cfg.dsp)       # [I, P, D, Tmax, F]
    n_i, n_p, n_d, tmax, f = bank.shape
    scale = float(np.max(bank))
    # Distill in sqrt-magnitude space: compresses the dynamic range so
    # the loss is not dominated by the (mostly tiny) off-harmonic bins.
    targets = jnp.asarray(
        np.sqrt(bank.reshape(n_i * n_p * n_d, tmax, f) / scale))

    model = build_decoder(cfg)
    ii, pp, dd = _all_symbols(cfg)
    params = model.init(jax.random.PRNGKey(seed), ii[:1], pp[:1], dd[:1])
    tx = optax.adam(learning_rate)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, ii, pp, dd)
            return jnp.mean(jnp.square(pred - targets))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if i % log_every == 0 or i == steps - 1:
            log.info("synth distill step %d loss %.6f", i, float(loss))
    return {"params": params, "scale": scale}


def generate_bank(cfg: Config, trained: dict) -> np.ndarray:
    """Decode ALL atoms -> [I, P, D, Tmax, F] bank (done once, host)."""
    model = build_decoder(cfg)
    ii, pp, dd = _all_symbols(cfg)
    raw = jax.device_get(model.apply(trained["params"], ii, pp, dd))
    patches = np.square(np.maximum(raw, 0.0)) * trained["scale"]
    n_i = cfg.synth.n_instruments
    n_p = cfg.synth.n_pitches
    n_d = len(cfg.synth.duration_grid)
    return patches.reshape(n_i, n_p, n_d, cfg.synth.template_frames,
                           cfg.dsp.n_bins).astype(np.float32)


def neural_template_arrays(cfg: Config, trained: dict):
    """TemplateArrays backed by the neural synthesizer's generated bank."""
    from ..saga.loop import TemplateArrays

    bank = generate_bank(cfg, trained)
    n_i, n_p, n_d, tmax, f = bank.shape
    flat = bank.reshape(n_i * n_p, n_d, tmax, f)
    norms = np.sum(np.square(flat, dtype=np.float64),
                   axis=(-2, -1)).astype(np.float32)
    prof = flat[:, -1].sum(axis=-2)
    prof = prof / np.maximum(np.linalg.norm(prof, axis=-1, keepdims=True),
                             1e-12)
    env = flat[:, -1].sum(axis=(0, 2))
    env = env / max(np.linalg.norm(env), 1e-12)
    from ..synth.templates import duration_grid_frames, gram_from_bank

    gram = gram_from_bank(flat.reshape(n_i * n_p * n_d, tmax, f))
    if cfg.run.use_pallas and f % 128:
        pad = 128 - f % 128
        flat = np.pad(flat, ((0, 0), (0, 0), (0, 0), (0, pad)))
        prof = np.pad(prof, ((0, 0), (0, pad)))

    return TemplateArrays(
        bank=jnp.asarray(flat),
        norms=jnp.asarray(norms),
        prof=jnp.asarray(prof.astype(np.float32)),
        env=jnp.asarray(env.astype(np.float32)),
        durs=jnp.asarray(duration_grid_frames(cfg.synth, cfg.dsp)),
        gram=jnp.asarray(gram),
    )
