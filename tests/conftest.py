"""Test harness config (SURVEY.md §4.4-4.5).

Tests run on the CPU backend with 8 virtual devices so that pjit/mesh
sharding and the batched while_loop are exercised exactly as they run on a
v4-8 — without needing TPU hardware in CI.  These env vars must be set
before jax initializes its backends, hence before any test imports jax.
"""

import os

# Force the CPU backend with 8 virtual devices.  NB: the axon TPU plugin's
# sitecustomize.py imports jax at interpreter startup (before conftest), so
# JAX_PLATFORMS=axon from the env is already captured by jax.config —
# os.environ tweaks are too late; override the config value directly.
# XLA_FLAGS is still read at (lazy) backend init, which has not happened yet.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

from amt_saga_tpu.config import (  # noqa: E402
    Config,
    DSPConfig,
    LoopConfig,
    SynthConfig,
)


@pytest.fixture(scope="session")
def tiny_transcriber(tiny_config):
    """Session-scoped Transcriber: jit-compile the loop once per run."""
    from amt_saga_tpu.saga.loop import Transcriber

    return Transcriber(tiny_config)


@pytest.fixture(scope="session")
def tiny_config() -> Config:
    """Small shapes so the full pipeline runs fast on 1 CPU core."""
    return Config(
        dsp=DSPConfig(sample_rate=8000, n_fft=512, hop=256, fmin=55.0,
                      bins_per_octave=12, n_bins=72, pad_frames_to=8),
        synth=SynthConfig(pitch_min=36, pitch_max=84, n_harmonics=6,
                          template_frames=40,
                          duration_grid=(0.25, 0.5, 1.0)),
        loop=LoopConfig(max_notes=24),
    )
