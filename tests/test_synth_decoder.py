"""SING-style neural synthesizer tests (SURVEY.md Lsynth/C8, PAPERS.md)."""

import numpy as np
import pytest

from amt_saga_tpu.evaluation.f1 import note_f1
from amt_saga_tpu.models.synth_decoder import (
    distill,
    generate_bank,
    neural_template_arrays,
)
from amt_saga_tpu.runtime.fixtures import make_clip
from amt_saga_tpu.saga.loop import Transcriber
from amt_saga_tpu.synth.templates import template_bank


@pytest.fixture(scope="module")
def trained(tiny_config):
    return distill(tiny_config, steps=1500, log_every=500)


def test_decoder_reproduces_template_bank(tiny_config, trained):
    ref = template_bank(tiny_config.synth, tiny_config.dsp)
    gen = generate_bank(tiny_config, trained)
    assert gen.shape == ref.shape
    assert np.all(gen >= 0)
    rel = np.linalg.norm(gen - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel  # distillation converges to the analytic bank


def test_transcription_with_neural_bank(tiny_config, trained):
    tmpl = neural_template_arrays(tiny_config, trained)
    tr = Transcriber(tiny_config, tmpl=tmpl)
    wave, ref = make_clip(tiny_config, kind="isol", seconds=4.0,
                          n_notes=3, seed=0)
    pred = tr.transcribe(wave)
    r = note_f1(pred, ref)
    assert r.f1 >= 0.8, (r, pred.to_arrays(), ref.to_arrays())
