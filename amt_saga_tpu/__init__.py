"""AMT-SAGA-TPU: a TPU-native automatic-music-transcription framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of AMT-SAGA
(RobertKajnak/AMT-SAGA): audio -> spectrogram -> iterative
generative-subtractive note extraction -> MIDI, batched and sharded over
TPU meshes.  See SURVEY.md for the capability contract.
"""

__version__ = "0.1.0"

from .config import Config, default_config  # noqa: F401


def __getattr__(name):
    # Convenience re-exports without importing jax at package import time
    # (the golden path and core data model are numpy-only).
    if name == "Transcriber":
        from .saga.loop import Transcriber

        return Transcriber
    if name == "transcribe_golden":
        from .golden.pipeline import transcribe_golden

        return transcribe_golden
    if name == "note_f1":
        from .evaluation.f1 import note_f1

        return note_f1
    if name == "NoteSequence":
        from .core.notes import NoteSequence

        return NoteSequence
    raise AttributeError(name)
