"""AMT-SAGA-TPU: a TPU-native automatic-music-transcription framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of AMT-SAGA
(RobertKajnak/AMT-SAGA): audio -> spectrogram -> iterative
generative-subtractive note extraction -> MIDI, batched and sharded over
TPU meshes.  See SURVEY.md for the capability contract.
"""

__version__ = "0.1.0"

from .config import Config, default_config  # noqa: F401
