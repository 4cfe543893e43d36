"""Frozen, hashable configuration tree for the whole framework.

The reference (AMT-SAGA) keeps hyperparameters as module constants /
argparse flags scattered over scripts (SURVEY.md C17).  Here every knob
lives in one frozen dataclass tree so that configs are hashable (usable as
static args to ``jax.jit``), serializable to/from JSON, and overridable
from the CLI with ``key=value`` flags.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Tuple


@dataclass(frozen=True)
class DSPConfig:
    """Spectrogram front-end (SURVEY.md C1-C4)."""

    sample_rate: int = 16000
    n_fft: int = 2048
    hop: int = 512
    # Log-frequency (pseudo-CQT) binning: semitone-aligned bins from fmin.
    fmin: float = 27.5  # A0
    bins_per_octave: int = 36
    n_bins: int = 252  # 7 octaves * 36
    # Magnitude domain: residual subtraction happens in LINEAR magnitude;
    # models may view log1p(residual).
    pad_frames_to: int = 16  # pad time axis to a multiple of this (TPU tiling)

    @property
    def freq_bins(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, n_samples: int) -> int:
        raw = max(0, 1 + (n_samples - self.n_fft) // self.hop)
        m = self.pad_frames_to
        return ((raw + m - 1) // m) * m

    def raw_num_frames(self, n_samples: int) -> int:
        return max(0, 1 + (n_samples - self.n_fft) // self.hop)

    def frame_to_seconds(self, frame: int) -> float:
        return frame * self.hop / self.sample_rate


@dataclass(frozen=True)
class SynthConfig:
    """Template synthesizer (SURVEY.md C8, Lsynth)."""

    pitch_min: int = 21   # A0
    pitch_max: int = 108  # C8 (inclusive)
    n_harmonics: int = 8
    decay_seconds: float = 0.7      # exp decay time constant of a held note
    release_seconds: float = 0.05   # release after note-off
    # Template extent must cover the longest grid duration + release tail +
    # one analysis window, else ring-out beyond the template survives
    # subtraction and is re-detected as spurious notes.
    template_frames: int = 80       # max template extent (frames)
    # Candidate duration grid, in seconds (SURVEY.md 3.4 / config 2).
    # 8 entries: on off-grid-duration content the finer grid lifts
    # onset+offset F1 from 0.56 to 0.84 at unchanged onset F1 (the dots
    # matmul and bank memory scale linearly and stay cheap).
    duration_grid: Tuple[float, ...] = (0.125, 0.25, 0.375, 0.5, 0.75,
                                        1.0, 1.5, 2.0)
    n_instruments: int = 1          # >1 for MusicNet-style multi-instrument
    # Per-instrument timbre: rolloff per instrument idx (cycled if fewer).
    instrument_rolloffs: Tuple[float, ...] = (1.0, 0.5, 1.5, 2.0)

    @property
    def n_pitches(self) -> int:
        return self.pitch_max - self.pitch_min + 1


@dataclass(frozen=True)
class LoopConfig:
    """SAGA generative-subtractive loop (SURVEY.md C9)."""

    # Per-clip/chunk note capacity.  256 = ~12.8 notes/s over a 20 s
    # stream chunk — headroom above routine MAESTRO density (~8 notes/s).
    # Hitting it is NOT silent: the loop flags the lane saturated and
    # the host logs a truncation warning (NotesBatch.saturated).
    max_notes: int = 256
    # Terminate when residual energy falls below this fraction of initial.
    silence_rel: float = 1e-3
    # Minimum least-squares gain for a note to be accepted (gains below
    # ~0.04 are inaudible leftovers of imperfect polyphonic subtraction
    # and show up as spurious velocity<=5 notes).
    min_gain: float = 0.04
    # Minimum score (energy reduction) relative to current residual energy.
    min_score_rel: float = 1e-4
    # Score floor relative to INITIAL energy (0 disables).  min_score_rel
    # compares against the CURRENT residual, so its bar collapses by
    # orders of magnitude late in the loop — with the peak-rejection
    # mask extending extraction into the quiet tail of dense mixtures,
    # deep-residual junk (beating/window-smear residue of earlier
    # subtractions) clears it easily and costs precision.  A real
    # note's score is ~its share of the clip's energy: the quietest
    # 8-voice fixture notes (velocity 44, 0.12 s) sit at ~7e-4 of
    # initial energy, most junk far below.  Both thresholds apply (max
    # of the two quantized bars); golden mirrors.  Default chosen by a
    # 1e-4/3e-4 sweep (docs/PERFORMANCE.md round-3 dense table): 3e-4
    # restores the repeated-note etude exactly and 4-voice precision
    # to 0.972 while keeping the dense-recall gains.
    min_score_rel0: float = 3e-4
    # Shadow suppression: reject a candidate whose (instrument, pitch)
    # matches an already-extracted note nearby in time when its gain is
    # below this fraction of that note's gain — such candidates are
    # leftovers of imperfect polyphonic subtraction, not new notes.
    # 0 disables.
    shadow_gain_frac: float = 0.25
    # Shape of the suppression window around the earlier note:
    #   template - one full template extent both sides (default).
    #   duration - [onset - lead, onset + dur + tail]: residue of the
    #              subtraction can only live where the subtracted atom
    #              had energy, so a re-struck same pitch AFTER the note
    #              ended is a legitimate onset.  Measured (round 3,
    #              golden sweeps): no recall gain on the pinned suites
    #              and -0.4pt 4-voice precision (the narrower window
    #              admits subtraction-residue FPs), so the blanket
    #              window stays the default; "duration" pairs with the
    #              refractory gate for repeated-note material.
    shadow_window: str = "template"  # "duration" | "template"
    shadow_lead_frames: int = 4
    shadow_tail_frames: int = 12
    # Onset-refractory duration gating: greedy matching pursuit on a
    # RE-STRUCK pitch prefers one long atom spanning all the strikes
    # (it explains more energy than the first strike alone), which
    # swallows every re-onset — measured R=0.71 on a repeated-note
    # etude with P=0.96.  With this on, a candidate's duration may not
    # cross a later coarse-score local maximum of the same (instrument,
    # pitch) column whose quantized height reaches this fraction of the
    # candidate onset's own coarse score (the shortest grid duration is
    # always allowed).  "Local maximum" requires a strict rise in time
    # AND a pitch-axis local max within the instrument block (a
    # neighbor pitch's onset leaks into this column and would chop held
    # notes otherwise).  0 disables.  Decisions compare quantized
    # values; golden mirrors op-for-op.
    # DEFAULT 0 (off), by measurement (round 3, golden sweeps): at 0.3
    # the repeated-note etude gains +4.6 F1 (R 0.711 -> 0.815) but
    # 4-voice MUS loses 2.4pt precision (held notes in dense mixtures
    # get split at beating-induced coarse rises) — enable for
    # repeated-note-dense material (piano etudes), keep off for
    # sustained polyphony.
    onset_refractory_frac: float = 0.0
    # Peak-rejection masking: when a selected coarse peak's best
    # candidate fails a QUALITY gate (min_gain / min_score / shadow /
    # harmonic shadow), remember the peak frame's quantized coarse
    # value and skip that frame in later peak selections while the
    # value is unchanged — any subtraction touching the window changes
    # the coarse score there, automatically re-arming the frame.
    # Without this a handful of PERSISTENT shadow-rejected residue
    # peaks crowd out the n_extract peak slots in dense mixtures and
    # the first all-rejected iteration permanently stops the lane while
    # quieter true notes remain (traced on 8-voice fixtures: the loop
    # stopped at iteration 31 re-rejecting the same 4 peaks with ~20
    # true notes left).  Measured with stop_patience=1 +
    # min_score_rel0=3e-4: 8-voice F1 0.8735 -> 0.8835 (recall +2.0pt)
    # at UNCHANGED bench trip count; 4-voice 0.9720 -> 0.9701 (one
    # extended-extraction junk note slips the gates); etude/mono/
    # 2-voice/off-grid untouched (docs/PERFORMANCE.md round-3 dense
    # table).  Decisions compare quantized values; golden mirrors
    # op-for-op.
    peak_rejection_mask: bool = True
    # Consecutive all-rejected iterations tolerated before a lane stops
    # (only meaningful with peak_rejection_mask: each such iteration
    # masks up to n_extract junk peaks so weaker true peaks surface).
    # Default 1 = the classic stop rule (the first all-rejected
    # iteration ends the lane); the mask's gain then comes purely from
    # masking rejections during ACCEPTING iterations, which frees peak
    # slots at ZERO extra while_loop trips on the bench mix (measured:
    # patience 1 = 14 trips, 8-voice F1 +1.0pt over no-mask; patience
    # 2 = 15 trips, +1.24pt; patience 4 = 17 trips and 4-voice
    # precision drifts another 0.2pt — docs/PERFORMANCE.md round-3
    # dense table).
    stop_patience: int = 1
    # Emission-side onset snap (saga/snap.py): repair onsets fired
    # 2..onset_snap_frames coarse frames EARLY by a harmonically-related
    # neighbor's onset (the dominant residual 4-voice error mode), by
    # re-reading the ORIGINAL spectrogram's fundamental-region trace —
    # the pitch-unique bins — and comparing it against the note's OWN
    # expected fundamental energy (gain x template fundamental).  Pure
    # host NumPy on (emitted notes, wave), identical in the golden and
    # TPU paths (parity-preserving by construction); every guard
    # failure keeps the note untouched.  Measured (round 3): 4-voice
    # F1 0.9497 -> 0.9597, all other pinned suites unchanged.
    # 0 disables.
    onset_snap_frames: int = 8
    # Guard threshold: snap only when the fundamental trace at the
    # detected onset is below this fraction of the note's expected
    # fundamental energy (a sounding note sits at ~1.0x expectation;
    # masker leak into the pitch-unique bins sits far below).
    onset_snap_active_ratio: float = 0.35
    # The snapped onset is the first forward frame whose fundamental
    # trace reaches this fraction of the expected energy, plus the
    # STFT-overlap lead correction (n_fft//hop - 2 frames).
    onset_snap_rise_frac: float = 0.5
    # Emission-side re-strike split (saga/snap.py split_restrikes):
    # recover same-pitch re-onsets swallowed by one long atom — the
    # greedy-pursuit failure the opt-in onset_refractory_frac gate
    # targets, WITHOUT its 4-voice precision cost (the decision is made
    # from the pitch-unique fundamental trace vs the template's own
    # predicted decay, with bank-attributed cross-leak rejection, not
    # from the collision-prone coarse map).  Measured (round 3):
    # 4-voice F1 0.9597 -> 0.9720, repeated-note etude F1
    # 0.8304 -> 0.9603 (recall 0.715 -> 0.931) — strictly dominating
    # the opt-in refractory gate's 0.863-at-(-2.4pt-4-voice) tradeoff;
    # mono/2-voice/off-grid untouched.
    restrike_split: bool = True
    # Emission-side same-(pitch, program) twin dedup: drop a note
    # onsetting within +-1 frame of a louder same-pitch twin (rare loop
    # artifact; physically and MIDI-wise invalid).
    dedup_twins: bool = True
    # Emission-side absent-note recovery (saga/snap.py recover_absent):
    # scan every pitch's pristine fundamental-region trace, subtract
    # every emitted note's leak bound in quadrature, and emit sustained
    # unexplained rises (implied gain >= 0.18, >= 1 higher-harmonic
    # confirmation, away from same-pitch emissions) as recovered notes.
    # Targets the dense-polyphony miss class the residual cannot see:
    # quiet notes fully absorbed by neighbors' clamped subtraction
    # (measured: 43/85 mus8 FNs with ~0.2% of their energy left in the
    # residual).  Validated ON: held-out seeds avg +0.26pt (worst cell
    # -0.13), noise/template-mismatch 16/18 cells non-negative with
    # mus6/mus8 +0.17..+0.75pt everywhere (docs/PERFORMANCE.md).
    recover_absent: bool = True
    # Emission-side instrument re-pick (saga/snap.py
    # reassign_instruments): when the OBSERVED onset harmonic shape
    # (gain folded out, pollution-filtered via bank cross-leak)
    # contradicts the emitted instrument by at least this score
    # margin, re-assign to the evidence's pick.  Measured on 9
    # config-5 clips (435 attributed notes): margin 1.0 corrects 3
    # mis-attributions, breaks 0 (unconditional evidence would break
    # 15 — concurrent voices pollute harmonic regions).  Only active
    # with synth.n_instruments > 1; 0 disables.
    instrument_evidence_margin: float = 1.0
    # Emission-side offset trim (saga/snap.py trim_offsets): shorten
    # gross over-long durations (>= 2 frames) to the point where the
    # note's fundamental trace falls below 0.35x the held-note
    # expectation and stays absent — the off-grid suite's only failure
    # mode.  Fail-closed by physics: a sounding note cannot have an
    # absent fundamental, and other notes' energy in the region only
    # PREVENTS trimming.  Trim-only; runs last in the chain.
    offset_trim: bool = True
    # Notes extracted per loop iteration: up to n_extract coarse-score
    # peaks (local maxima, masked argmax) are extracted SEQUENTIALLY
    # within the iteration — greedy matching pursuit against the
    # UNCLAMPED virtual residual (iteration-start residual minus the g*W
    # of earlier same-iteration notes; clamping applies between
    # iterations).  On TPU all peaks' candidate dots come from ONE matmul
    # plus per-peak Gram updates, so the template bank streams from HBM
    # once per iteration, not once per peak.  Only the peak *selection*
    # uses the iteration-start coarse map.  Iteration count, not
    # per-iteration FLOPs, dominates TPU wall time, and one coarse map
    # (two full-residual matmuls) is shared by n_extract extractions.
    # n_extract=1 is the classic one-note-per-iteration loop.
    n_extract: int = 4
    # Mask radius (frames) around each selected peak, preventing the same
    # stale peak from being picked twice in one iteration.  Small on
    # purpose: live re-fitting makes overlapping subtraction windows
    # exact, so nearby notes may extract in the same iteration.
    peak_mask_radius: int = 4
    # Continuous duration refinement: the emitted duration is refined
    # past the grid by a parabolic fit of the winner's (quantized) scores
    # at grid neighbors (d-1, d, d+1) in log-duration space — computed on
    # the HOST in float64 from values recorded on device, identically for
    # the TPU and golden paths, so MIDI parity is preserved.  Subtraction
    # still uses the grid template (only grid atoms exist); this affects
    # emission only.
    refine_duration: bool = True
    # Candidate onset offsets (frames) tried around each coarse peak in
    # the exact refit.  On dense polyphony the coarse matched-filter
    # peak systematically fires EARLY (neighboring voices' decaying
    # energy tilts the envelope), so the set reaches further forward
    # than back: sweeping on the golden oracle, (-1, 0, 2) scores
    # 4-voice F1 0.950 vs 0.944 for the symmetric (-1, 0, 1) at equal
    # cost, ties it on 2-voice/mono/off-grid-onset/noise suites, and
    # gives back 0.4 pt on template-mismatch; (-1, 0, 1, 2) matches
    # (-1, 0, 2) everywhere at 4/3 the candidate-matmul cost.
    onset_offsets: Tuple[int, ...] = (-1, 0, 2)
    # Joint gain re-projection (orthogonal-matching-pursuit style): after
    # the greedy loop, re-fit ALL accepted notes' gains together by
    # nonnegative cyclic coordinate descent in the POWER domain —
    # ||spec^2 - sum g_a^2 W_a^2||^2 over squared-atom overlaps from the
    # precomputed Gram — because overlapping notes' magnitudes add in
    # quadrature, not linearly.  Greedy gains are fitted against the
    # residual mid-extraction and absorb the energy of not-yet-extracted
    # neighbors; the joint power-domain refit removes both that bias and
    # the coherent-addition bias (3-voice velocity MAE 14.3 -> 4.6).
    # Decisions (which notes, onsets, durations) are untouched —
    # emission-side only, like refine_duration.  The descent runs on the
    # HOST in float64 from decision-quantized device-recorded dots,
    # identically for the TPU and golden paths, so MIDI bit-parity is
    # preserved.  See core.notes.refit_gains_power_host.
    refit_gains: bool = True
    refit_sweeps: int = 4
    # Harmonic-phantom suppression: reject a candidate whose f0 sits on
    # a low harmonic of a SIMULTANEOUS same-instrument note (+12 = 2nd,
    # +19 = 3rd, +24 = 4th harmonic in semitones; onset within
    # harmonic_shadow_radius frames) when its gain is below this
    # fraction of that note's.  Mismatch energy at a harmonic appears
    # exactly when its parent sounds — unlike a real harmonically-
    # related note, whose onset is independent (a same-onset octave
    # DOUBLING survives unless much weaker than its parent).  0
    # disables.  0.3 measured: 4-voice precision 0.9558 -> 0.9672 at
    # -0.8pt recall (F1 +0.15pt), mono/2-voice suites unchanged.
    harmonic_shadow_frac: float = 0.3
    harmonic_intervals: Tuple[int, ...] = (12, 19, 24)
    harmonic_shadow_radius: int = 3
    # Instrument context vote (multi-instrument): a note whose top-2
    # instrument objectives are near-tied in the joint refit (see
    # core.notes.INSTRUMENT_AMBIGUITY — e.g. high pitches whose 1-2
    # in-band harmonics carry no rolloff information) takes the
    # majority instrument of the UNambiguous notes within this window.
    # DEFAULT OFF: it presumes voice continuity (instruments play
    # register-separated contiguous phrases); on the pinned fixtures,
    # whose voices have no register structure, it biases ambiguous
    # notes toward the most active instrument (measured config-5
    # instrument-F1 0.859 -> 0.812).  The real fix for the ambiguity is
    # SPECTRAL: extend dsp.n_bins so high notes keep >= 2 in-band
    # harmonics (0.859 -> 0.919 at n_bins=288; see docs).
    instrument_context_seconds: float = 0.0
    # (An OMP-style debias-then-resweep knob, rescan_iterations, lived
    # here in round 3: measured quality-negative on the pinned suites —
    # 4-voice F1 0.9501 -> 0.9463, multi-instrument FP bursts — shipped
    # default-off and DELETED in round 4 with its device/golden
    # machinery.  docs/PERFORMANCE.md records the numbers; git history
    # has the code.)
    # Candidate scoring uses the closed form
    #   score = 2*g*<window, W> - g^2*||W||^2
    # which equals (energy reduction) - 1.0*(over-subtraction energy):
    # clamped under- and over-shoot have disjoint support, so their squared
    # energies sum to the unclamped residual.  The unit over-subtraction
    # penalty is what makes duration selection well-posed (an over-long
    # template is no longer free); the closed form is what makes scoring
    # ALL (pitch, duration, offset) candidates a pure batched dot product.


@dataclass(frozen=True)
class ModelConfig:
    """Flax note-classifier CNN (SURVEY.md C7)."""

    channels: Tuple[int, ...] = (16, 32, 64)
    kernel_size: Tuple[int, int] = (3, 3)
    hidden: int = 128
    # Residual dilated temporal convs after the trunk (context for the
    # onset gate; the matched filter integrates ~80 frames of envelope).
    temporal_dilations: Tuple[int, ...] = (1, 2, 4)
    dropout: float = 0.0
    # Heads (models/classifier.py): onset_pitch [T, Q] logits, duration
    # [T, D] logits, presence [T] logit, velocity [T, Q] regression.
    # Score-head gate floor: coarse score = matched_filter * (floor +
    # (1-floor)*sigmoid(onset+presence)).  floor=1 disables the learned
    # gate (pure heuristic); floor=0 gives the net full veto power over
    # matched-filter peaks (a CNN false negative can then hide a real
    # onset, so keep a floor unless the training domain is trusted).
    # Default 0.4 from the acceptance sweep (benchmarks/eval_classifier):
    # clean 3-voice F1 ties the heuristic exactly (0.9627) while noise
    # 0.03 scores 0.9408 vs the heuristic's 0.8915; floor 0.25 trades 1.4
    # clean points for +0.3 under noise, floor 0.5 halves the noise edge.
    gate_floor: float = 0.4
    # Standalone dense decode (run.classifier="cnn_dense",
    # models/dense_decoder.py — the bank-free fallback): emission
    # threshold on P(onset)*P(presence) and the temporal NMS radius in
    # frames (labels carry soft ±1-frame neighbors, so radius >= 1).
    # 0.9 is the measured optimum for the shipped pos_weight=64
    # checkpoint (benchmarks/eval_dense.py sweep: mean fixture F1 0.62
    # vs 0.33 at 0.5) — recall-weighted training pushes onset
    # probabilities high, so the calibrated cut sits near the top.
    dense_threshold: float = 0.9
    dense_peak_radius: int = 2
    dtype: str = "float32"  # compute dtype for the conv tower


@dataclass(frozen=True)
class TrainConfig:
    batch_size: int = 8
    learning_rate: float = 3e-4
    weight_decay: float = 1e-4
    steps: int = 200
    seed: int = 0
    checkpoint_dir: str = "checkpoints"
    checkpoint_every: int = 100
    # Positive-class weight of the onset/presence BCE.  Onsets are
    # ~1/(T*Q) sparse; 64 wins for BOTH the gate use and the standalone
    # dense decode — a full pos_weight=8 run measured 24 pts WORSE mean
    # dense F1 at its own best threshold (0.38 vs 0.62; the low weight
    # starves recall faster than it buys precision), despite looking
    # better early in training (benchmarks/eval_dense.py sweeps).
    pos_weight: float = 64.0


@dataclass(frozen=True)
class StreamConfig:
    """Chunked long-audio transcription (SURVEY.md 3.5, config 4)."""

    # Overlap must cover one full template extent + lead (so every onset is
    # transcribed by a chunk that sees the whole note); for the default DSP
    # that is 80 frames * 32 ms + lead ~= 2.66 s.
    chunk_seconds: float = 20.0
    overlap_seconds: float = 3.0


@dataclass(frozen=True)
class RunConfig:
    """Batching / sharding / runtime (SURVEY.md L6, DESIGN)."""

    batch_size: int = 32
    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel: int = 1
    # Fused Pallas kernels (K1 spectrogram, K2 subtract) vs the plain
    # jnp (rfft) pipeline.  None = AUTO (the shipped default): Pallas on
    # an accelerator backend, rfft on CPU — resolved by
    # ``runtime_use_pallas``.  The benched and shipped on-chip path are
    # therefore the SAME configuration (round-3 verdict item 3):
    # measured 27,640 audio-sec/s/chip with Pallas vs 15,135 without
    # (batch 96 x 8 stacks).  Tradeoff: K1 deviates ~1e-4 relative from
    # the rfft spectrogram, which measured ONE flipped emission byte
    # across 768 10-s clips (~19k notes) vs the golden oracle —
    # ``--set run.use_pallas=false`` restores strict golden bit-parity;
    # ``true`` forces the kernels (interpret mode on CPU).  On-chip
    # parity/tolerance gates: ``selftest --on-chip``.
    use_pallas: bool | None = None
    # Device-side emission evidence pass (saga/evidence.py): the
    # spectral-evidence refinement chain's trace extraction and
    # vectorizable gating run on the accelerator as one jitted program
    # per batch shape, shipping only compact per-note stats and bounded
    # candidate lists; the host keeps the sequential decision logic.
    # None = AUTO: device pass on an accelerator backend, pure-host
    # NumPy chain (saga/snap.py) on CPU — on a 1-core host the chain
    # costs ~18 ms/lane, ~50x the device time of the transcription
    # itself (VERDICT r3 item 1).  Tolerance class as use_pallas: the
    # decisions read f32 device traces instead of f64 filterbank dots,
    # so gate-margin ties can flip vs the golden oracle;
    # ``false`` restores the strict host chain.
    emission_evidence: bool | None = None
    # (A fused selection-chain kernel flag, pallas_select, lived here in
    # round 3: the 435-line kernel measured 4-27% SLOWER than the XLA
    # selection chain once the deferred-subtract restructure removed the
    # op-launch tail it targeted, and was DELETED in round 4 —
    # docs/PERFORMANCE.md records the measurements; git history has the
    # code.)
    classifier: str = "heuristic"  # "heuristic" | "cnn"
    # Emitted-velocity source (CNN mode only; "gain" elsewhere):
    #   gain  - the joint-refit template gain through gain_to_velocity
    #           (exact on clean content; the default).
    #   head  - the classifier's velocity-regression head at the note's
    #           (onset, pitch) cell.
    #   blend - gain, except notes overlapping another note in time
    #           (within one template extent) average the two estimates:
    #           overlap is where the gain is ambiguous (shared energy)
    #           and where the head's spectral-shape evidence helps.
    velocity_source: str = "gain"  # "gain" | "head" | "blend"
    # CNN-mode gate input (run.classifier="cnn"):
    #   residual - rerun the conv tower on the current residual every
    #              loop iteration (the trained configuration: the gate
    #              sees mid-loop subtraction states).
    #   static   - compute the gate ONCE from the pristine spectrogram
    #              outside the while_loop and reuse it every iteration;
    #              the per-iteration cost collapses to the heuristic's
    #              matched filter (one conv pass per BATCH instead of
    #              per iteration).  Quality tradeoff measured in
    #              benchmarks/eval_classifier.py --static.
    cnn_gate: str = "residual"  # "residual" | "static"
    # Template bank source: "analytic" = damped-harmonic renders
    # (synth/templates.py); "neural" = the SING-style decoder's generated
    # bank (models/synth_decoder.py, trained with `train-synth`, loaded
    # from AMT_SYNTH_CHECKPOINT or <train.checkpoint_dir>/synth.msgpack).
    synth: str = "analytic"  # "analytic" | "neural"
    # Directory for AOT-serialized compiled executables (runtime/aot.py):
    # later processes reload the compiled program and skip tracing + XLA
    # backend compile entirely (minutes on the axon remote-compile path).
    # Empty disables.  Backend support is probed at runtime; unsupported
    # backends fall back to plain jit with a logged warning.
    aot_cache: str = ""
    # Host-side emission workers: notes_batch_to_sequences converts and
    # refines lanes in a thread pool of this size (0/1 = serial).  The
    # per-lane work (refit descent, duration fit, evidence chain) is
    # numpy/scipy-heavy and releases the GIL for its hot parts, so on a
    # multi-core production host the emission stage scales with cores
    # and stays off the corpus pipeline's critical path.  Lanes are
    # independent and results keep batch order, so outputs are
    # identical to serial.  "auto" (-1) = min(8, cpu_count - 1).
    emission_workers: int = -1
    # Max static waveform-length buckets for the corpus runner
    # (runtime/bucketing.py): each bucket is one compiled shape; the
    # planner uses FEWER when extra compiles don't pay (uniform corpus
    # -> 1).  1 restores the single global-max-length behavior.
    length_buckets: int = 4
    profile: bool = False
    # MXU precision for the two hot matmuls (coarse matched filter and
    # candidate dots).  "highest" (full f32) keeps TPU-vs-golden score
    # differences at ulp level, which the DECISION_DROP_BITS buckets
    # absorb — the bit-parity contract.  "high" (bf16_3x passes) is
    # ~10-15% faster end-to-end but its ~2^-14 relative error straddles
    # the 2^-10 decision buckets a few percent of the time; discrete
    # decisions mostly survive (ties are rare) but the CONTINUOUS
    # duration-refinement inputs (NotesBatch.sd) then differ from golden
    # often enough to break MIDI bit-parity — use it only where raw
    # throughput beats the parity guarantee.
    matmul_precision: str = "highest"  # "highest" | "high"


@dataclass(frozen=True)
class Config:
    dsp: DSPConfig = field(default_factory=DSPConfig)
    synth: SynthConfig = field(default_factory=SynthConfig)
    loop: LoopConfig = field(default_factory=LoopConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    stream: StreamConfig = field(default_factory=StreamConfig)
    run: RunConfig = field(default_factory=RunConfig)

    # ---- serialization ----

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2, sort_keys=True)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tp, sub):
            kwargs = {}
            for f in dataclasses.fields(tp):
                if f.name in sub:
                    v = sub[f.name]
                    # Subconfig trees hang off the ROOT Config only; a
                    # leaf field that happens to share a subconfig's name
                    # (e.g. RunConfig.synth) must stay a plain value.
                    if tp is cls and f.name in _SUBCONFIGS:
                        kwargs[f.name] = build(_SUBCONFIGS[f.name], v)
                    elif isinstance(v, list):
                        kwargs[f.name] = tuple(v)
                    else:
                        kwargs[f.name] = v
            return tp(**kwargs)

        return build(cls, d)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def override(self, **dotted: Any) -> "Config":
        """Override with dotted keys, e.g. ``override(**{"dsp.hop": 256})``.

        Values are validated against the CURRENT leaf's type, with string
        coercion for bool/int/float leaves.  This is load-bearing for the
        CLI's ``--set key=value`` path: ``json.loads("False")`` fails
        (JSON spells it ``false``) and used to fall back to the STRING
        ``"False"`` — a truthy value silently *enabling* the flag it was
        asked to clear (observed: ``--set loop.restrike_split=False``
        left the splitter on through an entire measurement run).
        """
        d = self.to_dict()
        for key, val in dotted.items():
            parts = key.split(".")
            node = d
            for p in parts[:-1]:
                node = node[p]
            leaf = parts[-1]
            if leaf not in node:
                raise KeyError(f"unknown config key: {key}")
            node[leaf] = _coerce_leaf(key, node[leaf], val)
        return Config.from_dict(d)


def _coerce_leaf(key: str, cur: Any, val: Any) -> Any:
    """Validate an override value against the current leaf's type.

    bool/int/float leaves accept their own type or a clean string
    spelling ("true"/"False"/"3"/"2.5" — CLI ``--set`` hands everything
    that isn't valid JSON through as a string); anything else raises
    instead of silently storing a mistyped value.  ``None``-able leaves
    (current value None, or "none"/"null" strings) pass through.
    """
    if val is None or cur is None:
        if isinstance(val, str):
            # A None-able leaf loses its type anchor, so coerce the
            # common CLI string spellings here instead of passing the
            # raw (truthy!) string through — the --set "False" bug
            # class this validator exists for.
            low = val.lower()
            if low in ("none", "null", "auto"):
                return None
            if low in ("true", "false"):
                return low == "true"
        return val
    if isinstance(cur, bool):
        if isinstance(val, bool):
            return val
        if isinstance(val, str) and val.lower() in ("true", "false"):
            return val.lower() == "true"
        if isinstance(val, (int, float)) and val in (0, 1):
            return bool(val)
        raise TypeError(
            f"config key {key} is a bool; got {val!r} (use true/false)")
    if isinstance(cur, int) and not isinstance(cur, bool):
        if isinstance(val, bool):
            raise TypeError(f"config key {key} is an int; got {val!r}")
        if isinstance(val, int):
            return val
        if isinstance(val, float) and val == int(val):
            return int(val)
        if isinstance(val, str):
            try:
                return int(val, 0)
            except ValueError:
                pass
        raise TypeError(f"config key {key} is an int; got {val!r}")
    if isinstance(cur, float):
        if isinstance(val, (int, float)) and not isinstance(val, bool):
            return float(val)
        if isinstance(val, str):
            try:
                return float(val)
            except ValueError:
                pass
        raise TypeError(f"config key {key} is a float; got {val!r}")
    if isinstance(cur, str):
        if isinstance(val, str):
            return val
        raise TypeError(f"config key {key} is a str; got {val!r}")
    if isinstance(cur, tuple):
        if isinstance(val, (tuple, list)):
            return tuple(val)
        raise TypeError(f"config key {key} is a tuple; got {val!r}")
    return val


_SUBCONFIGS = {
    "dsp": DSPConfig,
    "synth": SynthConfig,
    "loop": LoopConfig,
    "model": ModelConfig,
    "train": TrainConfig,
    "stream": StreamConfig,
    "run": RunConfig,
}


def default_config() -> Config:
    return Config()


def runtime_use_pallas(cfg: Config) -> bool:
    """Resolve ``run.use_pallas`` (tri-state) for THIS process's backend.

    None (the shipped default) = auto: the fused Pallas kernels on an
    accelerator backend, the plain rfft pipeline on CPU — so the on-chip
    default equals the benched configuration while CPU CI keeps the
    fast, strictly golden-bit-parity path.  Explicit true/false always
    wins (true on CPU runs the kernels in interpret mode)."""
    if cfg.run.use_pallas is not None:
        return bool(cfg.run.use_pallas)
    import jax

    return jax.default_backend() != "cpu"
