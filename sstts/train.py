"""Training program (reference `tacotron/train.py` — SURVEY.md §3.1).

The whole reference session loop collapses into one jitted `train_step`
(donated state, on-device STFT/mel feature extraction, teacher-forced forward,
L1+L1+stop loss, Adam update) executed per static bucket shape over a
("data", "model") mesh.  The host touches only: the input pipeline, metric
scalars, and checkpoint I/O.
"""

from __future__ import annotations

import collections
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh

from sstts.checkpoint import CheckpointManager
from sstts.config import Config
from sstts.data import pipeline as pipeline_mod
from sstts.data.ljspeech import load_metadata, train_eval_split
from sstts.data.synthetic import make_utterances
from sstts.dsp.ops import wav_to_features
from sstts.model.losses import frame_mask_from_lengths, tacotron_loss
from sstts.model.tacotron import Tacotron
from sstts.parallel.mesh import batch_sharding, make_mesh, replicated_sharding
from sstts.utils.logging import MetricsLogger


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_schedule(cfg: Config) -> optax.Schedule:
    t = cfg.training
    return optax.exponential_decay(
        init_value=t.learning_rate,
        transition_steps=t.lr_decay_steps,
        decay_rate=t.lr_decay_rate,
        staircase=True,
        end_value=t.lr_min,
    )


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    t = cfg.training
    return optax.chain(
        optax.clip_by_global_norm(t.grad_clip_norm),
        optax.adam(
            lr_schedule(cfg), b1=t.adam_beta1, b2=t.adam_beta2, eps=t.adam_eps
        ),
    )


def build_model(cfg: Config) -> Tacotron:
    dtype = jnp.bfloat16 if cfg.arch.compute_dtype == "bfloat16" else jnp.float32
    return Tacotron(cfg.arch, cfg.dataset, dtype=dtype)


def create_state(
    cfg: Config, mesh: Optional[Mesh] = None, seed: Optional[int] = None
) -> TrainState:
    """Initialize params/opt state under jit (eager init is pathologically
    slow through the device relay — one compiled program instead)."""
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    r = cfg.arch.reduction_factor
    lt = cfg.training.text_buckets[0]
    fr = -(-cfg.training.frame_buckets[0] // r) * r
    rng = jax.random.PRNGKey(cfg.training.seed if seed is None else seed)

    def init_fn(rng):
        ids = jnp.zeros((2, lt), jnp.int32)
        mel = jnp.zeros((2, fr, cfg.dataset.n_mels), jnp.float32)
        fmask = jnp.ones((2, fr), bool)
        variables = model.init(
            {"params": rng, "dropout": rng}, ids, mel, fmask, train=True
        )
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(variables["params"]),
        )

    if mesh is not None:
        out_shardings = replicated_sharding(mesh)
        return jax.jit(init_fn, out_shardings=out_shardings)(rng)
    return jax.jit(init_fn)(rng)


def make_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Build the jitted train step.  Signature: (state, batch) -> (state, metrics).

    The dropout rng derives from `state.step` (deterministic, resume-stable).
    Features (STFT -> linear/mel) are computed inside the step on device from
    raw waveforms (BASELINE config 5).
    """
    model = build_model(cfg)
    tx = make_optimizer(cfg)
    sched = lr_schedule(cfg)
    base_rng = jax.random.PRNGKey(cfg.training.seed + 1)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        samples = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
        linear_gt, mel_gt = wav_to_features(samples, cfg.dataset)
        total = mel_gt.shape[1]
        frame_mask = frame_mask_from_lengths(batch["n_frames"], total)
        dropout_rng = jax.random.fold_in(base_rng, state.step)

        def loss_fn(params):
            out, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["char_ids"],
                mel_gt,
                frame_mask,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss, metrics = tacotron_loss(
                out, mel_gt, linear_gt, batch["loss_frames"], cfg.arch,
                cfg.dataset, text_lengths=batch["text_len"],
            )
            return loss, (metrics, mutated["batch_stats"], out)

        (loss, (metrics, new_stats, out)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        metrics["lr"] = sched(state.step)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            train_step,
            in_shardings=(repl, data),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
    return jax.jit(train_step, donate_argnums=(0,))


def make_eval_step(cfg: Config):
    """Teacher-forced eval (no grads, running BN stats, no dropout)."""
    model = build_model(cfg)

    def eval_step(state: TrainState, batch):
        samples = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
        linear_gt, mel_gt = wav_to_features(samples, cfg.dataset)
        frame_mask = frame_mask_from_lengths(batch["n_frames"], mel_gt.shape[1])
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["char_ids"],
            mel_gt,
            frame_mask,
            train=False,
            rngs={"dropout": jax.random.PRNGKey(0)},
        )
        _, metrics = tacotron_loss(
            out, mel_gt, linear_gt, batch["loss_frames"], cfg.arch,
            cfg.dataset, text_lengths=batch["text_len"],
        )
        return metrics, out

    return jax.jit(eval_step)


_MEDIA_WAV_FNS: Dict[int, Any] = {}


def _log_eval_media(logger: MetricsLogger, step: int, cfg: Config, out) -> None:
    """Alignment + spectrogram images and reconstructed audio at eval time
    (the reference's TensorBoard image/audio summaries — SURVEY.md §5.5)."""
    if out is None:
        return
    try:
        import numpy as np

        from sstts.dsp.griffin_lim import spectrogram_to_wav
        from sstts.utils import visualization as viz

        align = np.asarray(jax.device_get(out["alignments"][0]))
        mel = np.asarray(jax.device_get(out["mel"][0]))
        logger.log_image(step, "eval/alignment", viz.plot_attention_alignment(align))
        logger.log_image(step, "eval/mel", viz.plot_spectrogram(mel, "predicted mel"))
        linear = out["linear"][:1]
        n_frames = linear.shape[1]
        # Cache the jitted vocoder per frame count: a fresh jit per eval
        # would recompile the whole Griffin-Lim program every epoch.
        fn = _MEDIA_WAV_FNS.get(n_frames)
        if fn is None:
            fn = jax.jit(
                lambda l: spectrogram_to_wav(
                    l, cfg, (n_frames - 1) * cfg.dataset.hop_len
                )
            )
            _MEDIA_WAV_FNS[n_frames] = fn
        wav = fn(linear)
        logger.log_audio(
            step, "eval/audio", np.asarray(jax.device_get(wav[0])),
            cfg.dataset.sample_rate,
        )
    except Exception as e:  # media logging must never kill training
        print(f"[warn] eval media logging failed: {type(e).__name__}: {e}", flush=True)


def _prefetch_to_device(batches: Iterator, sharding, depth: int = 2):
    """Overlap host->device batch uploads with device compute.

    The upload of a raw-waveform batch is tens of MB; issuing it from a
    background thread `depth` batches ahead hides it behind the previous
    train steps (the reference fed feed_dict synchronously every step —
    SURVEY.md §3.1)."""
    executor = ThreadPoolExecutor(max_workers=1)

    def put(item):
        bucket, batch = item
        return bucket, jax.tree.map(lambda x: jax.device_put(x, sharding), batch)

    queue: collections.deque = collections.deque()
    try:
        for item in batches:
            queue.append(executor.submit(put, item))
            if len(queue) > depth:
                yield queue.popleft().result()
        while queue:
            yield queue.popleft().result()
    finally:
        executor.shutdown(wait=False, cancel_futures=True)


def load_corpus(cfg: Config):
    """Corpus dispatch.

    - "ljspeech" / "csv": any LJSpeech-layout corpus on disk
      (`metadata.csv` with ``id|text|normalized text`` rows + ``wavs/``) —
      this covers the thesis's other corpora (Blizzard-Nancy, German) once
      exported to the same layout; set `dataset.sample_rate` accordingly.
    - "synthetic": the deterministic in-memory corpus (tests/benches).
    """
    if cfg.dataset.dataset == "synthetic":
        utts = make_utterances(cfg.dataset.synthetic_size, cfg.dataset)
        return train_eval_split(utts, max(cfg.dataset.eval_fraction, 0.05))
    if cfg.dataset.dataset in ("ljspeech", "csv"):
        utts = load_metadata(cfg.dataset)
        return train_eval_split(utts, cfg.dataset.eval_fraction)
    raise ValueError(f"unknown dataset kind: {cfg.dataset.dataset!r}")


def train(
    cfg: Config,
    workdir: str | Path = "runs/default",
    max_steps: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    log_every: Optional[int] = None,
) -> TrainState:
    """Full training driver: data -> jitted step -> checkpoints/metrics."""
    workdir = Path(workdir)
    if cfg.training.debug_nans:
        jax.config.update("jax_debug_nans", True)
    max_steps = max_steps or cfg.training.max_steps
    log_every = log_every or cfg.training.summary_every
    if mesh is None:
        # The data axis must divide the batch; default to the largest
        # compatible device count.
        import math

        n = math.gcd(cfg.training.batch_size, len(jax.devices()))
        mesh = make_mesh(data_parallel=n)
    logger = MetricsLogger(workdir)
    ckpt = CheckpointManager(cfg, workdir)

    train_utts, eval_utts = load_corpus(cfg)
    batcher = pipeline_mod.Batcher(train_utts, cfg)
    eval_batcher = pipeline_mod.Batcher(eval_utts, cfg) if eval_utts else None

    state = create_state(cfg, mesh)
    start_step, state = ckpt.restore_latest(state)
    if start_step is not None:
        print(f"resumed from checkpoint at step {start_step}", flush=True)

    train_step = make_train_step(cfg, mesh)
    eval_step = make_eval_step(cfg)
    data_shard = batch_sharding(mesh)

    step = int(jax.device_get(state.step))
    epoch = 0
    last_eval = step
    t_last = time.time()
    while step < max_steps:
        epoch_batches = 0
        batch_iter = _prefetch_to_device(
            batcher.epoch(cfg.training.seed + epoch, cfg.training.batch_size),
            data_shard,
        )
        for _, batch in batch_iter:
            epoch_batches += 1
            state, metrics = train_step(state, batch)
            step += 1
            if step % log_every == 0:
                metrics = jax.device_get(metrics)
                now = time.time()
                metrics["steps_per_s"] = log_every / max(now - t_last, 1e-9)
                t_last = now
                logger.log(step, metrics)
            if step % cfg.training.checkpoint_every == 0:
                ckpt.save(step, state)
            if step >= max_steps:
                break
        if epoch_batches == 0:
            raise ValueError(
                "the epoch produced zero batches: every utterance exceeded "
                "the configured buckets (text_buckets/frame_buckets) or the "
                "corpus is empty — widen the buckets or check the dataset"
            )
        epoch += 1
        # Evaluate at most once per eval_every steps (and always at the end).
        due = (step - last_eval) >= min(cfg.evaluation.eval_every, max_steps)
        if eval_batcher is not None and (due or step >= max_steps):
            last_eval = step
            agg: Dict[str, float] = {}
            n = 0
            last_out = None
            for _, ebatch in eval_batcher.epoch(0, cfg.evaluation.batch_size):
                emetrics, eout = eval_step(state, jax.tree.map(jnp.asarray, ebatch))
                last_out = eout
                for k, v in jax.device_get(emetrics).items():
                    agg[k] = agg.get(k, 0.0) + float(v)
                n += 1
                if n >= cfg.evaluation.num_eval_batches:
                    break
            if n:
                logger.log(step, {k: v / n for k, v in agg.items()}, prefix="eval")
                _log_eval_media(logger, step, cfg, last_out)
    ckpt.save(step, state)
    ckpt.close()
    logger.close()
    return state
