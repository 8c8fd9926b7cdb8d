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
from functools import lru_cache, partial
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path
from typing import Any, Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sstts.checkpoint import CheckpointManager
from sstts.config import Config
from sstts.data import pipeline as pipeline_mod
from sstts.data.ljspeech import load_metadata, train_eval_split
from sstts.data.synthetic import make_utterances
from sstts.dsp.ops import wav_to_features
from sstts.model.losses import frame_mask_from_lengths, tacotron_loss
from sstts.model.tacotron import Tacotron
from sstts.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    state_shardings,
)
from sstts.utils.logging import MetricsLogger


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    #: Polyak-averaged parameter tree (training.ema_decay > 0), else None
    #: (None holds no pytree leaves, so the default state tree — and every
    #: pre-EMA checkpoint — is unchanged).
    ema_params: Any = None


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


def build_model(cfg: Config, mesh: Optional[Mesh] = None) -> Tacotron:
    dtype = jnp.bfloat16 if cfg.arch.compute_dtype == "bfloat16" else jnp.float32
    # Under a multi-device GSPMD mesh the BiGRUs and the teacher-forced
    # decoder must stay on the XLA scan path: GSPMD cannot shard opaque
    # Pallas custom calls (same constraint as the vocoder's split_xla
    # override in sstts.synthesize).
    xla_pin = "xla" if mesh is not None and mesh.devices.size > 1 else None
    return Tacotron(
        cfg.arch, cfg.dataset, dtype=dtype,
        gru_backend=xla_pin, teacher_backend=xla_pin,
    )


def _make_init_fn(cfg: Config, mesh: Optional[Mesh] = None):
    """State initializer (rng -> TrainState), shared by create_state and
    the sharding-tree derivation."""
    model = build_model(cfg, mesh)
    tx = make_optimizer(cfg)
    # The first bucket's shape, from the single source of the rounding rule
    # (a local re-derivation could silently diverge from the real batches).
    lt, fr = pipeline_mod.frame_bucket_shapes(cfg)[0]

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
            # EMA starts at the init point (standard Polyak seeding; a
            # resume from a pre-EMA checkpoint re-seeds from the restored
            # params instead — sstts.checkpoint).
            ema_params=(
                jax.tree.map(lambda p: p, variables["params"])
                if cfg.training.ema_decay > 0.0
                else None
            ),
        )

    return init_fn


def train_state_shardings(cfg: Config, mesh: Mesh) -> TrainState:
    """Per-leaf NamedShardings for the train state: replicated, except the
    tensor-parallel leaves of parallel.mesh.TP_RULES when the mesh carries
    a populated "model" axis (the Adam moments mirror their parameters)."""
    init_fn = _make_init_fn(cfg, mesh)
    shapes = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    return state_shardings(mesh, shapes)


@lru_cache(maxsize=None)
def _jitted_init(cfg: Config, mesh: Optional[Mesh]):
    """Memoized jitted init program — see make_train_step's rationale."""
    init_fn = _make_init_fn(cfg, mesh)
    if mesh is not None:
        return jax.jit(
            init_fn, out_shardings=train_state_shardings(cfg, mesh)
        )
    return jax.jit(init_fn)


def create_state(
    cfg: Config, mesh: Optional[Mesh] = None, seed: Optional[int] = None
) -> TrainState:
    """Initialize params/opt state under jit (eager init is pathologically
    slow through the device relay — one compiled program instead)."""
    rng = jax.random.PRNGKey(cfg.training.seed if seed is None else seed)
    return _jitted_init(cfg, mesh)(rng)


def _make_step_body(
    cfg: Config, mesh: Optional[Mesh] = None, from_features: bool = False
):
    """The un-jitted train step body: (state, batch) -> (state, metrics).

    `from_features=True` expects precomputed "linear"/"mel" batch fields
    (the feature-format device corpus) instead of "samples" + on-device
    featurization; the math downstream is identical.
    """
    model = build_model(cfg, mesh)
    tx = make_optimizer(cfg)
    sched = lr_schedule(cfg)
    base_rng = jax.random.PRNGKey(cfg.training.seed + 1)

    def train_step(
        state: TrainState, batch: Dict[str, jnp.ndarray]
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if from_features:
            # f32 regardless of the corpus storage dtype ("features_bf16"
            # stores half-width targets; the loss math stays f32).
            linear_gt = batch["linear"].astype(jnp.float32)
            mel_gt = batch["mel"].astype(jnp.float32)
        else:
            samples = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
            linear_gt, mel_gt = wav_to_features(
                samples, cfg.dataset, cfg.training.feature_fft_impl
            )
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
        d = cfg.training.ema_decay
        if not 0.0 <= d < 1.0:
            raise ValueError(f"training.ema_decay must be in [0, 1): {d}")
        new_ema = (
            jax.tree.map(
                lambda e, p: e * d + p * (1.0 - d),
                state.ema_params,
                new_params,
            )
            if d > 0.0 and state.ema_params is not None
            else state.ema_params
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )
        return new_state, metrics

    return train_step


@lru_cache(maxsize=None)
def make_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Build the jitted train step.  Signature: (state, batch) -> (state, metrics).

    The dropout rng derives from `state.step` (deterministic, resume-stable).
    Features (STFT -> linear/mel) are computed inside the step on device from
    raw waveforms (BASELINE config 5).

    Memoized on (cfg, mesh) — both hash by value — so repeat builders (test
    suites, resumed drivers, eval tooling) reuse one jit instance and its
    compile cache instead of recompiling a multi-minute XLA program.  (The
    cached object is a jit wrapper, never device data — the lru_cache
    tracer-leak rule in CLAUDE.md concerns data helpers.)
    """
    train_step = _make_step_body(cfg, mesh)
    if mesh is not None:
        st = train_state_shardings(cfg, mesh)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            train_step,
            in_shardings=(st, data),
            out_shardings=(st, repl),
            donate_argnums=(0,),
        )
    return jax.jit(train_step, donate_argnums=(0,))


_CORPUS_KEYS = ("char_ids", "text_len", "samples", "n_frames", "loss_frames")
_CORPUS_KEYS_FEATURES = (
    "char_ids", "text_len", "linear", "mel", "n_frames", "loss_frames"
)
#: Rows per upload+featurize chunk when building a feature-format corpus:
#: bounds the build's device transient (chunk PCM16 + chunk features) so a
#: near-budget corpus cannot OOM mid-build.  Tests shrink it to cover the
#: chunked path on small corpora.
_FEATURIZE_CHUNK_ROWS = 256


def corpus_keys(cfg: Config) -> Tuple[str, ...]:
    fmt = cfg.training.device_corpus_format
    if fmt in ("features", "features_bf16"):
        return _CORPUS_KEYS_FEATURES
    if fmt == "pcm16":
        return _CORPUS_KEYS
    raise ValueError(f"unknown device_corpus_format: {fmt!r}")


@lru_cache(maxsize=None)
def make_cached_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Train step over the HBM-resident corpus (SURVEY.md §3.1 rebuild note).
    Memoized on (cfg, mesh) — see make_train_step.

    Signature: (state, corpus_bucket, idx, valid) -> (state, metrics), where
    `corpus_bucket` is one bucket's device-resident example tensors
    (build_device_corpus), `idx` (B,) selects rows (gathered ON DEVICE —
    no per-step host->device batch upload), and `valid` (B,) zeros the loss
    contribution of epoch-tail fill rows.  The corpus rides as an explicit
    argument — closing over multi-GB device arrays would bake them into the
    program as constants.
    """
    keys = corpus_keys(cfg)
    train_step = _make_step_body(
        cfg, mesh, from_features="linear" in keys
    )

    def cached_step(state, corpus, idx, valid):
        batch = {k: jnp.take(corpus[k], idx, axis=0) for k in keys}
        batch["loss_frames"] = jnp.where(
            valid > 0, batch["loss_frames"], 0
        ).astype(batch["loss_frames"].dtype)
        return train_step(state, batch)

    if mesh is not None:
        st = train_state_shardings(cfg, mesh)
        repl = replicated_sharding(mesh)
        data = batch_sharding(mesh)
        return jax.jit(
            cached_step,
            in_shardings=(st, repl, data, data),
            out_shardings=(st, repl),
            donate_argnums=(0,),
        )
    return jax.jit(cached_step, donate_argnums=(0,))


@lru_cache(maxsize=None)
def make_grouped_train_step(cfg: Config, mesh: Optional[Mesh] = None):
    """S train steps in ONE dispatch (`training.steps_per_call`).
    Memoized on (cfg, mesh) — see make_train_step.

    `lax.scan` over (idxs (S, B), valids (S, B)): each iteration gathers its
    batch from the HBM-resident corpus on device and applies the same step
    body as make_cached_train_step, so the only host interaction for S
    steps is a single dispatch — the lever against the relay's per-call
    overhead floor (CLAUDE.md; BASELINE.md "sustained driver rate is
    relay-dispatch-bound").  Returns (state, metrics) with every metric
    stacked to (S,); slice on host only when logging is due (an eager
    device-side slice would itself cost a dispatch).
    """
    keys = corpus_keys(cfg)
    train_step = _make_step_body(
        cfg, mesh, from_features="linear" in keys
    )

    def grouped_step(state, corpus, idxs, valids):
        def body(st, iv):
            idx, valid = iv
            batch = {k: jnp.take(corpus[k], idx, axis=0) for k in keys}
            batch["loss_frames"] = jnp.where(
                valid > 0, batch["loss_frames"], 0
            ).astype(batch["loss_frames"].dtype)
            return train_step(st, batch)

        return jax.lax.scan(body, state, (idxs, valids))

    if mesh is not None:
        st = train_state_shardings(cfg, mesh)
        repl = replicated_sharding(mesh)
        gdata = NamedSharding(mesh, P(None, "data"))
        return jax.jit(
            grouped_step,
            in_shardings=(st, repl, gdata, gdata),
            out_shardings=(st, repl),
            donate_argnums=(0,),
        )
    return jax.jit(grouped_step, donate_argnums=(0,))


def build_device_corpus(
    cfg: Config,
    utts,
    mesh: Optional[Mesh] = None,
    audio_cache=None,
    batcher=None,
):
    """Upload the whole bucketed corpus to device HBM once (PCM16 wire).

    Returns ({bucket: {field: device array (N_b, ...)}}, {bucket: N_b}), or
    (None, reason) when over budget / empty.  Padding follows the exact
    static bucket shapes the host Batcher uses (each utterance goes through
    `make_batch` individually), so cached and host-fed training see
    byte-identical example rows.

    Host-memory discipline: each utterance's f32 waveform is converted to
    its padded int16 row IMMEDIATELY (never holding the decoded corpus in
    f32 — the Batcher's lazy-loading rationale), the running total is
    checked against the budget as rows accumulate (early abort, before the
    whole corpus is resident), and per-row buffers are released field by
    field as the bucket arrays are assembled.
    """
    if batcher is None:
        batcher = pipeline_mod.Batcher(utts, cfg, audio_cache=audio_cache)
    shapes = pipeline_mod.frame_bucket_shapes(cfg)
    hop = cfg.dataset.hop_len
    budget = cfg.training.device_corpus_budget_mb * (1 << 20)
    as_features = corpus_keys(cfg) is _CORPUS_KEYS_FEATURES
    feat_dtype = (
        jnp.bfloat16
        if cfg.training.device_corpus_format == "features_bf16"
        else jnp.float32
    )
    # linear+mel per padded frame (replaces the PCM16 samples on device);
    # 4 bytes/value f32, 2 bytes/value bf16.
    feat_row_bytes = {
        b: np.dtype(feat_dtype).itemsize
        * fr
        * (cfg.dataset.n_linear + cfg.dataset.n_mels)
        for b, (_, fr) in enumerate(shapes)
    }
    rows: Dict[int, list] = {}
    total_bytes = 0
    for u, ids in batcher.examples:
        audio = batcher.audio(u)
        nf = 1 + len(audio) // hop
        bucket = pipeline_mod.assign_bucket(len(ids), nf, shapes)
        if bucket < 0:
            continue
        lt, fr = shapes[bucket]
        row = pipeline_mod.make_batch([(ids, audio)], lt, fr, cfg)
        total_bytes += sum(
            feat_row_bytes[bucket] if as_features and k == "samples"
            else v.nbytes
            for k, v in row.items()
        )
        if total_bytes > budget:
            return None, (
                f"corpus exceeds the "
                f"{cfg.training.device_corpus_budget_mb} MiB device budget "
                f"(aborted after {sum(map(len, rows.values())) + 1} "
                "utterances)"
            )
        rows.setdefault(bucket, []).append(row)
    if not rows:
        return None, "no utterance fits the configured buckets"
    sharding = replicated_sharding(mesh) if mesh is not None else None

    def put(host):
        return (
            jax.device_put(host, sharding)
            if sharding is not None
            else jnp.asarray(host)
        )

    if as_features:
        # Featurize once at corpus build (on device) and store linear/mel
        # instead of the PCM16 waveform.  Same wav_to_features program the
        # step would run — cached and per-step featurization produce
        # identical features by construction.
        #
        # Device-memory discipline: rows upload and featurize in bounded
        # chunks written into donated full-bucket buffers, so the build's
        # HBM transient is one chunk's PCM16 + features (~100 MiB), NOT the
        # whole bucket's — a near-budget feature corpus (the scenario the
        # bf16 format exists for) must not OOM at build time just because
        # the bucket's int16 samples were briefly co-resident with its
        # features.  The budget gate above therefore bounds peak usage,
        # not just the stored corpus.
        ds = cfg.dataset
        rows_per_chunk = _FEATURIZE_CHUNK_ROWS

        def _chunk_features(s):
            lin, mel = wav_to_features(
                s.astype(jnp.float32) * (1.0 / 32767.0), ds,
                cfg.training.feature_fft_impl,
            )
            # Storage dtype: "features_bf16" keeps half-width targets on
            # device (the step casts back to f32); f32 otherwise.  Cast
            # INSIDE the mapped chunk so the lax.map accumulator itself is
            # bf16 — casting after the map would materialize the chunk in
            # f32 first (2x the stored bytes transiently).
            return lin.astype(feat_dtype), mel.astype(feat_dtype)

        @partial(jax.jit, out_shardings=(sharding, sharding))
        def featurize(samples):
            return jax.lax.map(_chunk_features, samples, batch_size=64)

        @partial(
            jax.jit, donate_argnums=(0, 1),
            out_shardings=(sharding, sharding),
        )
        def _write_chunk(lin_buf, mel_buf, samples, offset):
            lin, mel = jax.lax.map(_chunk_features, samples, batch_size=64)
            return (
                jax.lax.dynamic_update_slice_in_dim(lin_buf, lin, offset, 0),
                jax.lax.dynamic_update_slice_in_dim(mel_buf, mel, offset, 0),
            )

        def featurize_bucket(host):
            n = host.shape[0]
            if n <= rows_per_chunk:
                return featurize(put(host))
            row = jax.ShapeDtypeStruct(host.shape[1:], jnp.int16)
            lin_s, mel_s = jax.eval_shape(_chunk_features, row)
            alloc = partial(jnp.zeros, dtype=feat_dtype)
            bufs = jax.jit(
                lambda: (alloc((n, *lin_s.shape)), alloc((n, *mel_s.shape))),
                out_shardings=(sharding, sharding),
            )()
            # Fixed chunk shape (one compile); the final chunk re-covers
            # already-written rows instead of compiling a remainder shape —
            # featurization is deterministic, so the overlap is a no-op.
            starts = list(range(0, n - rows_per_chunk + 1, rows_per_chunk))
            if starts[-1] + rows_per_chunk < n:
                starts.append(n - rows_per_chunk)
            for off in starts:
                # numpy slice passed straight as a jit argument: the
                # transfer folds into the async dispatch (CLAUDE.md).
                bufs = _write_chunk(
                    *bufs, host[off : off + rows_per_chunk], np.int32(off)
                )
            return bufs

    corpus: Dict[int, Dict[str, jnp.ndarray]] = {}
    counts: Dict[int, int] = {}
    for bucket, items in sorted(rows.items()):
        dev = {}
        for k in list(items[0].keys()):
            host = np.concatenate([r.pop(k) for r in items], axis=0)
            if as_features and k == "samples":
                dev["linear"], dev["mel"] = featurize_bucket(host)
            else:
                dev[k] = put(host)
            del host
        corpus[bucket] = dev
        counts[bucket] = len(items)
    return (corpus, counts), None


def _bucket_batches(rng, n: int, batch_size: int):
    """One bucket's epoch as [(idx (B,) int32, valid (B,) f32)]: every row
    exactly once; the remainder batch repeats rows with valid=0 (zero loss
    contribution).  Shared by the single-step and grouped epoch generators
    so their coverage contracts cannot diverge."""
    perm = rng.permutation(n)
    out = []
    for start in range(0, n, batch_size):
        chunk = perm[start : start + batch_size]
        valid = np.ones(batch_size, np.float32)
        if len(chunk) < batch_size:
            valid[len(chunk) :] = 0.0
            fill = chunk[np.arange(batch_size - len(chunk)) % len(chunk)]
            chunk = np.concatenate([chunk, fill])
        out.append((chunk.astype(np.int32), valid))
    return out


def cached_epoch_indices(
    counts: Dict[int, int], batch_size: int, seed: int
):
    """Yield (bucket, idx (B,) int32, valid (B,) f32) covering each bucket
    once, shuffled; remainder batches repeat rows with valid=0 (zero loss)."""
    rng = np.random.default_rng(seed)
    order = []
    for bucket, n in sorted(counts.items()):
        order.extend(
            (bucket, c, v) for c, v in _bucket_batches(rng, n, batch_size)
        )
    rng.shuffle(order)
    yield from order


def grouped_epoch_indices(
    counts: Dict[int, int], batch_size: int, steps_per_call: int, seed: int
):
    """cached_epoch_indices grouped for the multi-step program: yields
    ("grouped", bucket, idxs (S, B), valids (S, B)) for full same-bucket
    runs of S batches, and ("single", bucket, idx (B,), valid (B,)) for
    each bucket's per-epoch remainder.  Same coverage contract: every
    corpus row appears exactly once per epoch (fill rows carry valid=0)."""
    rng = np.random.default_rng(seed)
    S = steps_per_call
    ops = []
    for bucket, n in sorted(counts.items()):
        chunks = _bucket_batches(rng, n, batch_size)
        n_full = len(chunks) - len(chunks) % S
        for i in range(0, n_full, S):
            grp = chunks[i : i + S]
            ops.append((
                "grouped", bucket,
                np.stack([c for c, _ in grp]),
                np.stack([v for _, v in grp]),
            ))
        for c, v in chunks[n_full:]:
            ops.append(("single", bucket, c, v))
    rng.shuffle(ops)
    yield from ops


def _clamp_grouped_ops(ops, budget: int):
    """Decompose grouped ops into singles where a full group would overshoot
    the remaining step budget, and stop once the budget is covered — so
    `train(max_steps=N)` lands exactly on N for any steps_per_call."""
    used = 0
    for op in ops:
        if used >= budget:
            return
        if op[0] == "grouped" and used + len(op[2]) > budget:
            _, bucket, idxs, valids = op
            for i in range(len(idxs)):
                yield ("single", bucket, idxs[i], valids[i])
                used += 1
                if used >= budget:
                    return
            continue
        used += len(op[2]) if op[0] == "grouped" else 1
        yield op


def _skip_epoch_steps(ops, n_steps: int):
    """Drop the first `n_steps` training steps of an epoch's op stream.

    Used on resume to fast-forward the restored mid-epoch position so the
    data order continues where the interrupted run stopped instead of
    replaying the epoch from its start.  A resume offset routinely lands
    INSIDE a grouped op: a stage boundary lands exactly on max_steps
    because `_clamp_grouped_ops` decomposes the budget tail into singles,
    while the regenerated epoch stream is unclamped.  The straddling
    grouped op is split and its un-run tail re-emitted as single-step
    ops, so the resumed run trains exactly the batches the interrupted
    run did not.  (Round-5 fix — the earlier skip-whole-op fallback could
    consume the entire epoch when the straddling op was the epoch's last,
    false-tripping the zero-batch corpus check: observed resuming the
    r=2 flagship at step 100000 = epoch 1086 x 92 + 88 with S=8.)"""
    consumed = 0
    for op in ops:
        if consumed >= n_steps:
            yield op
            continue
        ns = len(op[2]) if op[0] == "grouped" else 1
        consumed += ns
        if consumed > n_steps:
            # Only a grouped op (ns > 1) can straddle the offset.
            tail = consumed - n_steps
            _, bucket, idxs, valids = op
            print(
                f"[resume] grouped op straddles the resume offset: "
                f"re-emitting {tail} of its {ns} steps as singles",
                flush=True,
            )
            for i in range(ns - tail, ns):
                yield ("single", bucket, idxs[i], valids[i])


@lru_cache(maxsize=None)
def make_eval_step(cfg: Config, mesh: Optional[Mesh] = None):
    """Teacher-forced eval (no grads, running BN stats, no dropout).
    Memoized on (cfg, mesh) — see make_train_step.

    `mesh` only pins the XLA GRU backend under multi-device GSPMD (same
    constraint as make_train_step); the step itself is a plain jit."""
    model = build_model(cfg, mesh)

    def eval_step(state: TrainState, batch):
        samples = batch["samples"].astype(jnp.float32) * (1.0 / 32767.0)
        linear_gt, mel_gt = wav_to_features(
            samples, cfg.dataset, cfg.training.feature_fft_impl
        )
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


# Jitted eval-media vocoders, keyed on (config, n_frames): the vocoder
# closes over dataset/inference hparams (hop_len, n_fft, GL iters), so a
# frame-count-only key would silently reuse a vocoder compiled for another
# config in the same process.  Config is a frozen dataclass — hashable.
# Cleared per test module by tests/conftest.py alongside the step builders
# (bounding accumulated live executables — the XLA-CPU segfault envelope).
_MEDIA_WAV_FNS: Dict[Any, Any] = {}


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
        # Cache the jitted vocoder per (config, frame count): a fresh jit
        # per eval would recompile the whole Griffin-Lim program every epoch.
        key = (cfg, n_frames)
        fn = _MEDIA_WAV_FNS.get(key)
        if fn is None:
            fn = jax.jit(
                lambda l: spectrogram_to_wav(
                    l, cfg, (n_frames - 1) * cfg.dataset.hop_len
                )
            )
            _MEDIA_WAV_FNS[key] = fn
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
      (`metadata.csv` with ``id|text|normalized text`` rows + ``wavs/``).
    - "blizzard_nancy": Blizzard-2011 Nancy layout (festival `prompts.data`
      + `wavn/`) — SURVEY.md §2.3's thesis corpus row.
    - "css10": CSS10 layout (`transcript.txt`), covering the thesis's
      German corpus; set `dataset.sample_rate` (and `resample_on_load`)
      accordingly.
    - "synthetic": the deterministic in-memory corpus (tests/benches).
    """
    if cfg.dataset.dataset == "synthetic":
        utts = make_utterances(cfg.dataset.synthetic_size, cfg.dataset)
        return train_eval_split(utts, max(cfg.dataset.eval_fraction, 0.05))
    if cfg.dataset.dataset in ("ljspeech", "csv"):
        utts = load_metadata(cfg.dataset)
        return train_eval_split(utts, cfg.dataset.eval_fraction)
    if cfg.dataset.dataset in ("blizzard_nancy", "css10"):
        from sstts.data import corpora

        loader = {
            "blizzard_nancy": corpora.load_blizzard_nancy,
            "css10": corpora.load_css10,
        }[cfg.dataset.dataset]
        return train_eval_split(loader(cfg.dataset), cfg.dataset.eval_fraction)
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
        # compatible device count after reserving the tensor-parallel axis.
        import math

        n_model = max(cfg.training.model_parallel, 1)
        n_dev = len(jax.devices())
        if n_dev % n_model:
            raise ValueError(
                f"training.model_parallel={n_model} does not divide the "
                f"{n_dev} visible devices"
            )
        n = math.gcd(cfg.training.batch_size, n_dev // n_model)
        mesh = make_mesh(data_parallel=n, model_parallel=n_model)
    logger = MetricsLogger(workdir)
    ckpt = CheckpointManager(cfg, workdir)
    try:
        return _train_loop(cfg, mesh, max_steps, log_every, logger, ckpt)
    finally:
        # Failure hygiene (SURVEY.md §5.3): a crash mid-run must still flush
        # pending async checkpoint writes and the metrics stream so the next
        # process can restart-resume from the last durable step.
        ckpt.close()
        logger.close()


def _train_loop(
    cfg: Config,
    mesh: Mesh,
    max_steps: int,
    log_every: int,
    logger: MetricsLogger,
    ckpt: CheckpointManager,
) -> TrainState:
    train_utts, eval_utts = load_corpus(cfg)
    batcher = pipeline_mod.Batcher(train_utts, cfg)
    eval_batcher = pipeline_mod.Batcher(eval_utts, cfg) if eval_utts else None

    state = create_state(cfg, mesh)
    start_step, state = ckpt.restore_latest(state)
    if start_step is not None:
        print(f"resumed from checkpoint at step {start_step}", flush=True)

    eval_step = make_eval_step(cfg, mesh)
    data_shard = batch_sharding(mesh)

    # HBM-resident corpus: gather batches on device instead of uploading
    # tens of MB per step through the host link (the measured training
    # bottleneck — BASELINE.md).  Falls back to host feeding when the
    # corpus exceeds the budget (or device_corpus_cache="off").
    corpus = counts = None
    if cfg.training.device_corpus_cache != "off":
        built, reason = build_device_corpus(
            cfg, train_utts, mesh, batcher=batcher
        )
        if built is not None:
            corpus, counts = built
            n_ex = sum(counts.values())
            print(
                f"device corpus cache: {n_ex} utterances resident in HBM "
                f"({len(counts)} buckets)", flush=True,
            )
        else:
            if cfg.training.device_corpus_cache == "on":
                raise ValueError(f"device_corpus_cache=on but {reason}")
            print(f"device corpus cache disabled: {reason}", flush=True)
    if corpus is not None:
        cached_step = make_cached_train_step(cfg, mesh)
    else:
        train_step = make_train_step(cfg, mesh)

    step = int(jax.device_get(state.step))
    # Resume must CONTINUE the data order, not replay epoch 0 (the epoch
    # seeds are cfg.training.seed + epoch): derive the epoch counter and
    # the mid-epoch offset from the restored step.  Batch counts per epoch
    # are shuffle-invariant, so the division is exact.
    epoch = 0
    skip_steps = 0
    if step > 0:
        if corpus is not None:
            spe = sum(
                -(-n // cfg.training.batch_size) for n in counts.values()
            )
        else:
            spe = batcher.batches_per_epoch(cfg.training.batch_size)
        if spe > 0:
            epoch, skip_steps = divmod(step, spe)
            if skip_steps:
                print(
                    f"resume: continuing data order at epoch {epoch} "
                    f"(+{skip_steps} of {spe} steps)", flush=True,
                )
    last_eval = step
    last_log_step = step
    t_last = time.time()
    # Multi-step dispatch (training.steps_per_call > 1): S steps ride one
    # jitted call; log/checkpoint cadences fire on threshold crossings so
    # they behave identically for any S.
    S = max(1, int(cfg.training.steps_per_call)) if corpus is not None else 1
    if corpus is None and int(cfg.training.steps_per_call) > 1:
        print(
            f"steps_per_call={cfg.training.steps_per_call} needs the "
            "device corpus (gathers run on device); falling back to "
            "single-step dispatch because the corpus is host-fed",
            flush=True,
        )
    grouped_step = make_grouped_train_step(cfg, mesh) if S > 1 else None
    while step < max_steps:
        epoch_batches = 0
        if corpus is not None:
            if S > 1:
                # Skip BEFORE clamping: the skipped steps already ran in
                # the interrupted run and must not count against the
                # remaining budget.
                ops = _clamp_grouped_ops(
                    _skip_epoch_steps(
                        grouped_epoch_indices(
                            counts, cfg.training.batch_size, S,
                            cfg.training.seed + epoch,
                        ),
                        skip_steps,
                    ),
                    max_steps - step,
                )
            else:
                ops = (
                    ("single", bucket, idx, valid)
                    for bucket, idx, valid in cached_epoch_indices(
                        counts, cfg.training.batch_size,
                        cfg.training.seed + epoch,
                    )
                )
                ops = _skip_epoch_steps(ops, skip_steps)
        else:
            ep = batcher.epoch(
                cfg.training.seed + epoch, cfg.training.batch_size
            )
            if skip_steps:
                # Drop already-consumed batches before the device prefetch
                # so skipped batches never cross the host link.
                import itertools

                ep = itertools.islice(ep, skip_steps, None)
            ops = (
                ("host", None, batch, None)
                for _, batch in _prefetch_to_device(ep, data_shard)
            )
        was_resume_epoch = skip_steps > 0
        skip_steps = 0
        for op in ops:
            epoch_batches += 1
            kind, bucket, a, b = op
            if kind == "host":
                state, metrics = train_step(state, a)
                ns = 1
            elif kind == "single":
                # idx/valid ride as raw numpy jit arguments: the transfer
                # folds into the async dispatch.  An eager jnp.asarray here
                # is a BLOCKING host->device round-trip per array — measured
                # 9.3 steps/s vs 96 steps/s for the identical program with
                # argument-folded transfers in the same degraded relay
                # window (2026-08-17).
                state, metrics = cached_step(state, corpus[bucket], a, b)
                ns = 1
            else:
                ns = len(a)
                state, metrics = grouped_step(state, corpus[bucket], a, b)
            step += ns
            if step // log_every != (step - ns) // log_every:
                metrics = {
                    k: float(np.asarray(v).reshape(-1)[-1])
                    for k, v in jax.device_get(metrics).items()
                }
                now = time.time()
                metrics["steps_per_s"] = (
                    (step - last_log_step) / max(now - t_last, 1e-9)
                )
                last_log_step = step
                t_last = now
                logger.log(step, metrics)
            ckpt_every = cfg.training.checkpoint_every
            if step // ckpt_every != (step - ns) // ckpt_every:
                ckpt.save(step, state)
            if step >= max_steps:
                break
        if epoch_batches == 0 and not was_resume_epoch:
            # A resume-skip epoch can legitimately be (nearly) consumed by
            # the fast-forward; only a FRESH epoch yielding nothing means
            # the corpus/buckets are broken.
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
                # Numpy batch straight into the jitted step: the transfer
                # folds into the async dispatch (an eager jnp.asarray per
                # array is a blocking relay round-trip — CLAUDE.md).
                emetrics, eout = eval_step(state, ebatch)
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
    return state
