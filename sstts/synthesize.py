"""Inference program: text -> mel -> linear -> Griffin-Lim -> WAV.

Counterpart of the reference's `tacotron/inference.py` (SURVEY.md §3.2), with
the whole pipeline — encoder, fixed-shape autoregressive decoder scan with
stop-token masking, post-CBHG, and the 60-iteration Griffin-Lim loop —
compiled into ONE XLA program per (batch, text_bucket, max_steps) shape.
Device boundary only at text-in / samples-out (the BASELINE north star).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sstts.config import Config
from sstts.data import text as text_mod
from sstts.data import wav as wav_mod
from sstts.dsp.griffin_lim import spectrogram_to_wav
from sstts.model.losses import frame_mask_from_lengths
from sstts.model.tacotron import Tacotron


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class Synthesizer:
    """Compiled text->WAV synthesis with shape bucketing.

    One compiled program per (batch, text_len, max_steps) combination; repeat
    calls with same-bucket inputs reuse the compilation (SURVEY.md §3.2).
    """

    def __init__(
        self,
        cfg: Config,
        params: Any,
        batch_stats: Any,
        seed: int = 0,
        mesh: Any = None,
        partition: str = "gspmd",
    ):
        """`mesh`: optional `jax.sharding.Mesh` for data-parallel synthesis —
        the batch shards over the "data" axis, variables replicate, and the
        whole program partitions over devices (encoder, AR scan, Griffin-Lim
        are all batch-parallel, so no cross-device collectives are needed).
        The pipelined chunk fetch is a single-host-link optimization and is
        bypassed under a mesh.

        `partition` (mesh only): "gspmd" lets XLA partition one global
        program from the sharding annotations (the vocoder auto-selects the
        Pallas-free "split_xla" implementation, since GSPMD cannot shard
        opaque custom calls); "shard_map" maps the per-shard program over
        the mesh explicitly, so the Pallas kernels run per-shard unchanged
        (the per-utterance prenet-dropout streams are folded with the shard
        index, so the noise differs from the gspmd layout but stays
        independent across shards)."""
        if partition not in ("gspmd", "shard_map"):
            raise ValueError(f"unknown partition mode: {partition!r}")
        if cfg.inference.wire_format not in (
            "pcm16", "mulaw8", "adpcm4", "adpcm3", "adpcm2"
        ):
            raise ValueError(
                f"unknown wire_format {cfg.inference.wire_format!r}; "
                "expected 'pcm16', 'mulaw8', 'adpcm4', 'adpcm3' or 'adpcm2'"
            )
        # One flag governs every Pallas path: GSPMD partitions a global
        # program from sharding annotations but cannot shard an opaque
        # custom call, so under a multi-device gspmd mesh the vocoder, the
        # BiGRUs, and the AR decoder must all stay Pallas-free (shard_map
        # runs the per-shard program unchanged, Pallas included).
        self._gspmd_multidev = (
            mesh is not None
            and partition == "gspmd"
            and mesh.devices.size > 1
        )
        if self._gspmd_multidev and cfg.inference.griffin_lim_iter_impl in (
            None,
            "auto",
        ):
            # "auto" would resolve to the fused Pallas kernel on TPU, so it
            # gets the same mesh-safe override; only an explicit
            # "fused"/"split" choice bypasses it.
            import dataclasses as _dc

            cfg = cfg.replace(
                inference=_dc.replace(
                    cfg.inference, griffin_lim_iter_impl="split_xla"
                )
            )
        self.cfg = cfg
        self.mesh = mesh
        self.partition = partition if mesh is not None else "gspmd"
        dtype = (
            jnp.bfloat16 if cfg.arch.compute_dtype == "bfloat16" else jnp.float32
        )
        gru_backend = "xla" if self._gspmd_multidev else None
        self.model = Tacotron(
            cfg.arch, cfg.dataset, dtype=dtype, gru_backend=gru_backend
        )
        # Pin the variables on device once: host-side (numpy) params would be
        # re-uploaded on EVERY call (10s of MB through the host link).
        variables = {"params": params, "batch_stats": batch_stats}
        if mesh is not None:
            from sstts.parallel.mesh import replicated_sharding

            self.variables = jax.device_put(
                variables, replicated_sharding(mesh)
            )
        else:
            self.variables = jax.device_put(variables)
        self._rng = jax.random.PRNGKey(seed)
        self._decoder_param_count = sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree.leaves(params.get("decoder_cell", {}))
        )
        self._decoder_impl = self._resolve_decoder_impl()
        self._sm_cache: Dict[Any, Any] = {}
        self._lite_jit = None
        if self.partition == "shard_map":
            self._program = self._shard_map_program
        else:
            self._program = jax.jit(
                self._synthesize_fn, static_argnames=("max_steps",)
            )
        self._prepare = jax.jit(
            self._prepare_fn, static_argnames=("max_steps",)
        )
        self._vocode = jax.jit(self._vocode_fn)
        # Chunked vocoder for the pipelined fetch path: dynamic start (traced
        # scalar -> ONE compiled program per chunk size), static size.
        self._vocode_chunk = jax.jit(
            lambda linear, start, size: self._vocode_fn(
                jax.lax.dynamic_slice_in_dim(linear, start, size, axis=0)
            )["wav_wire"],
            static_argnames=("size",),
        )

    @classmethod
    def from_checkpoint(cls, cfg: Config, workdir, **kw) -> "Synthesizer":
        """Load the latest checkpoint under `workdir` and build a
        Synthesizer from it (the reference inference.py's load-and-serve
        entry, SURVEY.md §3.2; same restore path as `sstts.cli synthesize`).

        Raises FileNotFoundError when no checkpoint exists."""
        import jax as _jax

        from sstts.checkpoint import CheckpointManager
        from sstts.train import _make_init_fn

        # Abstract restore template (jax.eval_shape): serving startup must
        # not pay the jitted-init compile nor fetch a full TrainState
        # (params + 2x Adam moments) over the host link just to discard it
        # — orbax StandardRestore accepts ShapeDtypeStruct leaves.
        shard = _jax.sharding.SingleDeviceSharding(_jax.devices()[0])
        template = _jax.tree.map(
            lambda s: _jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=shard),
            _jax.eval_shape(_make_init_fn(cfg), _jax.random.PRNGKey(0)),
        )
        ckpt = CheckpointManager(cfg, workdir)
        try:
            if cfg.inference.use_ema and not ckpt.stored_has_ema():
                raise ValueError(
                    f"inference.use_ema: checkpoint under {workdir} stores "
                    "no ema_params tree (train with training.ema_decay > 0)"
                )
            step, state = ckpt.restore_latest(template)
        finally:
            ckpt.close()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {workdir}")
        params = (
            state.ema_params if cfg.inference.use_ema else state.params
        )
        return cls(cfg, params, state.batch_stats, **kw)

    def _shard_map_program(
        self, variables, char_ids, rng, max_steps: int, lite: bool = False
    ):
        """Explicit SPMD: map the per-shard synthesis program over the mesh.

        Each device runs the FULL single-chip program (including the Pallas
        kernels) on its batch shard; there are no cross-device collectives
        because every stage is batch-parallel.  One compiled program per
        (max_steps, lite), cached; `lite` returns only the wire outputs
        (wav_wire, n_samples) so nothing larger is materialized."""
        key = (max_steps, lite)
        if key not in self._sm_cache:
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map
            from jax.sharding import PartitionSpec as P

            def local(variables, ids, rng):
                rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
                out = self._synthesize_fn(variables, ids, rng, max_steps)
                if lite:
                    return {k: out[k] for k in ("wav_wire", "n_samples")}
                return out

            # check_vma=False (check_rep in older jax): the decoder scan
            # carries are shard-varying, which the static replication
            # checker cannot express.
            try:
                wrapped = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(), P("data"), P()),
                    out_specs=P("data"), check_vma=False,
                )
            except TypeError:
                wrapped = shard_map(
                    local, mesh=self.mesh,
                    in_specs=(P(), P("data"), P()),
                    out_specs=P("data"), check_rep=False,
                )
            self._sm_cache[key] = jax.jit(wrapped)
        return self._sm_cache[key](variables, char_ids, rng)

    def _mesh_lite_program(self, variables, char_ids, rng, max_steps: int):
        """Mesh serving program returning only the wire outputs (wav_wire,
        n_samples) — the f32 waveform, spectra, and alignments are dead code
        XLA eliminates, instead of device allocations per streamed batch."""
        if self.partition == "shard_map":
            return self._shard_map_program(
                variables, char_ids, rng, max_steps, lite=True
            )
        if self._lite_jit is None:
            self._lite_jit = jax.jit(
                lambda v, i, r, max_steps: {
                    k: self._synthesize_fn(v, i, r, max_steps)[k]
                    for k in ("wav_wire", "n_samples")
                },
                static_argnames=("max_steps",),
            )
        return self._lite_jit(variables, char_ids, rng, max_steps=max_steps)

    def _resolve_decoder_impl(self) -> str:
        """Resolve the AR decoder implementation for this Synthesizer.

        "auto": the fused Pallas whole-scan kernel on TPU for the exact
        topology it implements (Bahdanau attention, 2-layer prenet, 2
        decoder GRUs — pallas_decoder.supports_arch); the XLA scan on
        other backends, other topologies, and under multi-device GSPMD
        partitioning (which cannot shard opaque custom calls)."""
        from sstts.ops.pallas_decoder import DECODER_IMPL, supports_arch

        impl = self.cfg.inference.decoder_impl or DECODER_IMPL
        if impl not in ("auto", "xla", "fused"):
            raise ValueError(
                f"unknown decoder_impl {impl!r}; expected 'auto', 'xla', "
                "'fused'"
            )
        if impl == "fused" and not supports_arch(self.cfg.arch):
            raise ValueError(
                "decoder_impl='fused' implements only Bahdanau attention "
                "with a 2-layer prenet and 2 decoder GRUs; this config "
                "needs the XLA scan"
            )
        if impl == "auto":
            if self._gspmd_multidev or not supports_arch(self.cfg.arch):
                return "xla"
            return "fused" if jax.default_backend() == "tpu" else "xla"
        return impl

    # The jitted pipeline -------------------------------------------------- #

    def _prepare_fn(
        self, variables, char_ids: jnp.ndarray, rng, max_steps: int
    ) -> Dict[str, jnp.ndarray]:
        """Text ids -> masked normalized linear spectrogram (+ metadata)."""
        cfg = self.cfg
        memory, mmask = self.model.apply(
            variables, char_ids, False, method=Tacotron.encode,
            rngs={"dropout": rng},
        )
        use_fused = self._decoder_impl == "fused"
        if use_fused:
            # Per-shape VMEM gate: the kernel keeps weights + memory/keys
            # + the (B, T, A) attention temporary on-core; workloads past
            # ~3/4 of a v5e core's 16 MiB VMEM fall back to the XLA scan
            # for this shape bucket.
            from sstts.ops.pallas_decoder import (
                FUSED_VMEM_BUDGET,
                vmem_estimate_bytes,
            )

            B, T, Dm = memory.shape
            est = vmem_estimate_bytes(
                B, T, Dm, cfg.arch.attention_units, self._decoder_param_count
            )
            use_fused = est <= FUSED_VMEM_BUDGET
        if use_fused:
            from sstts.ops.pallas_decoder import fused_decode

            dec = fused_decode(
                variables["params"]["decoder_cell"], memory, mmask,
                max_steps,
                n_mels=cfg.dataset.n_mels,
                reduction=cfg.arch.reduction_factor,
                stop_threshold=cfg.inference.stop_threshold,
                min_steps=cfg.inference.min_decoder_steps,
                dropout_rate=cfg.arch.prenet_dropout,
                apply_dropout=cfg.arch.prenet_dropout_at_inference,
                seed=jax.random.randint(rng, (), 0, 2**31 - 1),
            )
        else:
            dec = self.model.apply(
                variables, memory, mmask, max_steps,
                cfg.inference.stop_threshold,
                cfg.inference.min_decoder_steps,
                method=Tacotron.decode_infer, rngs={"dropout": rng},
            )
        mel = dec["mel"]
        total_frames = mel.shape[1]
        frame_mask = frame_mask_from_lengths(dec["n_frames"], total_frames)
        linear = self.model.apply(
            variables, mel, frame_mask, False, method=Tacotron.postprocess,
        )
        # Silence (= 0 in normalized dB) beyond each utterance's stop frame.
        linear = jnp.where(frame_mask[..., None], linear, 0.0)
        length = (total_frames - 1) * cfg.dataset.hop_len
        return {
            "linear": linear,
            "n_samples": jnp.minimum(dec["n_frames"] * cfg.dataset.hop_len, length),
            "mel": mel,
            "alignments": dec["alignments"],
            "n_frames": dec["n_frames"],
        }

    def _vocode_fn(self, linear: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        """Masked normalized linear spectrogram -> waveform (any batch size)."""
        cfg = self.cfg
        length = (linear.shape[1] - 1) * cfg.dataset.hop_len
        wav = spectrogram_to_wav(linear, cfg, length)
        # Encode the wire format ON DEVICE: PCM16 halves the host transfer
        # vs f32 and is the terminal format anyway (lossless w.r.t. the
        # written WAV); mu-law 8-bit halves it again for link-bound serving.
        if cfg.inference.wire_format == "mulaw8":
            from sstts.dsp.ops import mulaw_encode_u8

            wire = mulaw_encode_u8(wav)
        elif cfg.inference.wire_format == "adpcm4":
            from sstts.dsp.ops import adpcm4_encode_wire

            # ~0.52 B/sample: 4-bit block-adaptive linear-domain DPCM
            # (device-side lax.scan encode; host cumsum decode).
            wire = adpcm4_encode_wire(wav)
        elif cfg.inference.wire_format == "adpcm3":
            from sstts.dsp.ops import adpcm3_encode_wire

            # ~0.39 B/sample: the same DPCM at 3 bits/delta.
            wire = adpcm3_encode_wire(wav)
        elif cfg.inference.wire_format == "adpcm2":
            from sstts.dsp.ops import adpcm2_encode_wire

            # ~0.27 B/sample: 2 bits/delta, mid-rise lattice.
            wire = adpcm2_encode_wire(wav)
        else:
            wire = jnp.round(
                jnp.clip(wav, -1.0, 1.0) * 32767.0
            ).astype(jnp.int16)
        return {"wav": wav, "wav_wire": wire}

    def _synthesize_fn(
        self, variables, char_ids: jnp.ndarray, rng, max_steps: int
    ) -> Dict[str, jnp.ndarray]:
        out = self._prepare_fn(variables, char_ids, rng, max_steps)
        out.update(self._vocode_fn(out["linear"]))
        return out

    # Host-side API -------------------------------------------------------- #

    def _chunk_count(self, batch: int) -> int:
        """Largest divisor of `batch` that is <= cfg.inference.pipeline_chunks.

        Every chunk must have the same static shape (one compiled vocoder
        program); non-divisible requests round down rather than compiling a
        ragged remainder chunk.  Under a mesh the whole batch stays one
        sharded program (chunking is a host-link optimization).
        """
        if self.mesh is not None:
            return 1
        n = max(1, min(self.cfg.inference.pipeline_chunks, batch))
        while batch % n:
            n -= 1
        return n

    def _put_ids(self, ids: np.ndarray):
        if self.mesh is not None:
            from sstts.parallel.mesh import batch_sharding

            return jax.device_put(ids, batch_sharding(self.mesh))
        # Single-device path: hand the NUMPY array straight to the jitted
        # call so the transfer folds into the async dispatch — an eager
        # jnp.asarray here is a BLOCKING relay round-trip per batch on the
        # serving hot path (CLAUDE.md transfer discipline).
        return ids

    def _encode_ids(
        self, texts: Sequence[str], text_bucket: Optional[int]
    ) -> np.ndarray:
        """Texts -> one padded int32 id batch at a bucketed static width.

        Shared by the pipelined and single-program paths so the bucket
        rounding and padding can never diverge between them.  Over-length
        text raises instead of silently compiling a program wider than
        `dataset.max_text_len` (the model never saw such widths in
        training, and an unplanned giant compile hurts on the shared
        remote compile service) — use `synthesize_longform` for documents.
        """
        cfg = self.cfg
        encoded = [
            text_mod.encode(
                t,
                extra_chars=cfg.dataset.extra_chars,
                expand_numbers=cfg.dataset.expand_numbers,
            )
            for t in texts
        ]
        longest = max(len(e) for e in encoded)
        if longest > cfg.dataset.max_text_len:
            raise ValueError(
                f"encoded text length {longest} exceeds dataset.max_text_len"
                f"={cfg.dataset.max_text_len}; split the input "
                "(synthesize_longform) or raise the limit"
            )
        if text_bucket is not None and longest > text_bucket:
            raise ValueError(
                f"explicit text_bucket={text_bucket} is smaller than the "
                f"longest encoded text ({longest})"
            )
        bucket = text_bucket or min(
            _round_up(longest, 32), cfg.dataset.max_text_len
        )
        ids = np.zeros((len(texts), bucket), np.int32)
        for i, e in enumerate(encoded):
            ids[i, : len(e)] = e
        return ids

    def _dispatch(
        self,
        texts: Sequence[str],
        max_steps: Optional[int] = None,
        text_bucket: Optional[int] = None,
    ) -> Tuple[List[jnp.ndarray], jnp.ndarray]:
        """Launch the pipelined programs for one batch; return device handles.

        One prepare program (encoder + AR decoder + post-CBHG, full batch —
        the decoder scan is latency-bound, so it must NOT be chunked), then
        `pipeline_chunks` Griffin-Lim programs.  All dispatches are
        asynchronous; nothing is fetched here.
        """
        cfg = self.cfg
        max_steps = max_steps or cfg.inference.max_decoder_steps
        ids = self._encode_ids(texts, text_bucket)
        self._rng, rng = jax.random.split(self._rng)
        if self.mesh is not None:
            # One partitioned program over the mesh; chunked fetch is a
            # single-host-link optimization and does not apply.
            out = self._mesh_lite_program(
                self.variables, self._put_ids(ids), rng, max_steps
            )
            return [out["wav_wire"]], out["n_samples"]
        prep = self._prepare(
            self.variables, self._put_ids(ids), rng, max_steps=max_steps
        )
        n_chunks = self._chunk_count(len(texts))
        size = len(texts) // n_chunks
        outs = [
            self._vocode_chunk(prep["linear"], i * size, size=size)
            for i in range(n_chunks)
        ]
        return outs, prep["n_samples"]

    def _decode_wire(self, wire: np.ndarray) -> np.ndarray:
        """Full-width wire rows -> float32 audio rows (one vectorized pass:
        mu-law via a 256-LUT gather, adpcm4 via one batched cumsum).  Kept
        separate from the per-row slicing so the stream path can run it in
        the fetch thread pool — on multi-core serving hosts the decode then
        overlaps the next batch's compute instead of serializing at yield
        time."""
        if self.cfg.inference.wire_format == "mulaw8":
            from sstts.dsp.ops import mulaw_decode_host

            return mulaw_decode_host(wire)
        if self.cfg.inference.wire_format == "adpcm4":
            from sstts.dsp.ops import adpcm4_decode_host_rows

            return adpcm4_decode_host_rows(wire)
        if self.cfg.inference.wire_format == "adpcm3":
            from sstts.dsp.ops import adpcm3_decode_host_rows

            return adpcm3_decode_host_rows(wire)
        if self.cfg.inference.wire_format == "adpcm2":
            from sstts.dsp.ops import adpcm2_decode_host_rows

            return adpcm2_decode_host_rows(wire)
        return wire.astype(np.float32) * (1.0 / 32767.0)

    def _fetch_decoded(self, out) -> np.ndarray:
        """Device wire chunk -> decoded float32 rows (runs in fetch threads;
        numpy decode releases the GIL)."""
        return self._decode_wire(jax.device_get(out))

    @staticmethod
    def _slice_rows(dec: np.ndarray, n_samples: np.ndarray) -> List[np.ndarray]:
        return [dec[i, : int(n_samples[i])] for i in range(dec.shape[0])]

    def _trim(self, wire: np.ndarray, n_samples: np.ndarray) -> List[np.ndarray]:
        return self._slice_rows(self._decode_wire(wire), n_samples)

    def synthesize_stream(
        self,
        batches,
        max_steps: Optional[int] = None,
        text_bucket: Optional[int] = None,
        depth: int = 2,
    ):
        """Stream batches at steady-state throughput (serving pipeline).

        Yields one `List[np.ndarray]` of waveforms per input batch.  Up to
        `depth` batches are in flight: while batch i's PCM16 chunks drain
        over the host link, batch i+1's programs already execute — at the
        headline workload the link is the floor (~40 MiB/s aggregate,
        `scripts/profile_gl_parts.py`), so steady-state throughput reaches
        the link ceiling instead of paying compute + fetch per call.
        Batches should share one (batch, text bucket, max_steps) shape to
        reuse a single compiled program set.
        """
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max(1, self.cfg.inference.fetch_threads))
        pending = deque()
        try:
            for texts in batches:
                outs, n_samples = self._dispatch(texts, max_steps, text_bucket)
                pending.append(
                    (
                        # fetch + wire-decode together in the pool: decode is
                        # pure numpy (GIL-released) and overlaps later
                        # batches' compute on multi-core hosts.
                        [pool.submit(self._fetch_decoded, o) for o in outs],
                        pool.submit(jax.device_get, n_samples),
                    )
                )
                if len(pending) > depth:
                    futs, nfut = pending.popleft()
                    yield self._slice_rows(
                        np.concatenate([f.result() for f in futs], 0),
                        nfut.result(),
                    )
            while pending:
                futs, nfut = pending.popleft()
                yield self._slice_rows(
                    np.concatenate([f.result() for f in futs], 0), nfut.result()
                )
        finally:
            # cancel_futures: an abandoned generator must not keep pulling
            # megabytes of queued PCM over the constrained host link.
            pool.shutdown(wait=False, cancel_futures=True)

    def synthesize_batch(
        self,
        texts: Sequence[str],
        max_steps: Optional[int] = None,
        text_bucket: Optional[int] = None,
        full_output: bool = False,
        fetch: Optional[Sequence[str]] = None,
    ) -> List[np.ndarray] | Tuple[List[np.ndarray], Dict[str, np.ndarray]]:
        """Texts -> list of float32 waveforms (trimmed to each stop token).

        `fetch` (full_output only): restrict the host transfer to these
        output keys — must include "wav" and "n_samples".  The full dict
        holds the large linear/mel spectrograms and alignments; over a
        constrained host link, fetch only what you consume.
        """
        cfg = self.cfg
        if not full_output and self._chunk_count(len(texts)) > 1:
            # Pipelined path: fetching finished Griffin-Lim chunks from
            # several threads overlaps the host transfer with the compute of
            # later chunks AND multiplexes the per-stream-limited relay link
            # (measured 605 -> 360 ms on the b=32 headline workload).
            from concurrent.futures import ThreadPoolExecutor

            outs, n_samples = self._dispatch(texts, max_steps, text_bucket)
            with ThreadPoolExecutor(cfg.inference.fetch_threads) as ex:
                host = list(ex.map(self._fetch_decoded, outs))
            return self._slice_rows(
                np.concatenate(host, axis=0), jax.device_get(n_samples)
            )
        max_steps = max_steps or cfg.inference.max_decoder_steps
        ids = self._encode_ids(texts, text_bucket)
        self._rng, rng = jax.random.split(self._rng)
        if self.mesh is not None and not full_output:
            out = self._mesh_lite_program(
                self.variables, self._put_ids(ids), rng, max_steps
            )
        else:
            out = self._program(
                self.variables, self._put_ids(ids), rng, max_steps=max_steps
            )
        if not full_output:
            # Only the PCM16 waveform crosses the device boundary (the
            # linear/mel tensors are an order of magnitude larger, and f32
            # audio would be 2x the bytes for no fidelity gain: the terminal
            # format is PCM16).
            out = jax.device_get(
                {k: out[k] for k in ("wav_wire", "n_samples")}
            )
            return self._trim(out["wav_wire"], out["n_samples"])
        if fetch is not None:
            missing = {"wav", "n_samples"} - set(fetch)
            if missing:
                raise ValueError(f"fetch must include {sorted(missing)}")
            out = {k: out[k] for k in fetch}
        out = jax.device_get(out)
        wavs = [
            np.asarray(out["wav"][i, : int(out["n_samples"][i])])
            for i in range(len(texts))
        ]
        return wavs, out

    def synthesize(self, text: str, **kw) -> np.ndarray:
        return self.synthesize_batch([text], **kw)[0]

    def synthesize_longform(
        self,
        text: str,
        max_chars: Optional[int] = None,
        gap_ms: float = 120.0,
        fade_ms: float = 5.0,
        **kw,
    ) -> np.ndarray:
        """Paragraph/document -> one waveform (past the model's text limit).

        The text splits into sentence-grouped chunks of at most `max_chars`
        normalized characters (default: the dataset's max_text_len), the
        chunks synthesize as ONE padded batch (a single compiled program),
        and the per-chunk waveforms join with a `gap_ms` pause and short
        `fade_ms` edge ramps (click-free joins).  The reference's only
        long-input strategy was more decoder steps (SURVEY.md §5.7); this
        covers inputs beyond any single decode's length budget.
        """
        from sstts.data.text import split_sentences

        if kw.get("full_output"):
            raise ValueError(
                "full_output is not supported for synthesize_longform "
                "(chunks are joined into one waveform; per-chunk tensors "
                "have no document-level alignment)"
            )
        ds = self.cfg.dataset
        if max_chars is None:
            max_chars = ds.max_text_len - 1  # room for EOS
        chunks = split_sentences(
            text, max_chars, ds.extra_chars, ds.expand_numbers
        )
        if not chunks:
            return np.zeros(0, np.float32)
        # Bucket the batch dimension (next power of two; under a mesh,
        # rounded up to a multiple of the data-axis size so the P("data")
        # batch sharding divides even for non-power-of-two meshes) — every
        # distinct chunk count would otherwise compile a fresh
        # whole-pipeline program.
        n = len(chunks)
        bucket = 1 << (n - 1).bit_length()
        if self.mesh is not None:
            bucket = _round_up(bucket, self.mesh.shape["data"])
        wavs = self.synthesize_batch(chunks + [""] * (bucket - n), **kw)[:n]
        gap = np.zeros(int(ds.sample_rate * gap_ms / 1000.0), np.float32)
        fade = int(ds.sample_rate * fade_ms / 1000.0)
        parts: List[np.ndarray] = []
        for i, w in enumerate(wavs):
            w = np.asarray(w, np.float32).copy()
            n = min(fade, len(w) // 2)
            if n > 0:
                w[:n] *= np.linspace(0.0, 1.0, n, dtype=np.float32)
                w[-n:] *= np.linspace(1.0, 0.0, n, dtype=np.float32)
            parts.append(w)
            if i + 1 < len(wavs):
                parts.append(gap)
        return np.concatenate(parts)

    def to_file(self, text: str, path: str | Path, **kw) -> Path:
        wav = self.synthesize(text, **kw)
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        wav_mod.save_wav(path, wav, self.cfg.dataset.sample_rate)
        return path


def synthesize(
    text: str,
    cfg: Config,
    params: Any,
    batch_stats: Any,
    **kw,
) -> np.ndarray:
    """One-shot public API: text -> waveform (reference `inference.py`)."""
    return Synthesizer(cfg, params, batch_stats).synthesize(text, **kw)
