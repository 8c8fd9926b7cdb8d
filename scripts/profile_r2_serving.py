"""Serving cost of reduction factor r=2 vs r=5 (round-4 verdict ask #5).

SURVEY §2.4 pins r in {2, 5}.  Training cost at r=2 measured ~equal to
r=5 (the step is features/CBHG-bound — BASELINE.md r=2 probe), but
SERVING doubles+ the AR decoder scan: T frames take T/r sequential steps,
so 800 frames are 160 steps at r=5 and 400 at r=2.  The decoder is a few
percent of the serving pipeline, so the expected headline impact is
small — this measures it instead of assuming.

For each r: chained in-program cost (K data-dependent decodes inside one
jit call, empty baseline subtracted) of the fused Pallas AR decoder and
the XLA scan at b=32, T=800 frames, plus the VMEM-gate verdict that
decides which one `Synthesizer` would actually run.  Weights are random —
decode cost is shape-determined (fixed max_steps, stop pinned off).

Usage: timeout 3600 python scripts/profile_r2_serving.py [K]
"""

from __future__ import annotations

import dataclasses
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4
B, T_FRAMES, L = 32, 800, 128


def main() -> None:
    from sstts.config import Config
    from sstts.model.tacotron import Tacotron
    from sstts.ops.pallas_decoder import (
        FUSED_VMEM_BUDGET,
        fused_decode,
        vmem_estimate_bytes,
    )
    from sstts.train import build_model, create_state

    rng = np.random.default_rng(0)
    ids = np.where(
        rng.random((B, L)) < 0.9, rng.integers(1, 30, (B, L)), 0
    ).astype(np.int32)
    ids[:, 0] = 1

    for r in (5, 2):
        cfg = Config()
        cfg = cfg.replace(
            arch=dataclasses.replace(cfg.arch, reduction_factor=r)
        )
        S = T_FRAMES // r
        state = create_state(cfg)
        model = build_model(cfg)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        memory, mmask = jax.jit(
            lambda v, i, k: model.apply(
                v, i, False, method=Tacotron.encode, rngs={"dropout": k}
            )
        )(variables, jnp.asarray(ids), jax.random.PRNGKey(0))

        est = vmem_estimate_bytes(
            B, memory.shape[1], memory.shape[2], cfg.arch.attention_units,
            sum(
                leaf.size
                for leaf in jax.tree_util.tree_leaves(
                    state.params["decoder_cell"]
                )
            ),
        )
        serves_fused = est <= FUSED_VMEM_BUDGET
        print(
            f"\nr={r}: S={S} steps for {T_FRAMES} frames; fused-kernel VMEM "
            f"estimate {est/2**20:.1f} MiB -> Synthesizer serves "
            f"{'fused' if serves_fused else 'xla_scan'}",
            flush=True,
        )

        t_base = timed(
            f"r={r} baseline", jax.jit(lambda m: jnp.sum(m) * 2.0), memory
        )

        def chain_fused(m):
            acc = jnp.float32(0.0)
            for i in range(K):
                out = fused_decode(
                    state.params["decoder_cell"], m, mmask, S,
                    n_mels=cfg.dataset.n_mels, reduction=r,
                    stop_threshold=2.0, seed=i,
                )
                s = jnp.sum(out["mel"]).astype(jnp.float32)
                acc = acc + s
                m = m + (s * 1e-12).astype(m.dtype)
            return acc

        def chain_xla(m, k):
            acc = jnp.float32(0.0)
            for i in range(K):
                out = model.apply(
                    variables, m, mmask, S, 2.0, 8,
                    method=Tacotron.decode_infer,
                    rngs={"dropout": jax.random.fold_in(k, i)},
                )
                s = jnp.sum(out["mel"]).astype(jnp.float32)
                acc = acc + s
                m = m + (s * 1e-12).astype(m.dtype)
            return acc

        for tag, fn, args in (
            (f"r={r} fused x{K}", jax.jit(chain_fused), (memory,)),
            (
                f"r={r} xla_scan x{K}",
                jax.jit(chain_xla),
                (memory, jax.random.PRNGKey(1)),
            ),
        ):
            t = timed(tag, fn, *args)
            print(f"  {tag}: {(t - t_base) / K:6.2f} ms/decode in-program",
                  flush=True)


if __name__ == "__main__":
    main()
