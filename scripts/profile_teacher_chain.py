"""Chained A/B of the teacher-forced decoder scan: fused Pallas vs XLA.

Same technique as profile_decoder_chain.py: K data-dependent applications
inside ONE jit call, empty-program baseline subtracted — in-program cost,
immune to the relay's per-call dispatch floor.  Measures both the forward
(decode_teacher) and the training-relevant forward+backward (grad of a
scalar loss through the scan; the fused path's backward rematerializes
through the XLA oracle, so its bwd leg should cost ~an XLA fwd+bwd).

Usage: timeout 1500 python scripts/profile_teacher_chain.py [K]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from scripts._common import timed  # noqa: E402

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 8


def main() -> None:
    from sstts.config import Config
    from sstts.model.tacotron import Tacotron
    from sstts.train import create_state

    cfg = Config()
    a = cfg.arch
    state = create_state(cfg)
    B, L, T_frames = 32, 128, 400  # config-3 shapes (S = 200 at r=2)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(
        np.where(rng.random((B, L)) < 0.9, rng.integers(1, 30, (B, L)), 0),
        jnp.int32,
    )
    mel_gt = jnp.asarray(
        rng.standard_normal((B, T_frames, cfg.dataset.n_mels)), jnp.float32
    )
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    model_x = Tacotron(a, cfg.dataset, teacher_backend="xla")
    model_f = Tacotron(a, cfg.dataset, teacher_backend="fused")
    encode = jax.jit(
        lambda v, i, r: model_x.apply(
            v, i, False, method=Tacotron.encode, rngs={"dropout": r}
        )
    )
    memory, mmask = encode(variables, ids, jax.random.PRNGKey(0))
    memory = jax.block_until_ready(memory)
    key = jax.random.PRNGKey(1)

    def fwd_once(model):
        def once(m, r):
            mel, stops, align = model.apply(
                variables, m, mmask, mel_gt, True,
                method=Tacotron.decode_teacher, rngs={"dropout": r},
            )
            return jnp.sum(mel)
        return once

    def grad_once(model):
        def loss(params, m, r):
            mel, stops, align = model.apply(
                {**variables, "params": params}, m, mmask, mel_gt, True,
                method=Tacotron.decode_teacher, rngs={"dropout": r},
            )
            return jnp.mean(jnp.abs(mel - mel_gt)) + jnp.mean(stops**2)
        g = jax.grad(loss)

        def once(m, r):
            grads = g(variables["params"], m, r)
            return sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(grads))
        return once

    def chain(once):
        def f(m, r):
            acc = jnp.float32(0.0)
            for i in range(K):
                s = once(m, jax.random.fold_in(r, i)).astype(jnp.float32)
                acc = acc + s
                m = m + (s * 1e-12).astype(m.dtype)
            return acc
        return jax.jit(f)

    t_base = timed("baseline", jax.jit(lambda m, r: jnp.sum(m) * 2.0),
                   memory, key)
    res = {}
    for tag, once in (
        ("fwd xla", fwd_once(model_x)),
        ("fwd fused", fwd_once(model_f)),
        ("grad xla", grad_once(model_x)),
        ("grad fused", grad_once(model_f)),
    ):
        t = timed(f"{tag} x{K}", chain(once), memory, key)
        res[tag] = (t - t_base) / K

    print(f"\nper-application in-program (b={B}, S={T_frames // a.reduction_factor}):")
    for tag, ms in res.items():
        print(f"  {tag:10s} {ms:7.2f} ms")


if __name__ == "__main__":
    main()
