"""Fused Pallas AR decoder vs the XLA `nn.scan` oracle (interpret mode).

SURVEY.md §7 "Autoregressive scan with attention": the fused kernel must
reproduce the scan's stop-token mask accumulation, carry freeze, and
min-step gating exactly.  Dropout is disabled for parity (the kernel uses
the on-core PRNG — a different stream by design); matmuls run f32 here so
the comparison is exact rather than bf16-tolerance.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sstts.config import tiny_config
from sstts.model.tacotron import Tacotron
from sstts.ops.pallas_decoder import fused_decode


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    arch = dataclasses.replace(cfg.arch, prenet_dropout_at_inference=False)
    model = Tacotron(arch, cfg.dataset)
    rng = jax.random.PRNGKey(0)
    ids = jnp.asarray(
        [[5, 9, 3, 7, 2, 0, 0, 0], [4, 4, 8, 0, 0, 0, 0, 0], [6, 1, 2, 3, 4, 5, 6, 7]],
        jnp.int32,
    )
    mel = jnp.zeros((3, 8, cfg.dataset.n_mels), jnp.float32)
    variables = model.init({"params": rng, "dropout": rng}, ids, mel, None, train=True)
    memory, mmask = model.apply(
        variables, ids, False, method=Tacotron.encode,
        rngs={"dropout": rng},
    )
    return cfg, arch, model, variables, memory, mmask


def _run_both(setup, stop_threshold, min_steps, max_steps=7):
    cfg, arch, model, variables, memory, mmask = setup
    ref = model.apply(
        variables, memory, mmask, max_steps, stop_threshold, min_steps,
        method=Tacotron.decode_infer, rngs={"dropout": jax.random.PRNGKey(1)},
    )
    got = fused_decode(
        variables["params"]["decoder_cell"], memory, mmask, max_steps,
        n_mels=cfg.dataset.n_mels, reduction=arch.reduction_factor,
        stop_threshold=stop_threshold, min_steps=min_steps,
        apply_dropout=False, matmul_dtype=jnp.float32, interpret=True,
    )
    return ref, got


@pytest.mark.parametrize(
    "stop_threshold,min_steps",
    [(1.5, 2), (0.0, 3)],  # never stop / stop exactly at min_steps
)
def test_fused_decode_matches_xla_scan(setup, stop_threshold, min_steps):
    ref, got = _run_both(setup, stop_threshold, min_steps)
    np.testing.assert_array_equal(
        np.asarray(ref["n_frames"]), np.asarray(got["n_frames"])
    )
    for key, atol in (
        ("mel", 2e-4),
        ("stop_logits", 2e-4),
        ("alignments", 2e-5),
    ):
        np.testing.assert_allclose(
            np.asarray(got[key], np.float32),
            np.asarray(ref[key], np.float32),
            atol=atol,
            err_msg=key,
        )


def test_unsupported_arch_is_rejected(setup):
    """Topologies the kernel does not implement must never silently run:
    supports_arch gates auto-selection, and weights_from_tree raises on a
    param tree with extra layers (they would otherwise be dropped)."""
    from sstts.ops.pallas_decoder import supports_arch, weights_from_tree

    cfg, arch, model, variables, memory, mmask = setup
    assert supports_arch(arch)
    assert not supports_arch(
        dataclasses.replace(arch, decoder_gru_layers=3)
    )
    assert not supports_arch(
        dataclasses.replace(arch, attention_type="local_luong")
    )
    assert not supports_arch(
        dataclasses.replace(arch, prenet_units=(32, 16, 8))
    )

    deep = Tacotron(
        dataclasses.replace(arch, decoder_gru_layers=3), cfg.dataset
    )
    rng = jax.random.PRNGKey(0)
    ids = jnp.ones((2, 8), jnp.int32)
    mel = jnp.zeros((2, 8, cfg.dataset.n_mels), jnp.float32)
    deep_vars = deep.init(
        {"params": rng, "dropout": rng}, ids, mel, None, train=True
    )
    with pytest.raises(ValueError, match="extra layers"):
        weights_from_tree(deep_vars["params"]["decoder_cell"])


def _teacher_both(setup, train=True):
    cfg, arch, model, variables, memory, mmask = setup
    rng = jax.random.PRNGKey(3)
    mel_gt = jax.random.normal(
        jax.random.PRNGKey(4), (3, 8, cfg.dataset.n_mels), jnp.float32
    )

    def run(backend):
        m = Tacotron(arch, cfg.dataset, teacher_backend=backend)
        return m.apply(
            variables, memory, mmask, mel_gt, train,
            method=Tacotron.decode_teacher, rngs={"dropout": rng},
        )

    return run("xla"), run("fused")


def test_fused_teacher_scan_matches_xla_scan(setup):
    """Teacher-forced whole-scan kernel vs the nn.scan path: same params,
    same dropout stream (the prenet runs before the dispatch), f32
    interpret mode off-TPU -> near-exact."""
    (mel_r, stop_r, align_r), (mel_g, stop_g, align_g) = _teacher_both(setup)
    np.testing.assert_allclose(
        np.asarray(mel_g), np.asarray(mel_r), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(stop_g), np.asarray(stop_r), atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(align_g), np.asarray(align_r), atol=2e-5
    )


def test_fused_teacher_scan_gradients_match(setup):
    """The custom-VJP backward (XLA rematerialization) must produce the
    same parameter gradients as differentiating the nn.scan path."""
    cfg, arch, model, variables, memory, mmask = setup
    rng = jax.random.PRNGKey(3)
    mel_gt = jax.random.normal(
        jax.random.PRNGKey(4), (3, 8, cfg.dataset.n_mels), jnp.float32
    )

    def loss(params, backend):
        m = Tacotron(arch, cfg.dataset, teacher_backend=backend)
        mel, stops, align = m.apply(
            {**variables, "params": params}, memory, mmask, mel_gt, False,
            method=Tacotron.decode_teacher, rngs={"dropout": rng},
        )
        return (
            jnp.mean(jnp.abs(mel - mel_gt))
            + jnp.mean(stops**2)
            + jnp.mean(align**2)
        )

    g_ref = jax.grad(lambda p: loss(p, "xla"))(variables["params"])
    g_fus = jax.grad(lambda p: loss(p, "fused"))(variables["params"])
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_f = jax.tree.leaves(g_fus)
    assert len(flat_r) == len(flat_f)
    for (path, r), f in zip(flat_r, flat_f):
        np.testing.assert_allclose(
            np.asarray(f), np.asarray(r), atol=5e-4, rtol=1e-3,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_decode_respects_stop_threshold_midway(setup):
    """A mid-range threshold with untrained params stops different rows at
    different steps; frame counts and the post-stop silence must agree."""
    ref, got = _run_both(setup, 0.5, 1, max_steps=6)
    np.testing.assert_array_equal(
        np.asarray(ref["n_frames"]), np.asarray(got["n_frames"])
    )
    r_mel = np.asarray(ref["mel"])
    g_mel = np.asarray(got["mel"])
    n = np.asarray(got["n_frames"])
    for b in range(r_mel.shape[0]):
        # Emitted region matches; the region beyond n_frames is silence.
        np.testing.assert_allclose(
            g_mel[b, : n[b]], r_mel[b, : n[b]], atol=2e-4
        )
        assert np.abs(g_mel[b, n[b] :]).max(initial=0.0) == 0.0
