"""Model tests (SURVEY.md §4): shape/mask invariance, scan-vs-loop
equivalence, stop-token masking, gradient health."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sstts.config import tiny_config
from sstts.model import Tacotron, tacotron_loss
from sstts.model.decoder import DecoderCell, teacher_inputs
from sstts.model.losses import frame_mask_from_lengths, stop_targets
from sstts.model.rnn import GRUCell, UnidirectionalGRU


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    # Deterministic inference for invariance/equivalence tests.
    cfg = cfg.replace(
        arch=dataclasses.replace(cfg.arch, prenet_dropout_at_inference=False)
    )
    model = Tacotron(cfg.arch, cfg.dataset)
    rng = jax.random.PRNGKey(0)
    B, L, F = 2, 16, 16
    ids = np.zeros((B, L), np.int32)
    ids[0, :7] = [2, 3, 4, 5, 6, 7, 1]
    ids[1, :4] = [9, 10, 11, 1]
    ids = jnp.asarray(ids)
    mel = jax.random.uniform(jax.random.PRNGKey(1), (B, F, cfg.dataset.n_mels))
    variables = model.init(
        {"params": rng, "dropout": rng}, ids, mel,
        frame_mask_from_lengths(jnp.array([F, F]), F), train=True,
    )
    return cfg, model, variables, ids, mel


def test_forward_shapes(setup):
    cfg, model, variables, ids, mel = setup
    out = model.apply(variables, ids, mel, None, train=False)
    B, F = mel.shape[:2]
    assert out["mel"].shape == (B, F, cfg.dataset.n_mels)
    assert out["linear"].shape == (B, F, cfg.dataset.n_linear)
    assert out["stop_logits"].shape == (B, F)
    S = F // cfg.arch.reduction_factor
    assert out["alignments"].shape == (B, S, ids.shape[1])
    # Alignments are a distribution over valid encoder positions.
    sums = np.asarray(out["alignments"].sum(-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)
    # No attention mass on padded positions.
    mass_on_pad = np.asarray(out["alignments"][:, :, 8:]).max()
    assert mass_on_pad < 1e-6


def test_padded_batch_invariance(setup):
    """A padded batch must produce the same per-example outputs as batch=1."""
    cfg, model, variables, ids, mel = setup
    out_batch = model.apply(variables, ids, mel, None, train=False)
    for b in range(2):
        out_single = model.apply(variables, ids[b : b + 1], mel[b : b + 1], None, train=False)
        np.testing.assert_allclose(
            np.asarray(out_single["mel"][0]),
            np.asarray(out_batch["mel"][b]),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out_single["linear"][0]),
            np.asarray(out_batch["linear"][b]),
            atol=1e-5,
        )


def test_text_padding_invariance(setup):
    """Extending text padding must not change outputs (mask correctness)."""
    cfg, model, variables, ids, mel = setup
    wide = jnp.pad(ids, ((0, 0), (0, 16)))
    out = model.apply(variables, ids, mel, None, train=False)
    out_wide = model.apply(variables, wide, mel, None, train=False)
    np.testing.assert_allclose(
        np.asarray(out_wide["mel"]), np.asarray(out["mel"]), atol=1e-5
    )


def test_gru_scan_matches_python_loop(setup):
    """lax.scan GRU == step-by-step cell application (SURVEY.md §4)."""
    rng = jax.random.PRNGKey(3)
    B, T, D, H = 2, 5, 4, 6
    xs = jax.random.normal(rng, (B, T, D))
    gru = UnidirectionalGRU(H)
    vs = gru.init(rng, xs)
    ys = gru.apply(vs, xs)
    # The sequence GRU and the per-step cell share one parameter layout.
    cell = GRUCell(H)
    cell_vs = {"params": vs["params"]}
    h = jnp.zeros((B, H))
    for t in range(T):
        h, out = cell.apply(cell_vs, h, (xs[:, t], None))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ys[:, t]), atol=1e-6)


def test_gru_pallas_backend_matches_xla(setup):
    """Pallas fused-sequence kernel (interpret mode) == lax.scan backend."""
    from sstts.ops import pallas_gru as pg

    rng = np.random.default_rng(5)
    B, T, D, H = 3, 9, 8, 8
    xs = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    wx = jnp.asarray(rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.3)
    wh = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((3 * H,)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, T)) > 0.25).astype(np.float32))
    for rev in (False, True):
        for m in (None, mask):
            want = np.asarray(pg.gru_sequence_xla(xs, wx, wh, b, m, reverse=rev))
            got = np.asarray(
                pg.gru_sequence(xs, wx, wh, b, m, reverse=rev, interpret=True)
            )
            np.testing.assert_allclose(got, want, atol=1e-6)


def test_gru_pallas_ad_wrapper_grads_match_xla(setup):
    """gru_sequence_ad: Pallas forward (interpret mode) + XLA-remat backward
    must produce the XLA scan's gradients."""
    from sstts.ops import pallas_gru as pg

    rng = np.random.default_rng(7)
    B, T, D, H = 2, 6, 8, 8
    xs = jnp.asarray(rng.standard_normal((B, T, D)).astype(np.float32))
    wx = jnp.asarray(rng.standard_normal((D, 3 * H)).astype(np.float32) * 0.3)
    wh = jnp.asarray(rng.standard_normal((H, 3 * H)).astype(np.float32) * 0.3)
    b = jnp.asarray(rng.standard_normal((3 * H,)).astype(np.float32) * 0.1)
    mask = jnp.asarray((rng.random((B, T)) > 0.25).astype(np.float32))
    for m in (None, mask):
        fwd = pg.gru_sequence_ad(xs, wx, wh, b, m, False, True)
        np.testing.assert_allclose(
            np.asarray(fwd),
            np.asarray(pg.gru_sequence_xla(xs, wx, wh, b, m)),
            atol=1e-6,
        )
        g_ad = jax.grad(
            lambda wx, wh: jnp.sum(
                pg.gru_sequence_ad(xs, wx, wh, b, m, False, True) ** 2
            ),
            argnums=(0, 1),
        )(wx, wh)
        g_ref = jax.grad(
            lambda wx, wh: jnp.sum(
                pg.gru_sequence_xla(xs, wx, wh, b, m) ** 2
            ),
            argnums=(0, 1),
        )(wx, wh)
        for a, r in zip(g_ad, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(r), atol=1e-5
            )


def test_decoder_scan_matches_python_loop(setup):
    cfg, model, variables, ids, mel = setup
    memory, mmask = model.apply(variables, ids, train=False, method=Tacotron.encode)
    mel_pred, stops, aligns = model.apply(
        variables, memory, mmask, mel, train=False, method=Tacotron.decode_teacher
    )
    # Re-run the same computation with a hand-written Python loop over the cell.
    cell = DecoderCell(cfg.arch, cfg.dataset.n_mels)
    cell_vs = {"params": variables["params"]["decoder_cell"]}
    r = cfg.arch.reduction_factor
    inputs = teacher_inputs(mel, r)
    keys = cell.apply(cell_vs, memory, method=DecoderCell.init_keys)
    carry = cell.apply(
        cell_vs, memory.shape[0], memory.shape[1], memory.shape[-1],
        method=DecoderCell.init_carry,
    )
    outs = []
    for s in range(inputs.shape[1]):
        carry, out = cell.apply(
            cell_vs, carry, inputs[:, s], memory, keys, mmask, False
        )
        outs.append(out.mel)
    loop_mel = jnp.concatenate(outs, axis=1).reshape(mel_pred.shape)
    np.testing.assert_allclose(np.asarray(loop_mel), np.asarray(mel_pred), atol=1e-5)


def test_infer_stops_at_min_steps_when_threshold_zero(setup):
    cfg, model, variables, ids, mel = setup
    memory, mmask = model.apply(variables, ids, train=False, method=Tacotron.encode)
    res = model.apply(
        variables, memory, mmask, 8, 0.0, 3, method=Tacotron.decode_infer
    )
    r = cfg.arch.reduction_factor
    # threshold 0 -> sigmoid(x) > 0 always -> every utterance stops right at
    # min_steps (3), having emitted 3 groups.
    np.testing.assert_array_equal(np.asarray(res["n_frames"]), 3 * r)
    # Frames after the stop are masked to silence.
    assert np.abs(np.asarray(res["mel"][:, 3 * r :, :])).max() == 0.0


def test_infer_runs_to_max_steps_when_threshold_one(setup):
    cfg, model, variables, ids, mel = setup
    memory, mmask = model.apply(variables, ids, train=False, method=Tacotron.encode)
    res = model.apply(
        variables, memory, mmask, 6, 1.1, 1, method=Tacotron.decode_infer
    )
    np.testing.assert_array_equal(
        np.asarray(res["n_frames"]), 6 * cfg.arch.reduction_factor
    )


def test_loss_and_gradients_finite(setup):
    cfg, model, variables, ids, mel = setup
    linear_gt = jax.random.uniform(
        jax.random.PRNGKey(2), (2, mel.shape[1], cfg.dataset.n_linear)
    )
    lengths = jnp.array([16, 12])

    def loss_fn(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            ids, mel, frame_mask_from_lengths(lengths, mel.shape[1]),
            train=True, rngs={"dropout": jax.random.PRNGKey(9)},
            mutable=["batch_stats"],
        )
        loss, metrics = tacotron_loss(
            out, mel, linear_gt, lengths, cfg.arch, cfg.dataset
        )
        return loss, metrics

    (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    # Every parameter receives gradient signal somewhere.
    nonzero = sum(float(np.abs(np.asarray(g)).sum()) > 0 for g in flat)
    assert nonzero / len(flat) > 0.9


def test_fill_rows_contribute_zero_loss(setup):
    """loss_frames == 0 (epoch-tail fill rows) must contribute nothing to
    any loss term — swapping the fill row's outputs/targets for arbitrary
    other values leaves the loss bitwise identical, and the batch loss
    equals the batch-of-one loss over the real row."""
    cfg, _, _, _, _ = setup
    arch = dataclasses.replace(cfg.arch, guided_attention_weight=1.0)
    B, F, k = 2, 16, 10
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    S = F // arch.reduction_factor

    def outputs(key):
        ks = jax.random.split(key, 4)
        return {
            "mel": jax.random.normal(ks[0], (B, F, cfg.dataset.n_mels)),
            "linear": jax.random.normal(ks[1], (B, F, cfg.dataset.n_linear)),
            "stop_logits": jax.random.normal(ks[2], (B, F)),
            "alignments": jax.nn.softmax(
                jax.random.normal(ks[3], (B, S, 8)), axis=-1
            ),
        }

    out = outputs(keys[0])
    mel_gt = jax.random.normal(keys[1], (B, F, cfg.dataset.n_mels))
    lin_gt = jax.random.normal(keys[2], (B, F, cfg.dataset.n_linear))
    frames = jnp.array([k, 0])
    tlen = jnp.array([6, 5])
    loss, _ = tacotron_loss(
        out, mel_gt, lin_gt, frames, arch, cfg.dataset, text_lengths=tlen
    )
    # Replace the fill row's outputs and targets with different values.
    other = outputs(keys[3])
    out2 = {
        key: jnp.concatenate([out[key][:1], other[key][1:]]) for key in out
    }
    mel2 = jnp.concatenate([mel_gt[:1], mel_gt[1:] + 7.0])
    lin2 = jnp.concatenate([lin_gt[:1], lin_gt[1:] - 3.0])
    loss2, _ = tacotron_loss(
        out2, mel2, lin2, frames, arch, cfg.dataset, text_lengths=tlen
    )
    np.testing.assert_array_equal(np.asarray(loss), np.asarray(loss2))
    # And it equals the batch-of-one loss over the real row.
    one = {key: out[key][:1] for key in out}
    loss1, _ = tacotron_loss(
        one, mel_gt[:1], lin_gt[:1], frames[:1], arch, cfg.dataset,
        text_lengths=tlen[:1],
    )
    np.testing.assert_allclose(
        np.asarray(loss), np.asarray(loss1), rtol=1e-6
    )


def test_stop_targets():
    t = stop_targets(jnp.array([3, 5]), 6)
    np.testing.assert_array_equal(
        np.asarray(t), [[0, 0, 1, 1, 1, 1], [0, 0, 0, 0, 1, 1]]
    )


def test_local_luong_attention_variant(setup):
    cfg, _, _, ids, mel = setup
    arch = dataclasses.replace(cfg.arch, attention_type="local_luong")
    model = Tacotron(arch, cfg.dataset)
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, ids, mel, None, train=True)
    out = model.apply(variables, ids, mel, None, train=False)
    assert np.isfinite(np.asarray(out["mel"])).all()
    sums = np.asarray(out["alignments"].sum(-1))
    np.testing.assert_allclose(sums, 1.0, atol=1e-5)


def test_guided_attention_loss():
    from sstts.model.losses import guided_attention_loss

    B, S, T = 2, 6, 10
    # Perfectly diagonal attention -> near-zero penalty; anti-diagonal -> large.
    diag = np.zeros((B, S, T), np.float32)
    anti = np.zeros((B, S, T), np.float32)
    for s in range(S):
        diag[:, s, int(s / S * T)] = 1.0
        anti[:, s, T - 1 - int(s / S * T)] = 1.0
    lens = jnp.full((B,), T, jnp.float32)
    steps = jnp.full((B,), S, jnp.float32)
    l_diag = float(guided_attention_loss(jnp.asarray(diag), lens, steps, 0.2))
    l_anti = float(guided_attention_loss(jnp.asarray(anti), lens, steps, 0.2))
    assert l_diag < 0.1 * l_anti, (l_diag, l_anti)


def test_guided_attention_in_train_step():
    import dataclasses as dc
    from sstts import train as train_mod
    from sstts.config import tiny_config
    from sstts.data import pipeline as pm
    from sstts.data.synthetic import make_utterances

    cfg = tiny_config()
    cfg = cfg.replace(
        dataset=dc.replace(cfg.dataset, dataset="synthetic", sample_rate=8000, mel_fmax=4000.0),
        arch=dc.replace(cfg.arch, guided_attention_weight=1.0),
        training=dc.replace(cfg.training, batch_size=2, text_buckets=(48,), frame_buckets=(96,)),
    )
    utts = make_utterances(8, cfg.dataset, min_words=1, max_words=2)
    b = pm.Batcher(utts, cfg)
    for _, batch in b.epoch(0, 2):
        break
    state = train_mod.create_state(cfg)
    step = train_mod.make_train_step(cfg)
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch))
    assert "loss_attn" in metrics
    assert np.isfinite(float(metrics["loss_attn"]))


def test_fused_conv_bank_matches_unfused():
    """Fused (one wide conv) and unfused (K narrow convs) banks share one
    parameter tree and must produce the same output."""
    from sstts.model.modules import Conv1dBank

    rng = jax.random.PRNGKey(42)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 21, 12))
    mask = jnp.arange(21)[None, :] < jnp.array([21, 13, 5])[:, None]
    for k in (1, 2, 5, 8):
        fused = Conv1dBank(bank_k=k, channels=16, fused=True)
        plain = Conv1dBank(bank_k=k, channels=16, fused=False)
        variables = fused.init(rng, x, mask, train=False)
        # Identical parameter trees (the flag flips on a checkpoint).
        v2 = plain.init(rng, x, mask, train=False)
        assert jax.tree.structure(variables) == jax.tree.structure(v2)
        yf, updf = fused.apply(variables, x, mask, train=True,
                               mutable=["batch_stats"])
        yp, updp = plain.apply(variables, x, mask, train=True,
                               mutable=["batch_stats"])
        np.testing.assert_allclose(yf, yp, atol=2e-5, rtol=2e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, atol=2e-5, rtol=2e-5),
            updf, updp,
        )
        # Eval mode (running stats) too.
        yf = fused.apply(variables, x, mask, train=False)
        yp = plain.apply(variables, x, mask, train=False)
        np.testing.assert_allclose(yf, yp, atol=2e-5, rtol=2e-5)
