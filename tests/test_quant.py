"""Int8 frozen-base (W8A8) path: ops/quant.py + the base_quant='int8' model
structure. All CPU-runnable (conftest forces the virtual CPU platform)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from slam_llm_tpu.ops.quant import (
    dequantize_base_params,
    dequantize_int8,
    int8_dot,
    quantize_base_params,
    quantize_int8,
    quantize_int8_np,
)


def _cos(a, b):
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-30))


def test_quantize_roundtrip_error_bounded():
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 48), jnp.float32) * 0.3
    q, s = quantize_int8(w)
    assert q.dtype == jnp.int8 and s.shape == (48,)
    back = dequantize_int8(q, s)
    # symmetric rounding: per-element error <= scale/2 of that column
    err = np.abs(np.asarray(back) - np.asarray(w))
    assert (err <= np.asarray(s)[None, :] * 0.5 + 1e-7).all()


def test_quantize_np_matches_jax():
    w = np.random.default_rng(1).standard_normal((3, 32, 16)).astype(np.float32)
    qj, sj = quantize_int8(jnp.asarray(w))
    qn, sn = quantize_int8_np(w)
    assert (np.asarray(qj) == qn).all()
    np.testing.assert_allclose(np.asarray(sj), sn, rtol=1e-6)
    assert sn.shape == (3, 16)  # stacked kernels keep the layer axis


def test_int8_dot_forward_close_to_f32():
    k = jax.random.PRNGKey(2)
    x = jax.random.normal(k, (8, 33, 128), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(3), (128, 96), jnp.float32) * 0.1
    wq, ws = quantize_int8(w)
    y = int8_dot(x, wq, ws)
    ref = x @ w
    # W8A8 with per-row/per-channel scales: ~1% relative error at these shapes
    rel = np.linalg.norm(np.asarray(y - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel
    assert _cos(y, ref) > 0.999


@pytest.mark.parametrize("bwd", ["int8", "bf16"])
def test_int8_dot_grad_matches_f32(bwd):
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 32), jnp.float32) * 0.2
    wq, ws = quantize_int8(w)
    dy = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 32), jnp.float32)

    g = jax.grad(lambda x: jnp.vdot(int8_dot(x, wq, ws, bwd=bwd), dy))(x)
    g_ref = jax.grad(lambda x: jnp.vdot(x @ w, dy))(x)
    assert _cos(g, g_ref) > 0.995
    # scale cotangent exists (zero); int8 weight cotangent is float0 — just
    # check differentiating w.r.t. x alone works under jit too
    gj = jax.jit(jax.grad(lambda x: jnp.vdot(int8_dot(x, wq, ws, bwd=bwd), dy)))(x)
    assert _cos(gj, g_ref) > 0.995


def test_rowquant_stochastic_rounding_unbiased():
    """SR mode: E[dequant(q)] = x (round-to-nearest zeroes everything under
    scale/2 — the bias that stalled 1.1B LoRA training, QUALITY_INT8.json)."""
    from slam_llm_tpu.ops.kernels.rowquant import rowquant

    rng = np.random.default_rng(0)
    # values well below scale/2: deterministic rounding kills them all
    x = np.full((4, 128), 0.2, np.float32)
    x[:, 0] = 127.0  # sets the scale to 1.0
    q_det, s_det = rowquant(jnp.asarray(x))
    assert (np.asarray(q_det)[:, 1:] == 0).all()  # bias demonstrated

    acc = np.zeros((4, 128))
    n = 400
    for i in range(n):
        q, s = rowquant(jnp.asarray(x), seed=jnp.uint32(i))
        acc += np.asarray(q, np.float64) * np.asarray(s, np.float64)
    mean = acc / n
    # unbiased: mean of dequantized draws approaches x (sem ~ 1/sqrt(400)/2)
    np.testing.assert_allclose(mean[:, 1:], 0.2, atol=0.08)
    np.testing.assert_allclose(mean[:, 0], 127.0, atol=0.2)
    # range safety: SR of the max value must not escape int8
    assert np.asarray(q).max() <= 127 and np.asarray(q).min() >= -127


@pytest.mark.parametrize("bwd", ["int8_sr"])
def test_int8_dot_sr_grad_matches_f32(bwd):
    x = jax.random.normal(jax.random.PRNGKey(4), (4, 16, 64), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(5), (64, 32), jnp.float32) * 0.2
    wq, ws = quantize_int8(w)
    dy = jax.random.normal(jax.random.PRNGKey(6), (4, 16, 32), jnp.float32)

    def loss(x, seed):
        return jnp.vdot(int8_dot(x, wq, ws, bwd=bwd, bwd_seed=seed), dy)

    g = jax.grad(loss)(x, jnp.uint32(3))
    g_ref = jax.grad(lambda x: jnp.vdot(x @ w, dy))(x)
    assert _cos(g, g_ref) > 0.99
    gj = jax.jit(jax.grad(loss))(x, jnp.uint32(3))
    assert _cos(gj, g_ref) > 0.99
    # different seeds -> different rounding draws (stochastic for real)
    g2 = jax.jit(jax.grad(loss))(x, jnp.uint32(4))
    assert np.abs(np.asarray(g2) - np.asarray(gj)).max() > 0


def test_rotate_cols_orthonormal_and_cancels_in_dot():
    """The block-diagonal Hadamard R is orthonormal (norm-preserving) and
    cancels exactly in the rotated contraction: x w^T == (xR)(wR)^T. Also at
    a feature dim NOT divisible by 256 (rot_block falls back to the largest
    dividing power of two)."""
    from slam_llm_tpu.ops.kernels.rowquant import rot_block, rotate_cols

    for f in (512, 192):  # 192 = 2^6 * 3 -> block 64
        x = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (16, f)), np.float32)
        w = np.asarray(jax.random.normal(jax.random.PRNGKey(1), (24, f)), np.float32)
        xr = np.asarray(rotate_cols(jnp.asarray(x)))
        wr = np.asarray(rotate_cols(jnp.asarray(w)))
        np.testing.assert_allclose(
            np.linalg.norm(xr, axis=-1), np.linalg.norm(x, axis=-1), rtol=1e-5
        )
        np.testing.assert_allclose(xr @ wr.T, x @ w.T, rtol=1e-4, atol=1e-3)
    assert rot_block(5632) == 256 and rot_block(192) == 64 and rot_block(2048) == 256


def test_int8_dot_rot_grad_beats_sr_on_outlier_dy():
    """int8_rot's reason to exist: when dy rows carry outliers (the usual
    transformer-gradient shape), the per-row amax scale crushes small entries;
    rotating first spreads the outliers so quantization error drops. Assert
    (a) correctness vs the exact grad, (b) strictly lower error than int8_sr
    on the same outlier-heavy cotangent."""
    from slam_llm_tpu.ops.quant import rotate_quantize_bwd

    K, F, B = 256, 512, 32
    x = jax.random.normal(jax.random.PRNGKey(0), (B, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, F), jnp.float32) * 0.05
    wq, ws = quantize_int8(w)
    wr = rotate_quantize_bwd(dequantize_int8(wq, ws))
    # outlier mask: 8 of 512 output coords dominate each dy row
    m = np.ones((F,), np.float32)
    m[:8] = 300.0
    mask = jnp.asarray(m)

    def loss(xx, bwd, w_rot=None):
        y = int8_dot(xx, wq, ws, bwd=bwd, w_rot=w_rot, bwd_seed=jnp.uint32(7))
        return jnp.sum(y * mask)

    g_exact = np.asarray(jax.grad(lambda v: loss(v, "bf16"))(x), np.float64)
    g_sr = np.asarray(jax.grad(lambda v: loss(v, "int8_sr"))(x), np.float64)
    g_rot = np.asarray(
        jax.jit(jax.grad(lambda v: loss(v, "int8_rot", w_rot=wr)))(x), np.float64
    )
    err_sr = np.linalg.norm(g_sr - g_exact) / np.linalg.norm(g_exact)
    err_rot = np.linalg.norm(g_rot - g_exact) / np.linalg.norm(g_exact)
    assert _cos(g_rot, g_exact) > 0.999
    assert err_rot < 0.5 * err_sr, (err_rot, err_sr)


def test_int8_rot_otf_matches_stored_pair_within_requant_noise():
    """'int8_rot_otf' derives the rotated backward pair from (w_q, w_scale)
    INSIDE the backward — the same fp32 dequant->rotate->quantize chain
    quantize_base_params runs offline for the stored pair. The forward value
    is bit-identical (same fwd dot). The GRADIENT is the same algorithm but
    NOT bit-identical: XLA fuses the in-graph re-derivation differently from
    the eager offline chain (fma/reassociation shifts the rotate dot by ~1
    ulp, flipping round-to-nearest on tie-adjacent entries by ±1 int8 — both
    are valid nearest roundings of matrices equal to within 1 ulp). Assert
    the honest contract: direction preserved, and the re-derivation wobble
    sits BELOW the int8_rot quantization noise floor itself (measured 0.0046
    vs 0.014 rel-L2 against the exact bf16 backward on this case)."""
    from slam_llm_tpu.ops.quant import rotate_quantize_bwd

    K, F, B = 192, 256, 16
    x = jax.random.normal(jax.random.PRNGKey(0), (B, K), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, F), jnp.float32) * 0.05
    wq, ws = quantize_int8(w)
    wr = rotate_quantize_bwd(dequantize_int8(wq, ws))
    m = jnp.asarray(np.linspace(0.1, 30.0, F), jnp.float32)

    def loss(xx, bwd, w_rot=None):
        y = int8_dot(xx, wq, ws, bwd=bwd, w_rot=w_rot, bwd_seed=jnp.uint32(11))
        return jnp.sum(y * m)

    v_rot, g_rot = jax.jit(
        jax.value_and_grad(lambda v: loss(v, "int8_rot", w_rot=wr))
    )(x)
    v_otf, g_otf = jax.jit(
        jax.value_and_grad(lambda v: loss(v, "int8_rot_otf"))
    )(x)
    assert np.array_equal(np.asarray(v_rot), np.asarray(v_otf))
    g_exact = np.asarray(
        jax.jit(jax.grad(lambda v: loss(v, "bf16")))(x), np.float64
    )
    g_rot = np.asarray(g_rot, np.float64)
    g_otf = np.asarray(g_otf, np.float64)
    err_quant = np.linalg.norm(g_rot - g_exact) / np.linalg.norm(g_exact)
    err_rederive = np.linalg.norm(g_otf - g_rot) / np.linalg.norm(g_exact)
    assert _cos(g_otf, g_rot) > 0.99999
    assert err_rederive < err_quant, (err_rederive, err_quant)


def test_int8_rot_otf_model_grads_match_stored_and_drop_the_copy():
    """End to end at module level: the 'int8_rot_otf' model carries NO
    kernel_qr/kernel_scale_r params (that's the point — no second 7B weight
    copy in HBM), and its gradients match the stored-pair 'int8_rot'
    model's to within the re-derivation wobble (see the op-level test for
    why exact bit-identity is not attainable under XLA fusion)."""
    from flax import linen as nn

    model_fp, _ = _tiny_llm("none")
    model_rot, _ = _tiny_llm("int8", base_quant_bwd="int8_rot")
    model_otf, _ = _tiny_llm("int8", base_quant_bwd="int8_rot_otf")
    rng = jax.random.PRNGKey(0)
    ids = jnp.arange(2 * 16, dtype=jnp.int32).reshape(2, 16) % 250
    mask = jnp.ones((2, 16), jnp.int32)
    params = nn.meta.unbox(model_fp.init(rng, ids, mask, method="init_all")["params"])
    q_rot = quantize_base_params(params, bwd="int8_rot")
    q_otf = quantize_base_params(params)  # no rotated pair stored

    leaves_otf = jax.tree_util.tree_leaves_with_path(q_otf)
    assert not any("kernel_qr" in jax.tree_util.keystr(p) for p, _ in leaves_otf)
    bytes_rot = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(q_rot))
    bytes_otf = sum(x.size * x.dtype.itemsize for x in jax.tree_util.tree_leaves(q_otf))
    assert bytes_otf < bytes_rot

    emb = model_fp.apply({"params": params}, ids, method="embed")

    def loss(model, qp, e):
        logits = model.apply(
            {"params": qp}, e, mask, rngs={"quant": jax.random.PRNGKey(7)}
        )
        return jnp.sum(logits * jnp.linspace(0.0, 1.0, logits.shape[-1]))

    g_rot = np.asarray(
        jax.grad(lambda e: loss(model_rot, q_rot, e))(emb), np.float64
    )
    g_otf = np.asarray(
        jax.grad(lambda e: loss(model_otf, q_otf, e))(emb), np.float64
    )
    assert _cos(g_rot.ravel(), g_otf.ravel()) > 0.999
    rel = np.linalg.norm(g_otf - g_rot) / np.linalg.norm(g_rot)
    assert rel < 0.05, rel


def test_rowquant_block_autosizes_to_vmem_envelope():
    """The Pallas rowquant row-block shrinks for wide rows so the per-cell
    scoped-VMEM envelope fits (~16 MB): vicuna-7b's MLP dy (k=11008,
    rotated) overflowed by 1.36M at the default 128-row block. 1.1B bench
    shapes must keep the full block (no throughput regression)."""
    from slam_llm_tpu.ops.kernels.rowquant import _fit_block_m

    # 1.1B shapes: unchanged
    assert _fit_block_m(2048, 128, False) == 128
    assert _fit_block_m(5632, 128, True) == 128
    assert _fit_block_m(8192, 128, False) == 128
    # 7B rotated MLP width: shrinks under the 12 MB working budget
    bm = _fit_block_m(11008, 128, True)
    assert bm < 128 and bm * 11008 * 13 <= 12 * 2**20
    # very wide rows (CE-head vocab dim) shrink too, never below 8
    assert 8 <= _fit_block_m(32000, 128, False) < 128


def test_quantize_base_params_rot_pair_derived_never_trusted():
    """bwd='int8_rot' derives (kernel_qr, kernel_scale_r) from kernel_q —
    and OVERWRITES a stale pair (module.init draws it independently)."""
    from slam_llm_tpu.ops.quant import rotate_quantize_bwd

    w = np.asarray(jax.random.normal(jax.random.PRNGKey(2), (64, 128)), np.float32)
    tree = {"decoder": {"layers": {"q_proj": {"kernel": jnp.asarray(w)}}}}
    qp = quantize_base_params(tree, bwd="int8_rot")["decoder"]["layers"]["q_proj"]
    assert sorted(qp) == ["kernel_q", "kernel_qr", "kernel_scale", "kernel_scale_r"]
    ref_qr, ref_sr = rotate_quantize_bwd(dequantize_int8(qp["kernel_q"], qp["kernel_scale"]))
    assert np.array_equal(np.asarray(qp["kernel_qr"]), np.asarray(ref_qr))
    # stale rot pair present -> recomputed, not trusted
    stale = {
        "decoder": {"layers": {"q_proj": {
            "kernel_q": qp["kernel_q"], "kernel_scale": qp["kernel_scale"],
            "kernel_qr": jnp.zeros_like(qp["kernel_qr"]),
            "kernel_scale_r": jnp.ones_like(qp["kernel_scale_r"]),
        }}}
    }
    qp2 = quantize_base_params(stale, bwd="int8_rot")["decoder"]["layers"]["q_proj"]
    assert np.array_equal(np.asarray(qp2["kernel_qr"]), np.asarray(ref_qr))
    np.testing.assert_allclose(np.asarray(qp2["kernel_scale_r"]), np.asarray(ref_sr))
    # and dequantize_base_params drops the rot pair on the way back
    back = dequantize_base_params({"decoder": {"layers": {"q_proj": dict(qp)}}})
    assert sorted(back["decoder"]["layers"]["q_proj"]) == ["kernel"]


def _tiny_llm(base_quant="none", **kw):
    from slam_llm_tpu.models.llm import CausalLM, LLMConfig

    cfg = dataclasses.replace(
        LLMConfig.tiny_test(),
        lora_rank=4,
        base_quant=base_quant,
        dtype=jnp.float32,  # CPU: keep the comparison noise-free outside quant
        **kw,
    )
    return CausalLM(cfg), cfg


def test_quantized_model_matches_bf16_model_via_transform():
    """init the fp model, quantize its params with the tree transform, and
    check the quantized MODEL (base_quant='int8' structure) produces close
    logits — this exercises structure agreement end to end."""
    model_fp, cfg = _tiny_llm("none")
    model_q, _ = _tiny_llm("int8")
    rng = jax.random.PRNGKey(0)
    ids = jnp.arange(2 * 24, dtype=jnp.int32).reshape(2, 24) % 250
    mask = jnp.ones((2, 24), jnp.int32)
    from flax import linen as nn

    params = nn.meta.unbox(model_fp.init(rng, ids, mask, method="init_all")["params"])
    qparams = quantize_base_params(params)

    # structure must match what the quant model itself initializes
    qinit = nn.meta.unbox(model_q.init(rng, ids, mask, method="init_all")["params"])
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, qparams)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, qinit))

    emb = model_fp.apply({"params": params}, ids, method="embed")
    logits_fp = model_fp.apply({"params": params}, emb, mask)
    logits_q = model_q.apply({"params": qparams}, emb, mask)
    assert _cos(logits_fp, logits_q) > 0.99
    # argmax agreement: quantization must not reorder most next-token picks
    agree = (np.asarray(logits_fp.argmax(-1)) == np.asarray(logits_q.argmax(-1))).mean()
    assert agree > 0.9, agree


def test_dequantize_base_params_roundtrip_structure():
    model_fp, _ = _tiny_llm("none")
    rng = jax.random.PRNGKey(1)
    ids = jnp.zeros((1, 8), jnp.int32)
    mask = jnp.ones((1, 8), jnp.int32)
    from flax import linen as nn

    params = nn.meta.unbox(model_fp.init(rng, ids, mask, method="init_all")["params"])
    q = quantize_base_params(params)
    back = dequantize_base_params(q)
    assert jax.tree_util.tree_structure(
        jax.tree_util.tree_map(lambda x: 0, back)
    ) == jax.tree_util.tree_structure(jax.tree_util.tree_map(lambda x: 0, params))
    # values roundtrip within quantization error
    k0 = params["decoder"]["layers"]["attn"]["q_proj"]["kernel"]
    k1 = back["decoder"]["layers"]["attn"]["q_proj"]["kernel"]
    assert _cos(k0, k1) > 0.999


def test_resolve_bwd_mlp_suffix():
    """'_mlp' hybrid modes: fast dx on gate/up/down only, exact bf16 on the
    attention dots; suffix-free modes pass through for every projection."""
    from slam_llm_tpu.ops.quant import PROJ_NAMES, resolve_bwd

    for p in PROJ_NAMES:
        assert resolve_bwd("int8_rot", p) == "int8_rot"
        assert resolve_bwd("bf16", p) == "bf16"
    assert resolve_bwd("int8_rot_mlp", "gate_proj") == "int8_rot"
    assert resolve_bwd("int8_rot_mlp", "up_proj") == "int8_rot"
    assert resolve_bwd("int8_rot_mlp", "down_proj") == "int8_rot"
    for p in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert resolve_bwd("int8_rot_mlp", p) == "bf16"
        assert resolve_bwd("int8_sr_mlp", p) == "bf16"
    assert resolve_bwd("int8_sr_mlp", "down_proj") == "int8_sr"


def test_quantize_base_params_rot_mlp_pair_only_on_mlp():
    """bwd='int8_rot_mlp' derives the rotated pair for MLP denses only."""
    w = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (64, 128)), np.float32)
    tree = {"decoder": {"layers": {
        "q_proj": {"kernel": jnp.asarray(w)},
        "gate_proj": {"kernel": jnp.asarray(w)},
    }}}
    out = quantize_base_params(tree, bwd="int8_rot_mlp")["decoder"]["layers"]
    assert sorted(out["q_proj"]) == ["kernel_q", "kernel_scale"]
    assert sorted(out["gate_proj"]) == [
        "kernel_q", "kernel_qr", "kernel_scale", "kernel_scale_r"
    ]


@pytest.mark.parametrize("bwd", ["int8_sr", "int8_rot", "int8_rot_mlp", "int8_rot_otf"])
def test_quantized_model_fast_bwd_trains(bwd):
    """The 2x-backward modes end to end through the trainer: the 'quant' rng
    stream must reach every scanned decoder layer, int8_rot's rotated pair
    must be re-derived from kernel_q at state build, and the run must learn."""
    import dataclasses as dc

    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.slam_model import SLAMConfig, SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    llm = dc.replace(
        LLMConfig.tiny_test(), lora_rank=4, base_quant="int8",
        base_quant_bwd=bwd, dtype=jnp.float32,
    )
    enc = dataclasses.replace(
        __import__("slam_llm_tpu.models.whisper", fromlist=["WhisperEncoderConfig"]).WhisperEncoderConfig.tiny_test(),
        dtype=jnp.float32,
    )
    proj = ProjectorConfig(
        encoder_dim=enc.d_model, llm_dim=llm.d_model, ds_rate=5,
        hidden_dim=32, dtype=jnp.float32,
    )
    cfg = SLAMConfig(
        llm=llm, encoder_name="whisper", encoder=enc, projector="linear",
        projector_cfg=proj, freeze_encoder=True, freeze_llm=True,
    )
    model = SLAMModel(cfg)
    tc = TrainConfig()
    tc.use_peft = True
    tc.lr = 3e-3
    tc.warmup_steps = 2
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    trainer = build_trainer(model, cfg, tc, mesh)
    rng = np.random.default_rng(0)
    batch = {
        "audio_mel": rng.standard_normal((2, 64, 8)).astype(np.float32),
        "audio_mel_mask": np.ones((2, 64), np.int32),
        "input_ids": rng.integers(3, 250, (2, 24)).astype(np.int32),
        "attention_mask": np.ones((2, 24), np.int32),
        "labels": rng.integers(3, 250, (2, 24)).astype(np.int32),
        "modality_mask": np.zeros((2, 24), np.int32),
    }
    batch["modality_mask"][:, :4] = 1
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    with mesh:
        db = trainer.put_batch(batch)
        losses = []
        for i in range(25):
            state, m = trainer.train_step(state, db, jax.random.PRNGKey(i))
            losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0] - 0.1, losses


def test_fast_bwd_gets_fresh_quant_rng_per_step():
    """Regression: the trainer must supply the 'quant' rng stream for EVERY
    stochastically-rounded backward (int8_rot and the _mlp hybrids, not just
    int8_sr). Without it, modules fall back to a fixed seed and the SAME
    uniform dither repeats each step — detectable because two different step
    rngs then produce IDENTICAL updates (dropout is off, so SR noise is the
    only rng consumer)."""
    import dataclasses as dc

    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.slam_model import SLAMConfig, SLAMModel
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    llm = dc.replace(
        LLMConfig.tiny_test(), lora_rank=4, lora_dropout=0.0, base_quant="int8",
        base_quant_bwd="int8_rot", dtype=jnp.float32,
    )
    enc = dataclasses.replace(
        __import__("slam_llm_tpu.models.whisper", fromlist=["WhisperEncoderConfig"]).WhisperEncoderConfig.tiny_test(),
        dtype=jnp.float32,
    )
    proj = ProjectorConfig(
        encoder_dim=enc.d_model, llm_dim=llm.d_model, ds_rate=5,
        hidden_dim=32, dtype=jnp.float32,
    )
    cfg = SLAMConfig(
        llm=llm, encoder_name="whisper", encoder=enc, projector="linear",
        projector_cfg=proj, freeze_encoder=True, freeze_llm=True,
    )
    tc = TrainConfig()
    tc.use_peft = True
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    trainer = build_trainer(SLAMModel(cfg), cfg, tc, mesh)
    rng = np.random.default_rng(0)
    batch = {
        "audio_mel": rng.standard_normal((2, 64, 8)).astype(np.float32),
        "audio_mel_mask": np.ones((2, 64), np.int32),
        "input_ids": rng.integers(3, 250, (2, 24)).astype(np.int32),
        "attention_mask": np.ones((2, 24), np.int32),
        "labels": rng.integers(3, 250, (2, 24)).astype(np.int32),
        "modality_mask": np.zeros((2, 24), np.int32),
    }
    state = trainer.create_state(jax.random.PRNGKey(0), batch)
    with mesh:
        db = trainer.put_batch(batch)
        _, m_a = trainer.train_step(state, db, jax.random.PRNGKey(1))
        # donate_argnums consumed `state`: rebuild the identical start state
        state2 = trainer.create_state(jax.random.PRNGKey(0), batch)
        _, m_b = trainer.train_step(state2, db, jax.random.PRNGKey(2))
    # grad_norm is the most sensitive float32 observable of the backward; a
    # fixed-seed fallback makes the two runs bit-identical
    ga, gb = float(m_a["grad_norm"]), float(m_b["grad_norm"])
    assert ga != gb, (
        f"identical grad_norm {ga} under different step rngs: "
        "quant rng not threaded"
    )


def test_quantized_training_tracks_fp():
    """30 LoRA steps on a tiny model: the int8-base run's loss must track the
    fp run (same data, same init via the transform)."""
    import optax
    from flax.traverse_util import flatten_dict, unflatten_dict

    model_fp, cfg = _tiny_llm("none")
    model_q, _ = _tiny_llm("int8")
    rng = jax.random.PRNGKey(0)
    B, T = 4, 32
    ids = jax.random.randint(rng, (B, T), 3, 250)
    mask = jnp.ones((B, T), jnp.int32)
    labels = ids
    from flax import linen as nn

    params = nn.meta.unbox(model_fp.init(rng, ids, mask, method="init_all")["params"])
    qparams = quantize_base_params(params)

    def make_run(model, full_params):
        flat = flatten_dict(full_params)
        is_lora = lambda k: k[-1] in ("lora_a", "lora_b")
        lora = {k: v for k, v in flat.items() if is_lora(k)}
        frozen = {k: v for k, v in flat.items() if not is_lora(k)}
        assert lora, "tiny config must have LoRA leaves"

        def loss_flat(lora):
            p = unflatten_dict({**frozen, **lora})
            emb = model.apply({"params": p}, ids, method="embed")
            loss, _ = model.apply(
                {"params": p}, emb, mask, labels, method="loss_and_accuracy"
            )
            return loss

        tx = optax.adam(3e-3)
        opt = tx.init(lora)

        @jax.jit
        def step(lora, opt):
            loss, g = jax.value_and_grad(loss_flat)(lora)
            upd, opt = tx.update(g, opt, lora)
            return optax.apply_updates(lora, upd), opt, loss

        losses = []
        for _ in range(30):
            lora, opt, loss = step(lora, opt)
            losses.append(float(loss))
        return losses

    l_fp = make_run(model_fp, params)
    l_q = make_run(model_q, qparams)
    # both must LEARN and track each other
    assert l_fp[-1] < l_fp[0] - 0.05
    assert l_q[-1] < l_q[0] - 0.05
    assert abs(l_q[-1] - l_fp[-1]) < 0.15, (l_fp[-1], l_q[-1])


def test_trainer_guard_requires_frozen_llm():
    import dataclasses as dc

    from slam_llm_tpu.config import TrainConfig
    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.slam_model import SLAMConfig, SLAMModel
    from slam_llm_tpu.models.whisper import WhisperEncoderConfig
    from slam_llm_tpu.parallel import make_mesh
    from slam_llm_tpu.train.state import build_trainer

    llm = dc.replace(LLMConfig.tiny_test(), lora_rank=4, base_quant="int8")
    enc = WhisperEncoderConfig.tiny_test()
    proj = ProjectorConfig(encoder_dim=enc.d_model, llm_dim=llm.d_model, ds_rate=5)
    cfg = SLAMConfig(
        llm=llm, encoder_name="whisper", encoder=enc, projector="linear",
        projector_cfg=proj, freeze_encoder=True, freeze_llm=False,
    )
    model = SLAMModel(cfg)
    tc = TrainConfig()
    tc.use_peft = True
    mesh = make_mesh(dp=1, fsdp=1, tp=1, devices=jax.devices()[:1])
    trainer = build_trainer(model, cfg, tc, mesh)
    batch = {
        "audio_mel": np.zeros((2, 64, 8), np.float32),
        "audio_mel_mask": np.ones((2, 64), np.int32),
        "input_ids": np.zeros((2, 16), np.int32),
        "attention_mask": np.ones((2, 16), np.int32),
        "labels": np.zeros((2, 16), np.int32),
        "modality_mask": np.zeros((2, 16), np.int32),
    }
    with pytest.raises(ValueError, match="base_quant requires freeze_llm"):
        trainer.create_state(jax.random.PRNGKey(0), batch)
