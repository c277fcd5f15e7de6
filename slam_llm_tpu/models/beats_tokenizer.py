"""BEATs acoustic tokenizer: backbone + norm-EMA vector quantizer, TPU-first.

Re-implements the reference's in-tree tokenizer
(reference models/BEATs/Tokenizers.py:72-172, quantizer.py:131-215): the
same conv2d patch embedding + transformer trunk as the BEATs encoder (but a
plain post-LN backbone — the TokenizersConfig defaults carry no relative
position bias and no deep-norm, Tokenizers.py:51-57), a
``Linear -> tanh -> Linear`` projection to the 256-d codebook space, and a
cosine-space nearest-neighbour lookup into a 1024-entry l2-normalized
codebook. ``extract_labels`` returns the per-patch codebook indices that
BEATs pre-training distills against (Tokenizers.py:138-172).

No SLAM-LLM recipe consumes the tokenizer (every recipe builds only the
encoder, reference models/encoder.py:48-63); it is implemented for strict
component parity and for users who pre-train their own BEATs. PARITY.md's
prior "deliberate exclusion" entry is superseded by this module.

TPU-native design notes:

* the torch quantizer mutates EMA buffers in-place and branches on
  ``self.training`` / distributed state (quantizer.py:176-207); here the
  inference path (``norm_ema_quantize``) is a pure function and the EMA
  codebook update (``ema_codebook_update``) is a separate pure function
  returning the new ``(codebook, cluster_size)`` — jit/scan-able, with the
  torch ``all_reduce`` on bins/embed_sum replaced by an optional
  ``jax.lax.psum`` over a mesh axis.
* k-means cosine init (quantizer.py:39-66) is a ``lax.fori_loop`` over
  ``segment_sum`` scatter-adds — no host loop, no in-place scatter.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from slam_llm_tpu.models.beats import BEATsEncoder, BEATsEncoderConfig, convert_beats
from slam_llm_tpu.models.layers import DenseGeneralLora


def l2norm(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """torch F.normalize(p=2, dim=-1) parity (max(norm, eps) denominator)."""
    n = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1, keepdims=True))
    return x / jnp.maximum(n, eps)


@dataclass(frozen=True)
class BEATsTokenizerConfig:
    trunk: BEATsEncoderConfig = field(
        default_factory=lambda: BEATsEncoderConfig(
            rel_bias=False, deep_norm=False, gate_from_query=False
        )
    )
    quant_n: int = 1024  # codebook entries (reference Tokenizers.py:64)
    quant_dim: int = 256  # codebook dimension (reference Tokenizers.py:65)
    decay: float = 0.99
    eps: float = 1e-5
    beta: float = 1.0  # commitment-loss weight (Tokenizers.py:99)

    @staticmethod
    def beats_iter3() -> "BEATsTokenizerConfig":
        return BEATsTokenizerConfig()

    @staticmethod
    def tiny_test() -> "BEATsTokenizerConfig":
        return BEATsTokenizerConfig(
            trunk=BEATsEncoderConfig(
                patch_size=4, patch_embed_dim=8, n_mels=16, d_model=32, n_heads=2,
                n_layers=2, ffn_dim=64, num_buckets=32, max_distance=64,
                conv_pos=16, conv_pos_groups=2,
                rel_bias=False, deep_norm=False, gate_from_query=False,
            ),
            quant_n=16, quant_dim=8,
        )


def norm_ema_quantize(
    z: jnp.ndarray,  # (..., quant_dim) projected features
    codebook: jnp.ndarray,  # (quant_n, quant_dim), rows l2-normalized
    beta: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pure-function core of NormEMAVectorQuantizer.forward
    (reference quantizer.py:160-215): l2-normalize z, nearest codebook row by
    squared euclidean distance, straight-through z_q, commitment loss.

    Returns (z_q, loss, indices). The distance argmin is computed from the
    expanded form ||z||^2 + ||e||^2 - 2 z.e — with both sides l2-normalized
    this ranks identically to cosine similarity, matching the torch math
    bit-for-bit in fp32."""
    z = l2norm(z.astype(jnp.float32))
    flat = z.reshape(-1, z.shape[-1])
    cb = codebook.astype(jnp.float32)
    d = (
        jnp.sum(jnp.square(flat), axis=1, keepdims=True)
        + jnp.sum(jnp.square(cb), axis=1)[None, :]
        - 2.0 * flat @ cb.T
    )
    idx = jnp.argmin(d, axis=1)
    z_q = jnp.take(cb, idx, axis=0).reshape(z.shape)
    loss = beta * jnp.mean(jnp.square(jax.lax.stop_gradient(z_q) - z))
    z_q = z + jax.lax.stop_gradient(z_q - z)  # straight-through estimator
    return z_q, loss, idx.reshape(z.shape[:-1])


def ema_codebook_update(
    codebook: jnp.ndarray,  # (N, D)
    cluster_size: jnp.ndarray,  # (N,)
    z: jnp.ndarray,  # (..., D) PRE-normalization projected features
    indices: jnp.ndarray,  # (...,) from norm_ema_quantize
    decay: float = 0.99,
    axis_name: Optional[str] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Training-mode EMA codebook update (reference quantizer.py:185-207),
    as a pure function: bins/embed_sum via segment_sum; empty bins keep their
    old rows; the new codebook is EMA-merged then re-l2-normalized
    (norm_ema_inplace, quantizer.py:126-128). ``axis_name`` replaces the
    torch all_reduce for data-parallel training (psum over the mesh axis)."""
    n, dim = codebook.shape
    flat = l2norm(z.astype(jnp.float32)).reshape(-1, dim)
    idx = indices.reshape(-1)
    bins = jax.ops.segment_sum(jnp.ones_like(idx, jnp.float32), idx, num_segments=n)
    embed_sum = jax.ops.segment_sum(flat, idx, num_segments=n)
    if axis_name is not None:
        bins = jax.lax.psum(bins, axis_name)
        embed_sum = jax.lax.psum(embed_sum, axis_name)
    new_cluster = cluster_size * decay + bins * (1.0 - decay)
    zero = bins == 0
    safe_bins = jnp.where(zero, 1.0, bins)
    embed_normalized = l2norm(embed_sum / safe_bins[:, None])
    embed_normalized = jnp.where(zero[:, None], codebook, embed_normalized)
    new_codebook = l2norm(codebook * decay + embed_normalized * (1.0 - decay))
    return new_codebook, new_cluster


def kmeans_cosine(
    rng: jax.Array, samples: jnp.ndarray, num_clusters: int, num_iters: int = 10
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity k-means for codebook init (reference
    quantizer.py:39-66 with use_cosine_sim=True): means start as a random
    sample subset, assignments by max dot product, empty clusters keep their
    previous mean. Returns (means (N, D), bins (N,))."""
    n_samples, dim = samples.shape
    samples = samples.astype(jnp.float32)
    if n_samples >= num_clusters:
        order = jax.random.permutation(rng, n_samples)[:num_clusters]
    else:
        order = jax.random.randint(rng, (num_clusters,), 0, n_samples)
    means0 = samples[order]

    def body(_, carry):
        means, _ = carry
        buckets = jnp.argmax(samples @ means.T, axis=1)
        bins = jax.ops.segment_sum(
            jnp.ones((n_samples,), jnp.float32), buckets, num_segments=num_clusters
        )
        sums = jax.ops.segment_sum(samples, buckets, num_segments=num_clusters)
        new_means = l2norm(sums / jnp.maximum(bins, 1.0)[:, None])
        means = jnp.where((bins == 0)[:, None], means, new_means)
        return means, bins

    return jax.lax.fori_loop(
        0, num_iters, body, (means0, jnp.zeros((num_clusters,), jnp.float32))
    )


class BEATsTokenizer(nn.Module):
    """(B, T_mel, 128) normalized fbank (+mask) -> (B, n_patches) codebook ids.

    Layout mirrors reference Tokenizers.Tokenizers: the trunk is shared with
    ``BEATsEncoder`` (identical param tree -> one converter), then
    ``quantize_layer`` = Linear(d, d) -> tanh -> Linear(d, quant_dim)
    (Tokenizers.py:103-107) and the codebook lookup."""

    cfg: BEATsTokenizerConfig

    @nn.compact
    def __call__(
        self, fbank: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        t = c.trunk
        x, out_mask = BEATsEncoder(t, name="trunk")(fbank, mel_mask)
        h = DenseGeneralLora(
            features=t.d_model, use_bias=True, dtype=t.dtype,
            param_dtype=t.param_dtype, kernel_axes=("embed", "mlp"), name="quantize_in",
        )(x)
        h = jnp.tanh(h)
        zin = DenseGeneralLora(
            features=c.quant_dim, use_bias=True, dtype=t.dtype,
            param_dtype=t.param_dtype, kernel_axes=("mlp", None), name="quantize_out",
        )(h)
        codebook = self.param(
            "codebook",
            nn.with_logical_partitioning(
                lambda rng, shape, dt: l2norm(
                    jax.random.normal(rng, shape, dt)
                ),
                (None, None),
            ),
            (c.quant_n, c.quant_dim),
            jnp.float32,
        )
        z_q, loss, idx = norm_ema_quantize(zin, codebook, c.beta)
        return idx, loss, out_mask

    def extract_labels(
        self, fbank: jnp.ndarray, mel_mask: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        """Reference Tokenizers.extract_labels parity (sans the host-side
        kaldi fbank, which lives in ops/fbank like every other frontend)."""
        idx, _, _ = self(fbank, mel_mask)
        return idx


def convert_beats_tokenizer(
    sd: Dict[str, np.ndarray], cfg: BEATsTokenizerConfig
) -> Dict[str, Any]:
    """Official BEATs tokenizer checkpoint ('model' state dict) ->
    BEATsTokenizer subtree. Trunk keys share the encoder's naming, so the
    encoder converter does the heavy lifting; tokenizer checkpoints without
    rel-pos keys are handled by the trunk config's rel_bias=False."""
    f32 = lambda x: np.asarray(x, np.float32)  # noqa: E731
    t = lambda w: np.ascontiguousarray(f32(w).T)  # noqa: E731
    # trunk keys share the encoder naming; convert_beats emits the rel-pos
    # leaves only when the checkpoint has them, which matches rel_bias=False
    trunk = convert_beats(dict(sd), cfg.trunk)
    return {
        "trunk": trunk,
        "quantize_in": {
            "kernel": t(sd["quantize_layer.0.weight"]),
            "bias": f32(sd["quantize_layer.0.bias"]),
        },
        "quantize_out": {
            "kernel": t(sd["quantize_layer.2.weight"]),
            "bias": f32(sd["quantize_layer.2.bias"]),
        },
        "codebook": f32(sd["quantize.embedding.weight"]),
    }
