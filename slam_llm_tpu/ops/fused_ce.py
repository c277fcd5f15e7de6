"""Fused linear + cross-entropy: loss/accuracy WITHOUT materializing logits.

The reference computes HF CausalLM loss over full ``(B, T, V)`` fp32 logits
(reference models/slam_model.py:366-380 -> transformers loss). At flagship
shapes (B=24, T=448, V=32000) that buffer is 1.4 GB fp32 — and its backward
(softmax - onehot) materializes a second one. Both are pure HBM traffic, and
together they are what OOMs B=32 on a 16 GB v5e chip.

TPU-first replacement: chunk the time axis and fuse projection + CE per
chunk inside a ``lax.scan``:

  forward:  per chunk  logits = x_c @ W  (bf16 MXU dot, fp32 accum)
            keep only  lse (B, C) fp32 + running loss/accuracy sums
  backward: recompute the chunk's logits, form (softmax - onehot) * w in one
            fused elementwise pass, contract straight back to dx (and dW when
            the head is trainable).

Peak extra memory: ONE chunk of logits (~100-200 MB) instead of 2x full
logits; extra FLOPs: one recomputed head matmul (~3% of a training step).
The saved lse row is the only residual.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def fused_linear_ce(
    hidden: jnp.ndarray,  # (B, T, D) — ALREADY causally shifted by the caller
    kernel: jnp.ndarray,  # (D, V), or (V, D) with transpose_kernel=True (tied embeddings)
    labels: jnp.ndarray,  # (B, T) int32 — already shifted; ignore_index masks
    *,
    ignore_index: int = -100,
    chunk: int = 64,
    transpose_kernel: bool = False,
    kernel_needs_grad: bool = True,
    compute_dtype: jnp.dtype = jnp.bfloat16,
    quant: bool = False,
    quant_bwd: str = "bf16",
    quant_seed: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked-mean CE loss + next-token accuracy, chunked over T.

    Exactly ``mean_over_valid(logsumexp(xW) - (xW)[label])`` with fp32
    accumulation — slightly MORE precise than the unfused path, whose
    bf16 head matmul rounds the logits before the fp32 CE.

    ``quant=True`` (requires a FROZEN head, ``kernel_needs_grad=False``)
    runs the head dots W8A8 on the s8 MXU at 2x the bf16 rate: the chunk
    logits (forward AND the backward's recompute) quantize ``x`` per-row
    (deterministic rounding) against a per-vocab-channel int8 kernel.
    ``quant_bwd`` picks the dx contraction: "bf16" (default) contracts the
    DEQUANTIZED int8 kernel exactly — the true gradient of the quantized
    forward; "int8_sr" folds the kernel scales into ``(softmax - onehot)``
    and quantizes it per-row with STOCHASTIC rounding (``quant_seed``;
    fresh per step via the 'quant' rng stream) for a 2x dx too — NOTE the
    dlog rows are spike-dominated (the onehot coordinate sets the amax), so
    this mode carries real gradient variance; measure before shipping.
    Same recipe as the decoder base (ops/quant.int8_dot), applied to the
    lm_head the reference keeps fp (reference models/slam_model.py:366-380
    -> fp32 HF loss logits).
    """
    b, t, d = hidden.shape
    v = kernel.shape[0] if transpose_kernel else kernel.shape[1]
    chunk = max(1, min(chunk, t))

    kernel_q = kernel_sc = None
    if quant:
        if quant_bwd not in ("bf16", "int8_sr"):
            raise ValueError(
                f"fused_linear_ce quant_bwd={quant_bwd!r}: expected 'bf16' or 'int8_sr'"
            )
        if kernel_needs_grad:
            raise ValueError(
                "fused_linear_ce quant=True requires a frozen head "
                "(kernel_needs_grad=False): the s8 dot's kernel cotangent "
                "is zero by construction"
            )
        from slam_llm_tpu.ops.quant import quantize_int8

        # per-vocab-channel scales over the D contraction: (V,) both layouts
        kernel_q, kernel_sc = quantize_int8(
            kernel, contract_axis=-1 if transpose_kernel else -2
        )
        kernel_q = jax.lax.stop_gradient(kernel_q)
        kernel_sc = jax.lax.stop_gradient(kernel_sc.astype(jnp.float32))
        if quant_seed is None:
            quant_seed = jnp.uint32(0)

    valid = labels != ignore_index
    safe_labels = jnp.where(valid, labels, 0).astype(jnp.int32)
    w = valid.astype(jnp.float32)
    denom = jnp.maximum(w.sum(), 1.0)

    # pad T to a chunk multiple (padded rows carry w=0: no loss, no grad)
    n = -(-t // chunk)
    pad = n * chunk - t
    if pad:
        hidden = jnp.pad(hidden, ((0, 0), (0, pad), (0, 0)))
        safe_labels = jnp.pad(safe_labels, ((0, 0), (0, pad)))
        w = jnp.pad(w, ((0, 0), (0, pad)))

    # (n, B, chunk, ...) scan inputs
    xs_h = hidden.reshape(b, n, chunk, d).transpose(1, 0, 2, 3)
    xs_l = safe_labels.reshape(b, n, chunk).transpose(1, 0, 2)
    xs_w = w.reshape(b, n, chunk).transpose(1, 0, 2)

    def chunk_logits(xc: jnp.ndarray, W: jnp.ndarray) -> jnp.ndarray:
        if quant:
            from slam_llm_tpu.ops.quant import act_quant

            xq, xs = act_quant(xc.astype(compute_dtype))  # (B, C, D) s8, (B, C, 1)
            y = jax.lax.dot_general(
                xq, kernel_q,
                (((2,), (1 if transpose_kernel else 0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
            return y * xs * kernel_sc  # (B, C, V) fp32
        xc = xc.astype(compute_dtype)
        Wc = W.astype(compute_dtype)
        if transpose_kernel:
            return jax.lax.dot_general(
                xc, Wc, (((2,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (B, C, V)
        return jnp.dot(xc, Wc, preferred_element_type=jnp.float32)

    def _scan_fwd(h_chunks, W):
        def body(carry, inp):
            nll, correct = carry
            xc, lc, wc = inp
            logits = chunk_logits(xc, W)  # (B, C, V) fp32
            lse = jax.scipy.special.logsumexp(logits, axis=-1)
            ll = jnp.take_along_axis(logits, lc[..., None], axis=-1)[..., 0]
            nll = nll + ((lse - ll) * wc).sum()
            hits = (jnp.argmax(logits, axis=-1) == lc).astype(jnp.float32)
            correct = correct + (hits * wc).sum()
            return (nll, correct), lse

        return jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)), (h_chunks, xs_l, xs_w)
        )

    @jax.custom_vjp
    def run(h_chunks, W):
        (nll, correct), _ = _scan_fwd(h_chunks, W)
        return nll / denom, correct / denom

    def run_fwd(h_chunks, W):
        (nll, correct), lses = _scan_fwd(h_chunks, W)
        return (nll / denom, correct / denom), (h_chunks, W, lses)

    def run_bwd(res, cts):
        h_chunks, W, lses = res
        g = cts[0]  # accuracy output is aux: its cotangent is zero

        # the matrix the dx contraction sees: with a quantized forward the
        # exact gradient OF THAT forward contracts the DEQUANTIZED int8
        # kernel (the matrix the logits actually used), materialized once
        # outside the scan — same per-chunk read traffic as the fp kernel
        if quant and quant_bwd == "bf16":
            from slam_llm_tpu.ops.quant import dequantize_int8

            W_bwd = dequantize_int8(
                kernel_q, kernel_sc,
                contract_axis=-1 if transpose_kernel else -2,
                dtype=compute_dtype,
            )
        else:
            W_bwd = W.astype(compute_dtype)

        def body(dW, inp):
            xc, lc, wc, lse, ci = inp
            logits = chunk_logits(xc, W)
            # (softmax - onehot) * w * g/denom — one fused elementwise pass
            p = jnp.exp(logits - lse[..., None])
            oh = (lc[..., None] == jnp.arange(v, dtype=jnp.int32)).astype(jnp.float32)
            dlog = (p - oh) * (wc * (g / denom))[..., None]
            if quant and quant_bwd == "int8_sr":
                # 2x-rate dx: fold the per-vocab kernel scales into dlog,
                # SR-quantize per row (fresh stream per chunk), contract s8
                from slam_llm_tpu.ops.kernels.rowquant import rowquant

                z, sz = rowquant(
                    dlog, kernel_sc,
                    seed=quant_seed + ci.astype(jnp.uint32),
                )
                dx = jax.lax.dot_general(
                    z, kernel_q,
                    (((2,), (0 if transpose_kernel else 1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32) * sz
                return dW, dx.astype(h_chunks.dtype)
            dlog_c = dlog.astype(compute_dtype)
            if transpose_kernel:
                dx = jnp.dot(dlog_c, W_bwd)
                if kernel_needs_grad:
                    dW = dW + jax.lax.dot_general(
                        dlog_c, xc.astype(compute_dtype),
                        (((0, 1), (0, 1)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (V, D)
            else:
                dx = jax.lax.dot_general(
                    dlog_c, W_bwd, (((2,), (1,)), ((), ())),
                )  # (B, C, D)
                if kernel_needs_grad:
                    dW = dW + jax.lax.dot_general(
                        xc.astype(compute_dtype), dlog_c,
                        (((0, 1), (0, 1)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (D, V)
            return dW, dx.astype(h_chunks.dtype)

        dW0 = jnp.zeros(W.shape, jnp.float32)
        dW, dxs = jax.lax.scan(
            body, dW0,
            (h_chunks, xs_l, xs_w, lses, jnp.arange(lses.shape[0], dtype=jnp.int32)),
        )
        if not kernel_needs_grad:
            dW = dW0  # trivially DCE'd broadcast; AD discards it at the frozen boundary
        return dxs, dW.astype(W.dtype)

    run.defvjp(run_fwd, run_bwd)
    loss, acc = run(xs_h, kernel)

    # route dxs (n, B, C, D) back to the caller's (B, T, D) layout: express
    # the reshape/transpose as primal ops so AD inverts them for free
    return loss, jax.lax.stop_gradient(acc)
