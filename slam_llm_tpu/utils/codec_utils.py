"""Codec token utilities for S2S (SNAC / CosyVoice streams).

Host-side mirrors of the reference's codec glue
(``examples/s2s/utils/{snac_utils,codec_utils}.py``):

  * SNAC "flat-8" manifests (8 tokens per frame: '#'-slot + 7 codebook
    tokens) -> the staggered (7, T) parallel-generation layout with
    per-layer delay padding (``snac_answer_token_layout``);
  * generated staggered streams -> SNAC's hierarchical [1, 2, 4]-codebook
    tensors ready for a vocoder (``snac_streams_to_codebooks``);
  * a ``CodecDecoder`` protocol: the actual SNAC / CosyVoice vocoder weights
    are external (torch) models; plug one in via ``decode_fn`` — everything
    up to the waveform is handled here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass(frozen=True)
class SnacConfig:
    audio_vocab_size: int = 4096
    end_of_audio: int = 4096
    padding_token: int = 4097
    code_layer: int = 7


def snac_answer_token_layout(flat_tokens: Sequence[int], cfg: SnacConfig = SnacConfig()):
    """Flat SNAC stream (8 tokens/frame, slot 0 is the '#' marker) -> the
    staggered (7, T) layout used as parallel-generation targets
    (reference snac_utils.get_snac_answer_token): layer j is delayed by j
    frames of padding, terminated with EOA, tail-padded to equal length."""
    toks = list(flat_tokens)
    n_frames = len(toks) // 8
    toks = toks[: n_frames * 8]  # ignore a trailing partial frame
    audio_length = n_frames + 8
    layers = []
    for layer in range(1, 8):
        row = [cfg.padding_token] * layer
        row += [int(toks[i]) for i in range(len(toks)) if i % 8 == layer]
        row.append(cfg.end_of_audio)
        if layer < 7:
            row += [cfg.padding_token] * (7 - layer)
        layers.append(row)
    return np.asarray(layers, np.int64), audio_length


def _snac_regroup(rows: List[np.ndarray]):
    """Seven equal-length un-staggered rows -> SNAC codebook tensors
    [(1, t), (1, 2t), (1, 4t)], frame-wise [c0 | c1 c4 | c2 c3 c5 c6]."""
    t = len(rows[0])
    cb0 = rows[0][None, :]
    cb1 = np.empty((1, 2 * t), np.int64)
    cb1[0, 0::2] = rows[1]
    cb1[0, 1::2] = rows[4]
    cb2 = np.empty((1, 4 * t), np.int64)
    cb2[0, 0::4] = rows[2]
    cb2[0, 1::4] = rows[3]
    cb2[0, 2::4] = rows[5]
    cb2[0, 3::4] = rows[6]
    return [cb0, cb1, cb2]


def snac_frame_window(streams, f0: int, f1: int, cfg: SnacConfig = SnacConfig()):
    """Un-stagger frames [f0, f1) out of FULL staggered streams: layer j's
    token for frame f sits at position f + j + 1 (the j+1 leading delay slots
    the training layout inserts). Streaming decode uses this to cut chunk
    waveforms without losing the cross-chunk stagger (the reference's
    get_snac indexes the full history the same way, snac_utils.py:38-46)."""
    rows = [
        np.asarray(streams[j][f0 + j + 1 : f1 + j + 1], np.int64)
        % (cfg.audio_vocab_size + 64)
        for j in range(7)
    ]
    return _snac_regroup(rows)


def snac_num_frames(streams, cfg: SnacConfig = SnacConfig()) -> int:
    """Number of complete frames in staggered streams (layer 6 needs
    position f + 7)."""
    return max(0, min(len(streams[j]) for j in range(7)) - 7)


def snac_streams_to_codebooks(streams: np.ndarray, cfg: SnacConfig = SnacConfig()):
    """Generated staggered streams (7, T) -> SNAC codebook tensors
    (reference snac_utils.reconscruct_snac + reconstruct_tensors)."""
    return snac_frame_window(streams, 0, snac_num_frames(streams, cfg), cfg)


def _device_params(params):
    """Upload converted vocoder weights once at load — keeping them as numpy
    would re-transfer the full flow+HiFT set host->device on EVERY decode
    (per streaming chunk), dwarfing compute."""
    import jax

    return jax.tree_util.tree_map(jax.device_put, params)


def cosyvoice_group_to_stream(streams: np.ndarray) -> np.ndarray:
    """Grouped parallel streams (L, T) -> flat codec token stream (T*L,)
    (inverse of data/s2s_dataset.group_answer_tokens)."""
    return np.asarray(streams).T.reshape(-1)


@dataclass
class CodecDecoder:
    """SNAC / CosyVoice vocoder front door — both decode NATIVELY in JAX.

    SNAC: models/snac.py (from-scratch port of the published decoder graph;
    load real weights via ``from_snac_checkpoint``). CosyVoice: token ->
    flow-matching mel (models/cosyvoice_flow.py) -> HiFT-GAN waveform
    (models/hift.py); load via ``from_cosyvoice_checkpoint``. ``decode_fn``
    remains as an escape hatch for external vocoders.
    """

    codec_type: str = "snac"  # snac | cosyvoice
    decode_fn: Optional[Callable] = None
    sample_rate: int = 24000
    snac_params: Optional[dict] = None
    snac_cfg: Optional[object] = None
    flow_params: Optional[dict] = None
    flow_cfg: Optional[object] = None
    hift_params: Optional[dict] = None
    hift_cfg: Optional[object] = None
    spk_embedding: Optional[np.ndarray] = None

    @staticmethod
    def from_snac_checkpoint(path: str) -> "CodecDecoder":
        """Load a torch SNAC checkpoint (state dict .pt / .pth) natively."""
        import torch

        from slam_llm_tpu.models.snac import SNACConfig, convert_snac_torch_state

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        cfg = SNACConfig.snac_24khz()
        return CodecDecoder(
            codec_type="snac",
            snac_params=_device_params(convert_snac_torch_state(sd, cfg)),
            snac_cfg=cfg,
            sample_rate=cfg.sampling_rate,
        )

    @staticmethod
    def from_cosyvoice_checkpoint(
        flow_path: str, hift_path: str, spk_embedding: Optional[np.ndarray] = None
    ) -> "CodecDecoder":
        """Load CosyVoice flow.pt + hift.pt natively (reference
        cli/model.py token2wav path). ``spk_embedding``: (1, 192) x-vector;
        defaults to zeros (reference uses a stock speaker from spk2info)."""
        import torch

        from slam_llm_tpu.models.cosyvoice_flow import (
            FlowConfig,
            convert_cosyvoice_flow_state,
        )
        from slam_llm_tpu.models.hift import HiFTConfig, convert_hift_torch_state

        fsd = torch.load(flow_path, map_location="cpu", weights_only=True)
        hsd = torch.load(hift_path, map_location="cpu", weights_only=True)
        fsd = fsd.get("model", fsd) if isinstance(fsd, dict) else fsd
        hsd = hsd.get("generator", hsd.get("model", hsd)) if isinstance(hsd, dict) else hsd
        fcfg, hcfg = FlowConfig(), HiFTConfig()
        return CodecDecoder(
            codec_type="cosyvoice",
            flow_params=_device_params(convert_cosyvoice_flow_state(fsd, fcfg)),
            flow_cfg=fcfg,
            hift_params=_device_params(convert_hift_torch_state(hsd, hcfg)),
            hift_cfg=hcfg,
            sample_rate=hcfg.sampling_rate,
            spk_embedding=spk_embedding,
        )

    def _decode_snac_codebooks(self, cbs) -> np.ndarray:
        if self.snac_params is not None:
            import jax

            from slam_llm_tpu.models.snac import snac_decode

            cfg = self.snac_cfg
            cbs = [c % cfg.codebook_size for c in cbs]
            # the published snac decoder injects NoiseBlock noise
            # unconditionally (x + linear(x) * randn); a fixed key keeps the
            # learned stochastic excitation while staying reproducible
            return snac_decode(self.snac_params, cbs, cfg,
                               rng=jax.random.PRNGKey(0))[0]
        if self.decode_fn is not None:
            return np.asarray(self.decode_fn(cbs))
        raise RuntimeError(
            "no vocoder attached: use CodecDecoder.from_snac_checkpoint(path) "
            "or construct with snac_params/decode_fn"
        )

    def num_frames(self, streams) -> int:
        """Complete (all-layer-present) frames in staggered SNAC streams."""
        return snac_num_frames(streams)

    def decode_window(self, streams, f0: int, f1: int) -> Optional[np.ndarray]:
        """SNAC streaming: decode frames [f0, f1) against the FULL staggered
        history, so chunk boundaries don't eat the per-layer delays."""
        if self.codec_type != "snac":
            raise RuntimeError("decode_window is SNAC-specific")
        if f1 <= f0:
            return None
        return self._decode_snac_codebooks(snac_frame_window(streams, f0, f1))

    def decode(self, streams: np.ndarray) -> np.ndarray:
        """Staggered generated streams (L, T) -> waveform float32 (samples,)."""
        if self.codec_type == "snac":
            return self._decode_snac_codebooks(snac_streams_to_codebooks(streams))
        # CosyVoice: grouped streams -> flat tokens -> flow mel -> HiFT wav
        tokens = cosyvoice_group_to_stream(streams)
        if self.flow_params is not None:
            import jax

            from slam_llm_tpu.models.cosyvoice_flow import flow_token2mel
            from slam_llm_tpu.models.hift import hift_decode

            fcfg = self.flow_cfg
            tokens = np.asarray(tokens)
            # reference codec_utils.py:84-94: TRUNCATE at the first EOA
            # (== vocab_size in local audio space), then replace residual
            # pads in-place with 4095 — deleting them would shift every
            # later token one slot and desynchronize the frame grouping
            eoa_pos = np.nonzero(tokens == fcfg.vocab_size)[0]
            if eoa_pos.size:
                tokens = tokens[: eoa_pos[0]]
            tokens = np.where(tokens >= fcfg.vocab_size, fcfg.vocab_size - 1, tokens)[None]
            spk = (
                self.spk_embedding
                if self.spk_embedding is not None
                else np.zeros((1, fcfg.spk_embed_dim), np.float32)
            )
            mel = flow_token2mel(self.flow_params, tokens, spk, fcfg,
                                 rng=jax.random.PRNGKey(0))
            wav = hift_decode(self.hift_params, mel, self.hift_cfg,
                              rng=jax.random.PRNGKey(1))
            return np.asarray(wav[0])
        if self.decode_fn is None:
            raise RuntimeError(
                "CosyVoice decoding: use CodecDecoder.from_cosyvoice_checkpoint("
                "flow_path, hift_path) or attach decode_fn"
            )
        return np.asarray(self.decode_fn(tokens))
