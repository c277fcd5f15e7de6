"""AV-HuBERT encoder + dataset tests (video-only VSR and AV fusion)."""

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # heavyweight parity/e2e (run with -m slow)

from slam_llm_tpu.models.avhubert import (
    AVHubertConfig,
    AVHubertEncoder,
    stacked_logfbank,
)


@pytest.fixture(scope="module")
def enc_setup():
    cfg = dataclasses.replace(AVHubertConfig.tiny_test(), dtype=jnp.float32)
    enc = AVHubertEncoder(cfg)
    rng = np.random.default_rng(0)
    video = jnp.asarray(rng.standard_normal((2, 6, 24, 24)).astype(np.float32))
    feats = jnp.asarray(rng.standard_normal((2, 6, cfg.audio_feat_dim)).astype(np.float32))
    mask = np.ones((2, 6), np.int32)
    mask[1, 4:] = 0
    mask = jnp.asarray(mask)
    params = enc.init(jax.random.PRNGKey(0), video, feats, mask)
    return cfg, enc, params, video, feats, mask


def test_av_fusion_shapes(enc_setup):
    cfg, enc, params, video, feats, mask = enc_setup
    out, out_mask = enc.apply(params, video, feats, mask)
    assert out.shape == (2, 6, cfg.d_model)
    assert np.isfinite(np.asarray(out)).all()


def test_video_only(enc_setup):
    cfg, enc, params, video, feats, mask = enc_setup
    out, _ = enc.apply(params, video, None, mask)
    assert out.shape == (2, 6, cfg.d_model)
    out_av, _ = enc.apply(params, video, feats, mask)
    assert not np.allclose(np.asarray(out), np.asarray(out_av))


def test_stacked_logfbank_rate():
    wav = np.random.default_rng(0).standard_normal(16000).astype(np.float32) * 0.1
    feats = stacked_logfbank(wav)
    assert feats.shape[1] == 104
    # ~25 Hz: 1 s -> ~24-25 stacked frames
    assert 23 <= feats.shape[0] <= 25


def test_vsr_dataset_and_fusion(tmp_path):
    cv2 = pytest.importorskip("cv2")
    # write a tiny synthetic video
    rows = []
    for i in range(2):
        path = str(tmp_path / f"v{i}.avi")
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 25, (96, 96))
        rng = np.random.default_rng(i)
        for _ in range(8):
            w.write(rng.integers(0, 255, (96, 96, 3), dtype=np.uint8))
        w.release()
        rows.append({"key": f"v{i}", "video": path, "target": f"hello {i}"})
    manifest = tmp_path / "train.jsonl"
    manifest.write_text("".join(json.dumps(r) + "\n" for r in rows))

    from slam_llm_tpu.config import RunConfig
    from slam_llm_tpu.data.avhubert_dataset import get_avhubert_dataset
    from slam_llm_tpu.data.tokenizer import ByteTokenizer

    cfg = RunConfig().dataset_config
    cfg.train_data_path = str(manifest)
    cfg.val_data_path = str(manifest)
    cfg.encoder_projector_ds_rate = 2
    ds = get_avhubert_dataset(cfg, ByteTokenizer(), "train")
    item = ds[0]
    assert item["visual"].shape[1:] == (88, 88)
    assert item["audio_length"] == item["visual"].shape[0] // 2
    batch = ds.collator([ds[0], ds[1]])
    assert batch["visual"].shape[0] == 2
    assert batch["visual_mask"].shape == batch["visual"].shape[:2]

    # through the fusion model
    from slam_llm_tpu.models.avhubert import AVHubertConfig
    from slam_llm_tpu.models.llm import LLMConfig
    from slam_llm_tpu.models.projector import ProjectorConfig
    from slam_llm_tpu.models.slam_model import SLAMConfig, SLAMModel

    scfg = SLAMConfig(
        llm=LLMConfig.tiny_test(vocab_size=260),
        encoder_name="av_hubert",
        encoder=dataclasses.replace(AVHubertConfig.tiny_test(), dtype=jnp.float32),
        projector="linear",
        projector_cfg=ProjectorConfig(encoder_dim=32, llm_dim=64, ds_rate=2, hidden_dim=16),
    )
    model = SLAMModel(scfg)
    jb = {k: jnp.asarray(v) for k, v in batch.items() if hasattr(v, "shape")}
    params = model.init(jax.random.PRNGKey(0), jb, method="init_all")
    out = model.apply(params, jb)
    assert np.isfinite(float(out["loss"]))
