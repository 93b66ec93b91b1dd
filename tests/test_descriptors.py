"""Conditioning-selector tests (reference ldmseg/models/descriptors.py:67-105).

The CLIP towers are injected as tiny random-init transformers models built
from local configs (no weight downloads), so the full host-side encode ->
encoder_hidden_states -> cross-attention path is exercised end to end.
"""

import os
from types import SimpleNamespace

import jax
import numpy as np
import pytest

from ldmseg_tpu.models import descriptors as D
from ldmseg_tpu.models.unet import tiny_unet_config

REF_EXAMPLES = "/root/reference/data/examples/coco"


def _tiny_vision_model(pooled: bool):
    from transformers import (CLIPVisionConfig, CLIPVisionModel,
                              CLIPVisionModelWithProjection)

    cfg = CLIPVisionConfig(
        hidden_size=16, intermediate_size=32, num_hidden_layers=1,
        num_attention_heads=2, image_size=32, patch_size=16,
        projection_dim=8,
    )
    cls = CLIPVisionModelWithProjection if pooled else CLIPVisionModel
    model = cls(cfg)
    model.eval()
    return model


def _tiny_text_model():
    from transformers import CLIPTextConfig, CLIPTextModel

    cfg = CLIPTextConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=1,
        num_attention_heads=2, vocab_size=64, max_position_embeddings=77,
    )
    model = CLIPTextModel(cfg)
    model.eval()
    return model


class FakeTokenizer:
    model_max_length = 77

    def __call__(self, texts, **kw):
        return SimpleNamespace(
            input_ids=np.ones((len(texts), 77), np.int64)
        )


def test_remove_and_learnable_modes():
    cfg = tiny_unet_config()
    img, txt, tok, out = D.get_image_descriptor_model("remove", None, cfg)
    assert (img, txt, tok) == (None, None, None)
    assert not out.use_cross_attention

    img, txt, tok, out = D.get_image_descriptor_model("learnable", None, cfg)
    assert (img, txt, tok) == (None, None, None)
    assert out.use_cross_attention and out.num_object_queries == 128


@pytest.mark.parametrize("name", ["dino_image", "mae"])
def test_unsupported_modes_raise(name):
    with pytest.raises(NotImplementedError):
        D.get_image_descriptor_model(name, None, tiny_unet_config())


def test_clip_image_mode(monkeypatch):
    """Patch features: [B, 1+(32/16)^2, hid] with encoder_hid_dim set so the
    UNet projects hid->cross_attention_dim (reference unet.py encoder_hid_proj)."""
    monkeypatch.setattr(D, "_load_clip_vision",
                        lambda name, pooled: _tiny_vision_model(pooled))
    img_fn, txt, tok, cfg = D.get_image_descriptor_model(
        "clip_image", None, tiny_unet_config()
    )
    assert txt is None and tok is None
    assert cfg.use_cross_attention and cfg.encoder_hid_dim == 16

    feats = img_fn(np.random.rand(2, 48, 64, 3).astype(np.float32))
    assert feats.shape == (2, 5, 16)  # 4 patches + CLS
    assert np.isfinite(feats).all()


def test_clip_image_proj_mode(monkeypatch):
    """Pooled projection: one context token of width projection_dim, consumed
    directly (cross_attention_dim rewritten to match)."""
    monkeypatch.setattr(D, "_load_clip_vision",
                        lambda name, pooled: _tiny_vision_model(pooled))
    img_fn, txt, tok, cfg = D.get_image_descriptor_model(
        "clip_image_proj", None, tiny_unet_config()
    )
    assert cfg.use_cross_attention and cfg.cross_attention_dim == 8
    assert cfg.encoder_hid_dim is None

    feats = img_fn(np.random.rand(2, 32, 32, 3).astype(np.float32))
    assert feats.shape == (2, 1, 8)


def test_text_mode(monkeypatch):
    """'none' => SD CLIP text encoder + tokenizer (enables true CFG)."""
    monkeypatch.setattr(D, "_load_text_encoder", lambda p: _tiny_text_model())
    monkeypatch.setattr(D, "_load_tokenizer", lambda p: FakeTokenizer())
    img_fn, text_fn, tok, cfg = D.get_image_descriptor_model(
        "none", "/does/not/matter", tiny_unet_config()
    )
    assert img_fn is None and tok is not None and cfg.use_cross_attention

    tokens = tok(["a photo"] * 2).input_ids
    emb = text_fn(tokens)
    assert emb.shape == (2, 77, 32)
    assert np.isfinite(emb).all()


# -- trainer integration ----------------------------------------------------

pytestmark_examples = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="bundled examples unavailable"
)


@pytestmark_examples
def test_trainer_image_descriptor_conditioning(tmp_path):
    """TrainerDiffusion with a frozen image-descriptor fn: the host-side
    features flow into the train step and the sampler as
    encoder_hidden_states (ldm_cond.py:721-728)."""
    from tests.test_trainers import _datasets, tiny_config

    import shutil

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.core.mesh import MeshSpec, make_mesh
    from ldmseg_tpu.models.vae_sd import SDVAEConfig
    from ldmseg_tpu.utils.meters import AverageMeter, ProgressMeter

    root = tmp_path / "coco"
    shutil.copytree(REF_EXAMPLES, root)

    p = tiny_config(tmp_path)
    p["train_kwargs"]["image_descriptors"] = "clip_image"
    ds_t, ds_v = _datasets(str(root), p)

    calls = []

    def image_fn(images01):
        calls.append(images01.shape)
        rng = np.random.default_rng(0)
        return rng.standard_normal(
            (images01.shape[0], 5, 16), dtype=np.float32
        )

    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(
            in_channels=8, cond_channels=4,
            use_cross_attention=True, encoder_hid_dim=16,
        ),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
        image_descriptor_fn=image_fn,
    )
    losses = AverageMeter("Loss", ":.4e")
    progress = ProgressMeter(len(trainer.dl), [losses], prefix="t")
    trainer.train_single_epoch(0, losses, progress)
    assert np.isfinite(losses.avg) and losses.avg > 0
    assert calls, "image_descriptor_fn was never consulted during training"

    res = trainer.compute_pq(num_inference_steps=2, max_iter=1)
    assert "PQ" in res["panoptic_seg"]
    # train batches + one val batch
    assert len(calls) >= len(trainer.dl) + 1


@pytestmark_examples
def test_trainer_text_uncond_cfg(tmp_path):
    """Text mode: empty-string uncond embeddings drive true CFG
    (ldm_cond.py:1113-1117); the cache hands back the same array."""
    from tests.test_trainers import _datasets, tiny_config

    import shutil

    import jax.numpy as jnp

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion
    from ldmseg_tpu.core.mesh import MeshSpec, make_mesh
    from ldmseg_tpu.models.vae_sd import SDVAEConfig

    root = tmp_path / "coco"
    shutil.copytree(REF_EXAMPLES, root)

    p = tiny_config(tmp_path)
    ds_t, ds_v = _datasets(str(root), p)

    def text_fn(tokens):
        # token-dependent embeddings: the empty-string uncond tokens (ones,
        # FakeTokenizer) and the test's cond tokens (twos) must embed
        # differently, otherwise CFG is an identity
        rng = np.random.default_rng(int(np.asarray(tokens).sum()) % (2 ** 31))
        return rng.standard_normal(
            (tokens.shape[0], 77, 32), dtype=np.float32
        )

    mesh = make_mesh(MeshSpec(data=4, fsdp=1), devices=jax.devices()[:4])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=str(tmp_path / "run"),
        dataset_train=ds_t, dataset_val=ds_v,
        unet_cfg=tiny_unet_config(in_channels=8, cond_channels=4,
                                  use_cross_attention=True,
                                  cross_attention_dim=32),
        sd_vae_cfg=SDVAEConfig(block_out_channels=(8, 8, 8, 8),
                               layers_per_block=1, norm_num_groups=4,
                               dtype="float32"),
        tokenizer=FakeTokenizer(), text_encoder_fn=text_fn,
    )
    uncond = trainer._uncond_context(2)
    assert uncond.shape == (2, 77, 32)
    assert trainer._uncond_context(2) is uncond  # cached

    lat = trainer.latent_size
    rng = np.random.default_rng(2)
    rgb_latents = jnp.asarray(rng.standard_normal((2, lat, lat, 4)),
                              dtype=jnp.float32)
    context = jnp.asarray(text_fn(np.full((2, 77), 2.0)))
    guided = trainer.sample(rgb_latents, num_inference_steps=2,
                            context=context, uncond_context=uncond)
    plain = trainer.sample(rgb_latents, num_inference_steps=2,
                           context=context)
    assert guided.shape == plain.shape == (2, lat, lat, 4)
    # guidance_scale=7.5 with distinct uncond embeddings must change the output
    assert np.abs(np.asarray(guided) - np.asarray(plain)).max() > 1e-4


def test_image_and_text_conditioning_mutually_exclusive(tmp_path):
    """The assert fires before any dataset/model work (ldm_cond.py:730:
    the reference selects exactly one conditioning stream)."""
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    with pytest.raises(AssertionError, match="mutually exclusive"):
        TrainerDiffusion(
            {}, results_folder=str(tmp_path),
            text_encoder_fn=lambda t: t,
            image_descriptor_fn=lambda i: i,
        )
