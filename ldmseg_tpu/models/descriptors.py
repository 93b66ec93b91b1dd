"""Conditioning selector (reference: ldmseg/models/descriptors.py:67-105).

Maps the ``image_descriptors`` training flag to (image_descriptor_fn,
text_encoder_fn, tokenizer, unet-config updates):

  * 'remove'           — cross-attention removed (release default)
  * 'clip_image'       — CLIP vision patch features + hid_dim->768 proj
  * 'clip_image_proj'  — CLIP pooled projection embedding (1 token)
  * 'learnable'        — learnable object-query embeddings in the UNet
  * 'none'             — SD CLIP text encoder + tokenizer (enables CFG)
  * 'dino_image'/'mae' — NotImplementedError (parity with the reference)

The CLIP encoders are frozen host-side torch modules (transformers);
their outputs stream to the device as encoder_hidden_states. The
``_load_*`` helpers are the injection points: tests replace them with
tiny random-init models built from local configs (no weight downloads),
exercising the full conditioning path.

CFG note: at sample time the reference duplicates the CLIP *image*
descriptors into both guidance halves (trainers_ldm_cond.py:1100-1107),
so uncond == cond and ``uncond + g*(cond - uncond) == cond`` — the
doubled batch is a mathematical no-op. We therefore run a single forward
for the clip_image modes; only the text mode ('none') gets true CFG with
empty-string uncond embeddings (trainers_ldm_cond.py:1113-1117).
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import numpy as np

from .unet import UNetConfig


def _load_clip_vision(model_name: str, pooled: bool):
    """Load the frozen CLIP vision tower (monkeypatchable in tests)."""
    from transformers import CLIPVisionModel, CLIPVisionModelWithProjection

    cls = CLIPVisionModelWithProjection if pooled else CLIPVisionModel
    model = cls.from_pretrained(model_name)
    model.eval()
    return model


def _load_text_encoder(pretrained_model_path: Optional[str]):
    """Load the SD CLIP text encoder (monkeypatchable in tests)."""
    from transformers import CLIPTextModel

    model = CLIPTextModel.from_pretrained(
        pretrained_model_path, subfolder="text_encoder"
    )
    model.eval()
    return model


def _load_tokenizer(pretrained_model_path: Optional[str]):
    """Load the SD CLIP tokenizer (monkeypatchable in tests)."""
    from transformers import CLIPTokenizer

    return CLIPTokenizer.from_pretrained(
        pretrained_model_path, subfolder="tokenizer"
    )


def _clip_image_fn(model, pooled: bool) -> Callable:
    """Host-side encode: [B, H, W, 3] in [0,1] -> [B, S, D] hidden states.

    Resizes to the model's native resolution and applies CLIP pixel stats
    (reference norm_resize_images, trainers_ldm_cond.py:663-675).
    """
    import torch

    clip_mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    clip_std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    size = int(model.config.image_size)

    def encode(images01: np.ndarray) -> np.ndarray:
        import torch.nn.functional as TF

        x = (np.asarray(images01, np.float32) - clip_mean) / clip_std
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = TF.interpolate(t, size=(size, size), mode="bilinear",
                           align_corners=False)
        with torch.no_grad():
            if pooled:
                out = model(t).image_embeds[:, None, :]  # [B, 1, D]
            else:
                out = model(t).last_hidden_state  # [B, S, D]
        return out.numpy()

    return encode


def get_image_descriptor_model(
    descriptor_name: str,
    pretrained_model_path: Optional[str],
    unet_cfg: UNetConfig,
) -> Tuple[Optional[Callable], Optional[Callable], Optional[Any], UNetConfig]:
    """Returns (image_descriptor_fn, text_encoder_fn, tokenizer, unet_cfg)."""
    image_fn = text_fn = tokenizer = None

    if descriptor_name == "clip_image":
        model = _load_clip_vision("openai/clip-vit-large-patch14", pooled=False)
        image_fn = _clip_image_fn(model, pooled=False)
        # patch features carry the tower's hidden size (1024 for ViT-L/14);
        # the UNet projects them to its cross_attention_dim
        unet_cfg = unet_cfg.replace(
            encoder_hid_dim=int(model.config.hidden_size),
            use_cross_attention=True,
        )
    elif descriptor_name == "clip_image_proj":
        model = _load_clip_vision("openai/clip-vit-large-patch14", pooled=True)
        image_fn = _clip_image_fn(model, pooled=True)
        # the pooled embedding is consumed directly as the (1-token)
        # context: its projection_dim (768 for ViT-L/14, == SD's
        # cross_attention_dim) defines the context width
        unet_cfg = unet_cfg.replace(
            cross_attention_dim=int(model.config.projection_dim),
            use_cross_attention=True,
        )
    elif descriptor_name == "learnable":
        unet_cfg = unet_cfg.replace(num_object_queries=128,
                                    use_cross_attention=True)
    elif descriptor_name == "remove":
        unet_cfg = unet_cfg.replace(use_cross_attention=False)
    elif descriptor_name in ("dino_image", "mae"):
        raise NotImplementedError(f"{descriptor_name} is not yet supported")
    else:
        assert descriptor_name == "none", descriptor_name
        import torch

        tokenizer = _load_tokenizer(pretrained_model_path)
        text_encoder = _load_text_encoder(pretrained_model_path)

        def text_fn(tokens: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                return text_encoder(
                    torch.as_tensor(np.asarray(tokens))
                )[0].numpy()

        unet_cfg = unet_cfg.replace(use_cross_attention=True)

    return image_fn, text_fn, tokenizer, unet_cfg
