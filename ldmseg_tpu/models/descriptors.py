"""Conditioning selector (reference: ldmseg/models/descriptors.py:67-105).

Maps the ``image_descriptors`` training flag to (image_descriptor_fn,
text_encoder_fn, tokenizer, unet-config updates):

  * 'remove'           — cross-attention removed (release default)
  * 'clip_image'       — CLIP ViT-L/14 patch features + 1024->768 proj
  * 'clip_image_proj'  — CLIP pooled projection embedding
  * 'learnable'        — learnable object-query embeddings in the UNet
  * 'none'             — SD CLIP text encoder + tokenizer (enables CFG)
  * 'dino_image'/'mae' — NotImplementedError (parity with the reference)

The CLIP encoders are frozen host-side torch modules (weights required
locally); their outputs stream to the device as encoder_hidden_states.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import numpy as np

from .unet import UNetConfig


def _clip_image_fn(model_name: str, pooled: bool) -> Callable:
    import torch
    from transformers import CLIPVisionModel, CLIPVisionModelWithProjection

    cls = CLIPVisionModelWithProjection if pooled else CLIPVisionModel
    model = cls.from_pretrained(model_name)
    model.eval()

    clip_mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    clip_std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)

    def encode(images01: np.ndarray) -> np.ndarray:
        """[B, H, W, 3] in [0,1] -> [B, S, D] hidden states."""
        import torch.nn.functional as TF

        x = (np.asarray(images01) - clip_mean) / clip_std
        t = torch.from_numpy(x.transpose(0, 3, 1, 2))
        t = TF.interpolate(t, size=(224, 224), mode="bilinear",
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
        image_fn = _clip_image_fn("openai/clip-vit-large-patch14", pooled=False)
        unet_cfg = unet_cfg.replace(encoder_hid_dim=1024, use_cross_attention=True)
    elif descriptor_name == "clip_image_proj":
        image_fn = _clip_image_fn("openai/clip-vit-large-patch14", pooled=True)
        unet_cfg = unet_cfg.replace(use_cross_attention=True)
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
        from transformers import CLIPTextModel, CLIPTokenizer

        tokenizer = CLIPTokenizer.from_pretrained(
            pretrained_model_path, subfolder="tokenizer"
        )
        text_encoder = CLIPTextModel.from_pretrained(
            pretrained_model_path, subfolder="text_encoder"
        )
        text_encoder.eval()

        def text_fn(tokens: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                return text_encoder(
                    torch.as_tensor(np.asarray(tokens))
                )[0].numpy()

        unet_cfg = unet_cfg.replace(use_cross_attention=True)

    return image_fn, text_fn, tokenizer, unet_cfg
