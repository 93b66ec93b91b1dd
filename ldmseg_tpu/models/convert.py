"""Torch-checkpoint <-> Flax-param converters.

Bidirectional converters between the reference's checkpoint formats and
this framework's NHWC param trees (SURVEY §5 checkpoint/resume). Each
model's mapping is ONE declarative body (``_map_*``) executed forward by
``convert_*`` (torch state dict -> flax tree) and in reverse by
``export_*`` (flax tree -> torch state dict, see tools/export_torch.py),
so the two directions cannot drift; round-trip identity is tested
byte-exactly (tests/test_convert_sd.py).

Forward converters:

  * SD v1-4 ``unet`` / ``vae`` diffusers state dicts  -> CondUNet / SDVAE
  * reference ``ae.pt`` (GeneralVAESeg, torch Sequential indices) -> SegVAE
  * ``modify_conv_in``: the conv_in surgery for 8(+cond)-channel input with
    per-slice init modes copy/zero/mean/div/random
    (reference: ldmseg/models/unet.py:124-233)

Inputs are plain ``{name: np.ndarray}`` dicts (``torch.load(...)`` state
dicts with tensors converted via ``.numpy()``), so no torch/diffusers
dependency is needed at import time.

Transforms: conv OIHW->HWIO; conv-transpose IOHW->HWIO (our ConvTranspose2x2
stores [kh,kw,in,out]); linear (O,I)->(I,O); norm weight->scale.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from .unet import UNetConfig
from .vae_seg import SegVAEConfig


def _conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))  # OIHW -> HWIO


def _inv_conv_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (3, 2, 0, 1))  # HWIO -> OIHW


def _convT_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))  # IOHW -> HWIO(=kh,kw,in,out)


def _inv_convT_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 0, 1))  # HWIO(kh,kw,in,out) -> IOHW


def _lin_w(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


class _SD:
    """Helper turning a torch state dict into our nested tree.

    The mapping methods carry both the forward transform and its inverse so
    the same declarative mapping body (``_map_*``) drives torch->flax
    conversion here and flax->torch export in ``_ExportSD``.
    """

    def __init__(self, state: Dict[str, Any]):
        self.state = {k: np.asarray(v) for k, v in state.items()}
        self.tree: Dict[str, Any] = {}
        self.used = set()

    def conv(self, src: str, dst: str, bias: bool = True):
        self._emit(f"{src}.weight", f"{dst}/kernel", _conv_w, _inv_conv_w)
        if bias:
            self._emit(f"{src}.bias", f"{dst}/bias", None, None)

    def convT(self, src: str, dst: str):
        self._emit(f"{src}.weight", f"{dst}/kernel", _convT_w, _inv_convT_w)
        self._emit(f"{src}.bias", f"{dst}/bias", None, None)

    def linear(self, src: str, dst: str, bias: bool = True):
        self._emit(f"{src}.weight", f"{dst}/kernel", _lin_w, _lin_w)
        if bias:
            self._emit(f"{src}.bias", f"{dst}/bias", None, None)

    def norm(self, src: str, dst: str):
        self._emit(f"{src}.weight", f"{dst}/scale", None, None)
        self._emit(f"{src}.bias", f"{dst}/bias", None, None)

    def raw(self, src: str, dst: str):
        self._emit(src, dst, None, None)

    def has(self, key: str) -> bool:
        return key in self.state

    def has_mod(self, torch_key: str, flax_path: str) -> bool:
        """Presence check usable by both directions: the torch key here,
        the equivalent flax subtree in _ExportSD."""
        return torch_key in self.state

    def is_conv1x1(self, torch_key: str) -> bool:
        """Old diffusers VAE attention stored 1x1 convs (4D); export-side
        always emits the modern 2D linear form."""
        return self.state[torch_key].ndim == 4

    def _emit(self, src: str, dst: str, fn, inv):
        if src not in self.state:
            raise KeyError(f"missing checkpoint key: {src}")
        v = self.state[src]
        _set(self.tree, dst, fn(v) if fn else v)
        self.used.add(src)

    def unused(self):
        return sorted(set(self.state) - self.used)


def _get_path(tree: Dict, path: str):
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            raise KeyError(f"missing flax param path: {path}")
        node = node[p]
    return node


def _has_path(tree: Dict, path: str) -> bool:
    node = tree
    for p in path.split("/"):
        if not isinstance(node, dict) or p not in node:
            return False
        node = node[p]
    return True


class _ExportSD(_SD):
    """Runs a ``_map_*`` body in reverse: reads the flax param tree and
    emits a torch state dict (``self.out``) using the inverse transforms."""

    def __init__(self, params: Dict[str, Any]):
        super().__init__({})
        self.params = params
        self.out: Dict[str, np.ndarray] = {}

    def has_mod(self, torch_key: str, flax_path: str) -> bool:
        return _has_path(self.params, flax_path)

    def is_conv1x1(self, torch_key: str) -> bool:
        return False  # always export the modern 2D linear form

    def _emit(self, src: str, dst: str, fn, inv):
        v = np.asarray(_get_path(self.params, dst))
        self.out[src] = inv(v) if inv else v


def _convert_attention(sd: _SD, src: str, dst: str, cross: bool) -> None:
    """BasicTransformerBlock inside Transformer2D."""
    sd.norm(f"{src}.norm1", f"{dst}/norm1")
    for n in ("to_q", "to_k", "to_v"):
        sd.linear(f"{src}.attn1.{n}", f"{dst}/attn1/{n}", bias=False)
    sd.linear(f"{src}.attn1.to_out.0", f"{dst}/attn1/to_out")
    if cross:
        sd.norm(f"{src}.norm2", f"{dst}/norm2")
        for n in ("to_q", "to_k", "to_v"):
            sd.linear(f"{src}.attn2.{n}", f"{dst}/attn2/{n}", bias=False)
        sd.linear(f"{src}.attn2.to_out.0", f"{dst}/attn2/to_out")
    sd.norm(f"{src}.norm3", f"{dst}/norm3")
    sd.linear(f"{src}.ff.net.0.proj", f"{dst}/ff/proj")
    sd.linear(f"{src}.ff.net.2", f"{dst}/ff/out")


def _convert_transformer2d(sd: _SD, src: str, dst: str, cross: bool, depth: int = 1):
    sd.norm(f"{src}.norm", f"{dst}/norm")
    sd.conv(f"{src}.proj_in", f"{dst}/proj_in/conv")
    for i in range(depth):
        _convert_attention(sd, f"{src}.transformer_blocks.{i}",
                           f"{dst}/transformer_blocks_{i}", cross)
    sd.conv(f"{src}.proj_out", f"{dst}/proj_out/conv")


def _convert_resnet(sd: _SD, src: str, dst: str, temb: bool = True):
    sd.norm(f"{src}.norm1", f"{dst}/norm1")
    sd.conv(f"{src}.conv1", f"{dst}/conv1/conv")
    if temb and sd.has_mod(f"{src}.time_emb_proj.weight",
                           f"{dst}/time_emb_proj"):
        sd.linear(f"{src}.time_emb_proj", f"{dst}/time_emb_proj")
    sd.norm(f"{src}.norm2", f"{dst}/norm2")
    sd.conv(f"{src}.conv2", f"{dst}/conv2/conv")
    if sd.has_mod(f"{src}.conv_shortcut.weight", f"{dst}/conv_shortcut"):
        sd.conv(f"{src}.conv_shortcut", f"{dst}/conv_shortcut/conv")


def convert_sd_unet(
    state: Dict[str, Any], cfg: UNetConfig, return_unused: bool = False
) -> Dict[str, Any]:
    """diffusers UNet2DConditionModel state dict -> CondUNet params['params'].

    When ``cfg.use_cross_attention`` is False, attn2/norm2 weights in the
    checkpoint are intentionally dropped (reference removes those modules,
    unet.py:83-105).

    ``return_unused=True`` additionally returns the checkpoint keys that
    were NOT consumed — the fidelity contract (tests/test_convert_sd.py
    asserts it is empty against the vendored SD v1-4 manifest).
    """
    assert cfg.attention_head_dim is None, (
        "SD checkpoints bake in the 8-head split; attention_head_dim "
        "repartitioning would silently change the pretrained function"
    )
    sd = _SD(state)
    _map_sd_unet(sd, cfg)
    if return_unused:
        return sd.tree, sd.unused()
    return sd.tree


def export_sd_unet(params: Dict[str, Any], cfg: UNetConfig) -> Dict[str, np.ndarray]:
    """CondUNet params -> diffusers UNet2DConditionModel state dict (inverse
    of ``convert_sd_unet``; same declarative mapping run in reverse).

    With ``cfg.use_cross_attention`` False the exported dict has no
    attn2/norm2 keys — it loads into a reference UNet after its
    ``remove_cross_attention()`` surgery (unet.py:83-105). A modified
    conv_in (8+cond channels) exports at its actual width, matching a
    reference model after ``modify_encoder()``.
    """
    sd = _ExportSD(params)
    _map_sd_unet(sd, cfg)
    return sd.out


def _map_sd_unet(sd: _SD, cfg: UNetConfig) -> None:
    n = len(cfg.block_out_channels)

    sd.conv("conv_in", "conv_in/conv")
    sd.linear("time_embedding.linear_1", "time_embedding/linear_1")
    sd.linear("time_embedding.linear_2", "time_embedding/linear_2")

    for i in range(n):
        has_attn = i < n - 1
        for j in range(cfg.layers_per_block):
            _convert_resnet(sd, f"down_blocks.{i}.resnets.{j}",
                            f"down_tower/down_blocks_{i}_resnets_{j}")
            if has_attn:
                _convert_transformer2d(
                    sd, f"down_blocks.{i}.attentions.{j}",
                    f"down_tower/down_blocks_{i}_attentions_{j}",
                    cross=cfg.use_cross_attention,
                )
        if i < n - 1:
            sd.conv(f"down_blocks.{i}.downsamplers.0.conv",
                    f"down_tower/down_blocks_{i}_downsamplers_0/conv")

    _convert_resnet(sd, "mid_block.resnets.0", "mid_block_resnets_0")
    _convert_transformer2d(sd, "mid_block.attentions.0", "mid_block_attentions_0",
                           cross=cfg.use_cross_attention)
    _convert_resnet(sd, "mid_block.resnets.1", "mid_block_resnets_1")

    for i in range(n):
        has_attn = i > 0
        for j in range(cfg.layers_per_block + 1):
            _convert_resnet(sd, f"up_blocks.{i}.resnets.{j}",
                            f"up_blocks_{i}_resnets_{j}")
            if has_attn:
                _convert_transformer2d(
                    sd, f"up_blocks.{i}.attentions.{j}",
                    f"up_blocks_{i}_attentions_{j}",
                    cross=cfg.use_cross_attention,
                )
        if i < n - 1:
            sd.conv(f"up_blocks.{i}.upsamplers.0.conv",
                    f"up_blocks_{i}_upsamplers_0/conv")

    sd.norm("conv_norm_out", "conv_norm_out")
    sd.conv("conv_out", "conv_out/conv")


def _convert_vae_attention(sd: _SD, src: str, dst: str):
    """SD VAE mid-block attention; supports old and new diffusers naming
    (export always emits the modern >=0.15 naming and 2D linear form)."""
    if sd.has_mod(f"{src}.group_norm.weight", f"{dst}/group_norm"):
        sd.norm(f"{src}.group_norm", f"{dst}/group_norm")
        names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out.0": "to_out"}
    else:  # pre-0.15 naming
        sd.norm(f"{src}.norm", f"{dst}/group_norm")
        names = {"query": "to_q", "key": "to_k", "value": "to_v", "proj_attn": "to_out"}
    for s_name, d_name in names.items():
        if sd.is_conv1x1(f"{src}.{s_name}.weight"):  # old 1x1-conv storage
            w = sd.state[f"{src}.{s_name}.weight"][:, :, 0, 0]
            _set(sd.tree, f"{dst}/{d_name}/kernel", _lin_w(w))
            sd.used.add(f"{src}.{s_name}.weight")
            sd.raw(f"{src}.{s_name}.bias", f"{dst}/{d_name}/bias")
        else:
            sd.linear(f"{src}.{s_name}", f"{dst}/{d_name}")


def convert_sd_vae(
    state: Dict[str, Any],
    encoder_only: bool = False,
    return_unused: bool = False,
) -> Dict[str, Any]:
    """diffusers AutoencoderKL state dict -> SDVAE params['params']."""
    sd = _SD(state)
    _map_sd_vae(sd, encoder_only)
    if return_unused:
        return sd.tree, sd.unused()
    return sd.tree


def export_sd_vae(
    params: Dict[str, Any],
    encoder_only: bool = False,
    n_blocks: int = 4,
    layers_per_block: int = 2,
) -> Dict[str, np.ndarray]:
    """SDVAE params -> diffusers AutoencoderKL state dict (modern naming;
    inverse of ``convert_sd_vae``). Non-SD topologies pass their
    n_blocks/layers_per_block (SDVAEConfig fields)."""
    sd = _ExportSD(params)
    _map_sd_vae(sd, encoder_only, n_blocks, layers_per_block)
    return sd.out


def _map_sd_vae(sd: _SD, encoder_only: bool,
                n_blocks: int = 4, layers_per_block: int = 2) -> None:
    sd.conv("encoder.conv_in", "encoder/conv_in/conv")
    for i in range(n_blocks):
        for j in range(layers_per_block):
            _convert_resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                            f"encoder/down_blocks_{i}_resnets_{j}", temb=False)
        if i < n_blocks - 1:
            sd.conv(f"encoder.down_blocks.{i}.downsamplers.0.conv",
                    f"encoder/down_blocks_{i}_downsamplers_0/conv")
    _convert_resnet(sd, "encoder.mid_block.resnets.0",
                    "encoder/mid_block/resnets_0", temb=False)
    _convert_vae_attention(sd, "encoder.mid_block.attentions.0",
                           "encoder/mid_block/attentions_0")
    _convert_resnet(sd, "encoder.mid_block.resnets.1",
                    "encoder/mid_block/resnets_1", temb=False)
    sd.norm("encoder.conv_norm_out", "encoder/conv_norm_out")
    sd.conv("encoder.conv_out", "encoder/conv_out/conv")
    sd.conv("quant_conv", "quant_conv/conv")

    if not encoder_only:
        sd.conv("post_quant_conv", "post_quant_conv/conv")
        sd.conv("decoder.conv_in", "decoder/conv_in/conv")
        _convert_resnet(sd, "decoder.mid_block.resnets.0",
                        "decoder/mid_block/resnets_0", temb=False)
        _convert_vae_attention(sd, "decoder.mid_block.attentions.0",
                               "decoder/mid_block/attentions_0")
        _convert_resnet(sd, "decoder.mid_block.resnets.1",
                        "decoder/mid_block/resnets_1", temb=False)
        for i in range(n_blocks):
            for j in range(layers_per_block + 1):
                _convert_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}",
                                f"decoder/up_blocks_{i}_resnets_{j}", temb=False)
            if i < n_blocks - 1:
                sd.conv(f"decoder.up_blocks.{i}.upsamplers.0.conv",
                        f"decoder/up_blocks_{i}_upsamplers_0/conv")
        sd.norm("decoder.conv_norm_out", "decoder/conv_norm_out")
        sd.conv("decoder.conv_out", "decoder/conv_out/conv")


def seg_vae_encoder_layout(cfg: SegVAEConfig):
    """(torch Sequential index, kind, our name) for the reference seg-AE encoder.

    Sequential built at vae.py:174-244.
    """
    if cfg.skip_encoder:
        return [("", "conv", "skip_conv")]
    layout = []
    idx = 0
    layout.append((idx, "conv", "conv_in")); idx += 2  # conv, SiLU
    if cfg.resize_input:
        idx += 1  # Upsample module (no params)
    else:
        for i in range(len(cfg.block_out_channels) - 1):
            layout.append((idx, "conv", f"down_{i}_conv1")); idx += 1
            layout.append((idx, "conv", f"down_{i}_conv2")); idx += 2  # conv, SiLU
    layout.append((idx, "conv", "conv_mid_in")); idx += 1
    if cfg.num_mid_blocks > 0:
        for m in range(cfg.num_mid_blocks):
            layout.append((idx, "midblock", f"mid_{m}")); idx += 1
    else:
        idx += 1  # Identity
    layout.append((idx, "groupnorm", "norm_out")); idx += 2  # GN, SiLU
    layout.append((idx, "conv", "conv_out")); idx += 1
    return layout


def seg_vae_decoder_layout(cfg: SegVAEConfig):
    """Layout of the reference seg-AE decoder Sequential (vae.py:123-172)."""
    layout = []
    idx = 0
    layout.append((idx, "conv", "conv_in")); idx += 1
    if cfg.num_mid_blocks > 0:
        layout.append((idx, "midblock", "mid_0"))
    idx += 1  # mid block or Identity
    for i in range(cfg.num_upscalers):
        layout.append((idx, "convT", f"up_{i}_convt")); idx += 1
        layout.append((idx, "layernorm2d", f"up_{i}_norm")); idx += 2  # LN, SiLU
    layout.append((idx, "groupnorm", "norm_out")); idx += 2
    layout.append((idx, "conv", "conv_out")); idx += 1
    return layout


def _convert_torch_midblock(sd: _SD, src: str, dst: str):
    """diffusers UNetMidBlock2D without attention (2 resnets)."""
    _convert_resnet(sd, f"{src}.resnets.0", f"{dst}/resnets_0", temb=False)
    _convert_resnet(sd, f"{src}.resnets.1", f"{dst}/resnets_1", temb=False)


def convert_seg_vae(state: Dict[str, Any], cfg: SegVAEConfig) -> Dict[str, Any]:
    """Reference ``ae.pt``'s data['vae'] state dict -> SegVAE params['params'].

    Handles the 'module.' DDP prefix (vae.py:116-121).
    """
    state = {k.replace("module.", "", 1) if k.startswith("module.") else k: v
             for k, v in state.items()}
    sd = _SD(state)
    _map_seg_vae(sd, cfg)
    return sd.tree


def export_seg_vae(params: Dict[str, Any], cfg: SegVAEConfig) -> Dict[str, np.ndarray]:
    """SegVAE params -> reference ``ae.pt`` data['vae'] state dict (torch
    Sequential indices; inverse of ``convert_seg_vae``)."""
    sd = _ExportSD(params)
    _map_seg_vae(sd, cfg)
    return sd.out


def _map_seg_vae(sd: _SD, cfg: SegVAEConfig) -> None:
    for idx, kind, name in seg_vae_encoder_layout(cfg):
        src = f"encoder.{idx}" if idx != "" else "encoder"
        dst = f"encoder/{name}"
        if kind == "conv":
            sd.conv(src, f"{dst}/conv" if name != "skip_conv" else dst)
        elif kind == "groupnorm":
            sd.norm(src, dst)
        elif kind == "midblock":
            _convert_torch_midblock(sd, src, dst)

    for idx, kind, name in seg_vae_decoder_layout(cfg):
        src, dst = f"decoder.{idx}", f"decoder/{name}"
        if kind == "conv":
            sd.conv(src, f"{dst}/conv")
        elif kind == "convT":
            sd.convT(src, dst)
        elif kind == "layernorm2d":
            sd.norm(src, f"{dst}/norm")
        elif kind == "groupnorm":
            sd.norm(src, dst)
        elif kind == "midblock":
            _convert_torch_midblock(sd, src, dst)

    if sd.has_mod("codebook.weight", "codebook"):
        sd.raw("codebook.weight", "codebook")


def modify_conv_in(
    params: Dict[str, Any],
    in_channels: int = 8,
    init_mode_seg: str = "copy",
    init_mode_image: str = "copy",
    cond_channels: int = 0,
    init_mode_cond: str = "zero",
    rng: Optional[jax.Array] = None,
) -> Dict[str, Any]:
    """Rebuild conv_in for 8(+cond) input channels (unet.py:178-233).

    Operates on a converted CondUNet param tree whose conv_in kernel is the
    pretrained 4-channel HWIO kernel; returns the tree with a new
    [kh, kw, 8+cond, out] kernel, per-slice initialized.
    """
    assert in_channels in (4, 8)
    kernel = np.asarray(params["conv_in"]["conv"]["kernel"])  # [kh,kw,4,O]
    if in_channels == 4 and cond_channels == 0:
        return params
    kh, kw, c_old, out = kernel.shape
    assert c_old == 4, kernel.shape
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    fan_in = kh * kw * (in_channels + cond_channels)
    bound = float(np.sqrt(1.0 / fan_in))
    new = np.array(
        jax.random.uniform(
            rng, (kh, kw, in_channels + cond_channels, out),
            minval=-bound, maxval=bound,
        ),
        dtype=kernel.dtype,
        copy=True,
    )

    def fill(slice_idx, mode):
        if mode == "copy":
            new[:, :, slice_idx, :] = kernel
        elif mode == "div":
            # faithful to the reference bug: `.copy_(w) / 2` copies w unscaled
            # (unet.py:188,202) — div behaves exactly like copy
            new[:, :, slice_idx, :] = kernel
        elif mode == "mean":
            m = kernel.mean(axis=2, keepdims=True)
            new[:, :, slice_idx, :] = np.repeat(m, len(slice_idx), axis=2)
        elif mode == "zero":
            new[:, :, slice_idx, :] = 0.0
        elif mode == "random":
            pass
        else:
            raise NotImplementedError(f"init mode '{mode}'")

    fill(range(0, 4), init_mode_seg)
    fill(range(4, 8), init_mode_image)
    if cond_channels > 0:
        fill(range(8, 8 + cond_channels), init_mode_cond)

    out_tree = dict(params)
    out_tree["conv_in"] = {"conv": {
        "kernel": new, "bias": np.asarray(params["conv_in"]["conv"]["bias"])
    }}
    return out_tree
