"""SD-checkpoint converter structural tests.

Real SD v1-4 weights aren't downloadable here, so the test synthesizes a
diffusers-style state dict FROM our flax param structure (reversing the
converter's naming/transform rules), runs the converter, and checks the
result is tree-identical to a fresh init — this catches naming/transpose
bugs for every parameter in the real checkpoint layout.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.models.convert import convert_sd_unet, convert_sd_vae
from ldmseg_tpu.models.unet import CondUNet, UNetConfig
from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def _dotted(p):
    """module_name_0_sub_1 -> module_name.0.sub.1 (indices become dots)."""
    tokens = p.split("_")
    parts, cur = [], []
    for tok in tokens:
        if tok.isdigit():
            if cur:
                parts.append("_".join(cur))
                cur = []
            parts.append(tok)
        else:
            cur.append(tok)
    if cur:
        parts.append("_".join(cur))
    return ".".join(x for x in parts if x)


def _unet_torch_key(path):
    """Our param path -> diffusers UNet state-dict key (+ transform kind)."""
    parts = [p for p in path if p != "down_tower"]
    leaf = parts.pop()
    name = ".".join(_dotted(p) for p in parts)
    # fixups where our flat names differ from diffusers nesting
    name = name.replace("mid_block_resnets", "mid_block.resnets")
    name = name.replace("mid_block_attentions", "mid_block.attentions")
    name = name.replace("linear.1", "linear_1").replace("linear.2", "linear_2")
    name = name.replace("to_q", "to_q").replace("to_out", "to_out.0")
    name = name.replace("ff.proj", "ff.net.0.proj").replace("ff.out", "ff.net.2")
    # diffusers keeps the .conv submodule for down/up-samplers only
    if name.endswith(".conv") and "samplers" not in name:
        name = name[: -len(".conv")]

    if leaf == "kernel":
        return f"{name}.weight", "kernel"
    if leaf == "scale":
        return f"{name}.weight", "raw"
    return f"{name}.{leaf}", "raw"


def _make_state_dict(flat):
    state = {}
    for path, arr in flat.items():
        key, kind = _unet_torch_key(path)
        if kind == "kernel":
            if arr.ndim == 4:  # HWIO -> OIHW
                arr = arr.transpose(3, 2, 0, 1)
            elif arr.ndim == 2:  # (I, O) -> (O, I)
                arr = arr.transpose(1, 0)
        state[key] = np.ascontiguousarray(arr)
    return state


@pytest.mark.parametrize("cross", [False, True])
def test_convert_sd_unet_structural_roundtrip(cross):
    cfg = UNetConfig(
        in_channels=4, out_channels=4, block_out_channels=(32, 64, 64, 64),
        layers_per_block=2, num_attention_heads=2, cross_attention_dim=16,
        use_cross_attention=cross, norm_num_groups=32, dtype="float32",
    )
    model = CondUNet(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    ctx = jnp.zeros((1, 5, 16)) if cross else None
    params = model.init(jax.random.PRNGKey(0), x, jnp.array([1]), ctx)["params"]
    flat = _flatten(params)
    state = _make_state_dict(flat)

    converted = convert_sd_unet(state, cfg)
    conv_flat = _flatten(converted)
    assert set(conv_flat) == set(flat), (
        set(flat) - set(conv_flat), set(conv_flat) - set(flat)
    )
    for k in flat:
        np.testing.assert_array_equal(conv_flat[k], flat[k]), k

    # converted params actually run
    out = model.apply({"params": converted}, x, jnp.array([5]), ctx)
    assert out.shape == (1, 16, 16, 4)


def test_convert_sd_unet_drops_cross_attention_weights():
    """A full checkpoint converts into a cross-attn-free model: attn2/norm2
    weights are skipped (reference removes those modules, unet.py:83-105)."""
    cfg_full = UNetConfig(
        in_channels=4, block_out_channels=(32, 64, 64, 64), layers_per_block=2,
        num_attention_heads=2, cross_attention_dim=16,
        use_cross_attention=True, norm_num_groups=32, dtype="float32",
    )
    model_full = CondUNet(cfg_full)
    params = model_full.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 4)), jnp.array([1]),
        jnp.zeros((1, 5, 16)),
    )["params"]
    state = _make_state_dict(_flatten(params))

    cfg_removed = cfg_full.replace(use_cross_attention=False)
    converted = convert_sd_unet(state, cfg_removed)
    flat = _flatten(converted)
    assert not any("attn2" in "/".join(p) for p in flat)
    model = CondUNet(cfg_removed)
    out = model.apply({"params": converted}, jnp.zeros((1, 16, 16, 4)),
                      jnp.array([5]))
    assert out.shape == (1, 16, 16, 4)


def _vae_torch_key(path):
    parts = list(path)
    leaf = parts.pop()
    name = ".".join(_dotted(p) for p in parts)
    # plain conv wrappers drop the .conv suffix; the down/up-samplers keep it
    if name.endswith(".conv") and "samplers" not in name:
        name = name[: -len(".conv")]
    if "attentions" in name:
        name = name.replace("to_out", "to_out.0")
    if leaf == "kernel":
        return f"{name}.weight", "kernel"
    if leaf == "scale":
        return f"{name}.weight", "raw"
    return f"{name}.{leaf}", "raw"


def test_convert_sd_vae_structural_roundtrip():
    cfg = SDVAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=2,
                      norm_num_groups=4, dtype="float32")
    model = SDVAE(cfg)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        rng=jax.random.PRNGKey(1))["params"]
    flat = _flatten(params)
    state = {}
    for path, arr in flat.items():
        key, kind = _vae_torch_key(path)
        if kind == "kernel":
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.transpose(1, 0)
        state[key] = np.ascontiguousarray(arr)

    converted = convert_sd_vae(state)
    conv_flat = _flatten(converted)
    assert set(conv_flat) == set(flat), (
        sorted("/".join(p) for p in set(flat) - set(conv_flat))[:5],
        sorted("/".join(p) for p in set(conv_flat) - set(flat))[:5],
    )
    for k in flat:
        np.testing.assert_array_equal(conv_flat[k], flat[k])

    out, z, kl = model.apply({"params": converted}, jnp.zeros((1, 32, 32, 3)),
                             rng=jax.random.PRNGKey(2))
    assert out.shape == (1, 32, 32, 3)
