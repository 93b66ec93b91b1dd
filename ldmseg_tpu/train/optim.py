"""Optimizer factory with detectron2-style param groups, TPU-native.

Reference behaviors (ldmseg/trainers/optim.py, models/unet.py:107-119,235-279)
map onto optax transforms over path-labeled param subsets:

  * freezing (norm layers / time_embedding / conv_in_img / image down tower)
    -> optax.multi_transform with set_to_zero for 'frozen',
  * weight_decay_norm override for norm params, wd=0 for object_queries
    -> masked add_decayed_weights,
  * lr_factor_func (conv_in./down_blocks. backbone multiplier)
    -> a per-leaf update scaling transform,
  * ZeRO-1 -> nothing to do here: optimizer state inherits the params'
    fsdp sharding (core/mesh.shard_params_fsdp), which IS the ZeRO layout.

adamw / adam / sgd supported ('adamw8bit' maps to adamw: bf16+sharding makes
8-bit states unnecessary on TPU, SURVEY §2.9).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


@dataclass(frozen=True)
class OptimConfig:
    name: str = "adamw"
    lr: float = 1e-4
    betas: Tuple[float, float] = (0.9, 0.999)
    weight_decay: float = 0.0
    weight_decay_norm: Optional[float] = 0.0
    clip_grad: float = 0.0
    backbone_multiplier: float = 1.0   # lr factor for conv_in./down_blocks.
    freeze_layers: Tuple[str, ...] = ()
    momentum: float = 0.9              # sgd only
    accumulate: int = 1


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def _is_norm_param(path) -> bool:
    """Norm params are the only ones named 'scale' (plus their sibling bias)."""
    keys = [str(getattr(k, "key", k)) for k in path]
    if not keys:
        return False
    leaf = keys[-1]
    if leaf == "scale":
        return True
    if leaf == "bias" and len(keys) >= 2:
        parent = keys[-2]
        norm_markers = ("norm", "ln", "gn")
        return any(m in parent.lower() for m in norm_markers)
    return False


def param_labels(params: Any, freeze_layers: Sequence[str] = ()) -> Any:
    """Label each param 'frozen' or 'train' following unet.py:235-279."""

    def label(path, leaf):
        p = _path_str(path)
        if "norm" in freeze_layers and _is_norm_param(path):
            return "frozen"
        if "time_embedding" in freeze_layers and p.startswith("time_embedding"):
            return "frozen"
        if "conv_in" in freeze_layers and p.startswith("conv_in_img"):
            return "frozen"
        if "down_blocks" in freeze_layers and p.startswith("down_tower_img"):
            return "frozen"
        return "train"

    return jax.tree_util.tree_map_with_path(label, params)


def _scale_by_tree(factors: Any) -> optax.GradientTransformation:
    """Multiply each update leaf by a per-leaf static factor."""

    def init(params):
        del params
        return optax.EmptyState()

    def update(updates, state, params=None):
        del params
        new = jax.tree_util.tree_map(lambda u, f: u * f, updates, factors)
        return new, state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    params: Any,
    cfg: OptimConfig,
    lr_schedule: Callable,
) -> optax.GradientTransformation:
    labels = param_labels(params, cfg.freeze_layers)

    # weight-decay masks (train params only; norm params use weight_decay_norm;
    # object_queries always wd=0 — optim.py:68)
    def wd_mask_fn(path, leaf):
        p = _path_str(path)
        if p.startswith("object_queries"):
            return False
        return not _is_norm_param(path)

    def wd_norm_mask_fn(path, leaf):
        return _is_norm_param(path)

    wd_mask = jax.tree_util.tree_map_with_path(wd_mask_fn, params)
    wd_norm_mask = jax.tree_util.tree_map_with_path(wd_norm_mask_fn, params)

    chain = []
    if cfg.clip_grad and cfg.clip_grad > 0:
        chain.append(optax.clip_by_global_norm(cfg.clip_grad))
    name = cfg.name.lower()
    if name in ("adamw", "adam", "adamw8bit"):
        chain.append(optax.scale_by_adam(b1=cfg.betas[0], b2=cfg.betas[1]))
        if name != "adam" and cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask))
        if name != "adam" and cfg.weight_decay_norm:
            chain.append(
                optax.add_decayed_weights(cfg.weight_decay_norm, mask=wd_norm_mask)
            )
    elif name == "sgd":
        chain.append(optax.trace(decay=cfg.momentum))
        if cfg.weight_decay:
            chain.append(optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask))
    else:
        raise NotImplementedError(f"optimizer '{cfg.name}'")

    if cfg.backbone_multiplier != 1.0:
        # unet.py:107-119: conv_in.* and down_blocks.* get a lr factor
        def factor(path, leaf):
            p = _path_str(path)
            if p.startswith("conv_in") or p.startswith("down_tower"):
                return cfg.backbone_multiplier
            return 1.0

        factors = jax.tree_util.tree_map_with_path(factor, params)
        chain.append(_scale_by_tree(factors))

    chain.append(optax.scale_by_learning_rate(lr_schedule))
    tx = optax.chain(*chain)
    tx = optax.multi_transform({"train": tx, "frozen": optax.set_to_zero()}, labels)
    if cfg.accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accumulate)
    return tx
