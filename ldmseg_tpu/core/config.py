"""Hierarchical YAML config system with hydra-style groups and CLI overrides.

Mirrors the reference config surface (reference: tools/configs/config.yaml:7-12,
ldmseg/utils/config.py:73-98) without depending on hydra/omegaconf:

  * a root ``config.yaml`` with a ``defaults`` list selecting one file per
    group directory (``base/``, ``datasets/``, ``env/``, ``distributed/``),
  * dataset config merged over the base config (``cfg_base | cfg_dataset``,
    reference: tools/main_ldm.py:42),
  * dotted CLI overrides, e.g. ``base.train_kwargs.batch_size=32`` or group
    swaps like ``datasets=coco``.
"""

from __future__ import annotations

import ast
import copy
import os
from datetime import datetime
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """A dict with attribute access that recursively wraps nested dicts."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, list):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(obj):
            if isinstance(obj, dict):
                return {k: unwrap(v) for k, v in obj.items()}
            if isinstance(obj, list):
                return [unwrap(v) for v in obj]
            return obj

        return unwrap(self)


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        data = yaml.safe_load(f)
    return data or {}


def _deep_merge(base: Dict[str, Any], over: Dict[str, Any]) -> Dict[str, Any]:
    out = copy.deepcopy(base)
    for k, v in over.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _deep_merge(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(text: str) -> Any:
    """Parse a CLI override value: python/yaml literal if possible else str."""
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none", ""):
            return None
        try:
            return yaml.safe_load(text)
        except yaml.YAMLError:
            return text


def apply_overrides(cfg: Dict[str, Any], overrides: List[str]) -> Dict[str, Any]:
    """Apply ``a.b.c=value`` overrides in place; create paths as needed."""
    for ov in overrides:
        if "=" not in ov:
            raise ValueError(f"Override '{ov}' must be of the form key=value")
        key, _, value = ov.partition("=")
        parts = key.strip().split(".")
        node = cfg
        for p in parts[:-1]:
            if p not in node or not isinstance(node[p], dict):
                node[p] = {}
            node = node[p]
        node[parts[-1]] = _parse_value(value.strip())
    return cfg


def load_config(
    config_dir: str,
    overrides: Optional[List[str]] = None,
    root_name: str = "config.yaml",
) -> Config:
    """Compose the root config from its group defaults, then apply overrides.

    Group swaps (``datasets=cityscapes``) must appear before value overrides
    that touch that group; both orders work for distinct groups.
    """
    overrides = list(overrides or [])
    root = _load_yaml(os.path.join(config_dir, root_name))
    defaults = root.pop("defaults", [])

    # group swaps consume overrides of the form <group>=<name> (no dots)
    group_choice: Dict[str, str] = {}
    remaining: List[str] = []
    for ov in overrides:
        key, _, value = ov.partition("=")
        if "." not in key and os.path.isdir(os.path.join(config_dir, key)):
            group_choice[key] = value
        else:
            remaining.append(ov)

    cfg: Dict[str, Any] = {}
    for entry in defaults:
        if entry == "_self_" or entry is None:
            cfg = _deep_merge(cfg, root)
            continue
        if isinstance(entry, dict):
            (group, name), = entry.items()
        else:
            group, name = entry, None
        name = group_choice.get(group, name)
        path = os.path.join(config_dir, group, f"{name}.yaml")
        cfg[group] = _deep_merge(cfg.get(group, {}), _load_yaml(path))
    if "_self_" not in defaults:
        cfg = _deep_merge(cfg, root)

    apply_overrides(cfg, remaining)
    return Config.wrap(cfg)


def prepare_run_dirs(
    cfg: Dict[str, Any],
    root_dir: str,
    data_dir: str = "",
    run_idx: Any = None,
) -> tuple:
    """Create output/run directories and stamp a run id.

    Reference: ldmseg/utils/config.py:73-98 (prepare_config) — negative
    run_idx becomes a timestamp-based id.
    """
    output_dir = os.path.join(root_dir, str(cfg["train_db_name"]))
    os.makedirs(output_dir, exist_ok=True)

    if isinstance(run_idx, int) and run_idx < 0:
        run_idx = datetime.now().strftime("%Y%m%d_%H%M%S")
    output_dir = os.path.join(output_dir, f"run_{run_idx}")
    os.makedirs(output_dir, exist_ok=True)

    cfg["data_dir"] = data_dir
    cfg["output_dir"] = output_dir
    cfg["save_dir"] = os.path.join(output_dir, "predictions")
    os.makedirs(cfg["save_dir"], exist_ok=True)
    cfg["log_file"] = os.path.join(output_dir, "logger.txt")
    return cfg, run_idx


def enable_compile_cache(default_dir: str = "/tmp/ldmseg_jax_cache") -> None:
    """Persistent XLA compilation cache (best-effort).

    Compiles through the tunneled TPU service run minutes; caching the
    serialized executables makes repeat CLI/bench invocations near-instant.
    Override the location with JAX_COMPILATION_CACHE_DIR.
    """
    import os

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", default_dir),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception as e:  # pragma: no cover - cache is best-effort
        print(f"compile cache unavailable: {e}")
