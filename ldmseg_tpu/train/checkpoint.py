"""Checkpoint save/resume/load via orbax.

Reference semantics (trainers_ldm_cond.py:1791-1861, trainers_ae.py:491-544):
  * 'model.pt' dict {step, epoch, vae_image, vae_semseg, unet, ema, opt, p}
    -> an orbax directory checkpoint of the same logical pieces,
  * best-PQ checkpoint 'best_model' with the PQ stored inside,
  * resume() auto-discovers the latest checkpoint in the run dir,
  * load() is the cross-stage loader (AE -> LDM) and also accepts the
    reference's torch .pt files, converted on the fly (models/convert.py).

Multi-host: orbax handles sharded arrays natively; save is a collective.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree_util.tree_map(np.asarray, tree)


# at most one outstanding async save; finalizers run before the next save,
# before any restore, and at trainer shutdown (finalize_pending_saves)
_PENDING: list = []


def finalize_pending_saves() -> None:
    """Block until outstanding async saves are durable (tmp dir swapped)."""
    while _PENDING:
        _PENDING.pop(0)()


def save_checkpoint(
    directory: str,
    payload: Dict[str, Any],
    name: str = "model",
    config: Optional[Dict[str, Any]] = None,
    block: bool = True,
) -> str:
    """Save a pytree dict (params/opt_state/step...) atomically.

    ``config`` is the run-config snapshot the reference embeds in every
    checkpoint (trainers_ldm_cond.py:1810); it holds strings/None so it is
    written as a json sidecar ``<name>.config.json`` next to the orbax dir.

    ``block=False`` overlaps the disk write with training (orbax async
    save): the call returns once the arrays are snapshotted and the
    atomic tmp-dir swap is deferred to ``finalize_pending_saves()`` —
    which also runs automatically at the start of the next save, so at
    most one save is ever in flight. The previous on-disk checkpoint
    stays valid until the new one is durable.
    """
    finalize_pending_saves()
    path = os.path.abspath(os.path.join(directory, name))
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        # orbax refuses to overwrite; write-new-then-swap
        import shutil

        tmp = path + ".tmp_new"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        ckptr.save(tmp, payload)

        def _finish(ckptr=ckptr, tmp=tmp, path=path):
            ckptr.wait_until_finished()
            shutil.rmtree(path)
            os.rename(tmp, path)
    else:
        ckptr.save(path, payload)

        def _finish(ckptr=ckptr):
            ckptr.wait_until_finished()

    if block:
        _finish()
    else:
        _PENDING.append(_finish)
    if config is not None:
        import json

        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)
    return path


def load_config_snapshot(
    directory: str, name: str = "model"
) -> Optional[Dict[str, Any]]:
    """Read back the config snapshot saved next to a checkpoint."""
    path = os.path.abspath(os.path.join(directory, name)) + ".config.json"
    if not os.path.exists(path):
        return None
    import json

    with open(path) as f:
        return json.load(f)


def restore_checkpoint(
    directory: str,
    target: Optional[Dict[str, Any]] = None,
    name: str = "model",
) -> Optional[Dict[str, Any]]:
    """Restore; returns None if absent. ``target`` gives structure/shardings."""
    finalize_pending_saves()  # never read around an in-flight save
    path = os.path.abspath(os.path.join(directory, name))
    if not os.path.exists(path):
        return None
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        return ckptr.restore(path, target=target)
    return ckptr.restore(path)


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """Load a reference .pt checkpoint into numpy dicts (requires torch)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)

    def conv(obj):
        if isinstance(obj, torch.Tensor):
            return obj.float().numpy()
        if isinstance(obj, dict):
            return {k: conv(v) for k, v in obj.items()}
        return obj

    return conv(data)
