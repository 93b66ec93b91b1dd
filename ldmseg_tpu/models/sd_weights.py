"""Load diffusers-layout model directories without the diffusers package.

The reference pulls CompVis/stable-diffusion-v1-4 via from_pretrained
(tools/main_ldm.py:137,146); here a local snapshot directory (subfolders
vae/ unet/ with *.safetensors or *.bin) is read directly into numpy dicts
for the converters in convert.py.
"""

from __future__ import annotations

import glob
import os
from typing import Dict, Optional

import numpy as np


def load_diffusers_state(model_dir: str) -> Optional[Dict[str, np.ndarray]]:
    """Read a diffusers model subfolder into {param_name: ndarray}."""
    if not os.path.isdir(model_dir):
        return None
    safetensor_files = sorted(glob.glob(os.path.join(model_dir, "*.safetensors")))
    if safetensor_files:
        from safetensors.numpy import load_file

        state: Dict[str, np.ndarray] = {}
        for f in safetensor_files:
            state.update(load_file(f))
        return {k: np.asarray(v, dtype=np.float32) for k, v in state.items()}

    bin_files = sorted(glob.glob(os.path.join(model_dir, "*.bin"))) + sorted(
        glob.glob(os.path.join(model_dir, "*.pt"))
    )
    if bin_files:
        import torch

        state = {}
        for f in bin_files:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
        return state
    return None
