"""Export a trained orbax checkpoint back to the reference's .pt format.

The migration path OUT of this framework: a stage-1 run exports to an
``ae.pt``-shaped file (``{'vae': state_dict, 'step', 'epoch'}``,
reference trainers_ae.py:491-505) and a stage-2 run to an
``ldmseg.pt``-shaped file (``{'unet', 'vae_semseg', 'vae_image', 'step',
'epoch', 'p'}``, trainers_ldm_cond.py:1791-1814), loadable by the
reference after its usual ``remove_cross_attention`` / ``modify_encoder``
surgery. Conversion is the exact inverse of the import converters (same
declarative mapping, ldmseg_tpu/models/convert.py; round-trip identity
tested byte-exactly).

    python tools/export_torch.py <run_dir> --ckpt best_model --out ldmseg.pt
"""

import argparse
import json
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default="model")
    ap.add_argument("--out", required=True, help="output .pt path")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")  # pure host-side tensor shuffle

    import numpy as np
    import torch

    from ldmseg_tpu.models.convert import (
        export_sd_unet,
        export_sd_vae,
        export_seg_vae,
    )
    from ldmseg_tpu.train.checkpoint import restore_checkpoint

    with open(os.path.join(args.run_dir, f"{args.ckpt}.config.json")) as f:
        p = json.load(f)
    data = restore_checkpoint(args.run_dir, name=args.ckpt)
    assert data is not None, f"no checkpoint {args.ckpt!r} in {args.run_dir}"

    def to_torch(state):
        return {k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in state.items()}

    from ldmseg_tpu.train.trainer_ae import build_seg_vae_config

    vae_cfg = build_seg_vae_config(p)

    if "unet" in data:  # stage-2 LDM checkpoint
        from ldmseg_tpu.train.trainer_ldm import build_unet_config

        unet_cfg = build_unet_config(p)
        sd_vae_params = data["vae_image"]
        encoder_only = "decoder" not in sd_vae_params
        sdk = p.get("sd_vae_kwargs") or {}
        n_blocks = len(sdk.get("block_out_channels", (0,) * 4))
        payload = {
            "step": int(data.get("step", 0)),
            "epoch": int(data.get("epoch", 0)),
            "unet": to_torch(export_sd_unet(data["unet"], unet_cfg)),
            "vae_semseg": to_torch(export_seg_vae(data["vae_semseg"], vae_cfg)),
            "vae_image": to_torch(export_sd_vae(
                sd_vae_params, encoder_only=encoder_only, n_blocks=n_blocks,
                layers_per_block=sdk.get("layers_per_block", 2))),
            "p": p,
        }
    else:  # stage-1 AE checkpoint
        payload = {
            "step": int(data.get("step", 0)),
            "epoch": int(data.get("epoch", 0)),
            "vae": to_torch(export_seg_vae(data["params"], vae_cfg)),
            "p": p,
        }

    torch.save(payload, args.out)
    n = sum(v.numel() for k in ("unet", "vae_semseg", "vae_image", "vae")
            if k in payload for v in payload[k].values())
    print(f"wrote {args.out} ({n:,} params)")
    return args.out


if __name__ == "__main__":
    main()
