"""First-contact validation of a REAL diffusers checkpoint directory.

The SD-v1-4 converters (ldmseg_tpu/models/convert.py) were written against
a vendored key/shape manifest derived from diffusers source
(tests/data/sd_v1_4_*_manifest.json, checksummed to the published param
totals) — but no real weight file has ever been available in this
environment (zero egress). The day a snapshot of
CompVis/stable-diffusion-v1-4 lands (the reference pulls it via
from_pretrained, /root/reference/tools/main_ldm.py:137-146), this tool
makes fidelity a one-command check:

    python tools/validate_sd_dir.py /path/to/stable-diffusion-v1-4

It reports, per subfolder (vae/, unet/):
  1. key drift vs the vendored manifest (missing / extra / shape mismatch),
  2. converter consumption: every real key consumed, none silently dropped
     (other than the documented cross-attention removal set),
  3. the emitted flax tree matches the randomly-initialized model tree
     (same structure + shapes), so the converted params actually load.

Exit code 0 = converters are faithful to the real file; nonzero with a
drift report otherwise.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _tree_paths(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_tree_paths(v, p))
        else:
            out[p] = tuple(getattr(v, "shape", ()))
    return out


def _diff_manifest(state, manifest, label):
    real = {k: tuple(v.shape) for k, v in state.items()}
    want = {k: tuple(s) for k, s in manifest.items()}
    missing = sorted(set(want) - set(real))
    extra = sorted(set(real) - set(want))
    mismatched = sorted(
        k for k in set(real) & set(want) if real[k] != want[k]
    )
    ok = not (missing or extra or mismatched)
    print(f"[{label}] manifest diff: {len(real)} real keys vs "
          f"{len(want)} manifest keys -> "
          f"{'MATCH' if ok else 'DRIFT'}")
    for name, keys in (("missing from real", missing),
                       ("extra in real", extra),
                       ("shape mismatch", mismatched)):
        for k in keys[:20]:
            detail = (f" real={real.get(k)} manifest={want.get(k)}"
                      if name == "shape mismatch" else "")
            print(f"  {name}: {k}{detail}")
        if len(keys) > 20:
            print(f"  ... and {len(keys) - 20} more {name}")
    return ok


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("model_dir", help="diffusers snapshot dir with vae/ unet/")
    ap.add_argument("--cond-channels", type=int, default=0,
                    help="validate conv_in surgery for this many cond chans")
    args = ap.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ldmseg_tpu.models.convert import (
        convert_sd_unet, convert_sd_vae, modify_conv_in,
    )
    from ldmseg_tpu.models.sd_weights import load_diffusers_state
    from ldmseg_tpu.models.unet import CondUNet, UNetConfig
    from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig

    manifest_dir = os.path.join(os.path.dirname(__file__), "..",
                                "tests", "data")
    ok = True

    # ---- VAE ---------------------------------------------------------------
    vae_state = load_diffusers_state(os.path.join(args.model_dir, "vae"))
    if vae_state is None:
        print("[vae] no weight files found — skipped")
    else:
        with open(os.path.join(manifest_dir, "sd_v1_4_vae_manifest.json")) as f:
            ok &= _diff_manifest(vae_state, json.load(f), "vae")
        tree, unused = convert_sd_vae(vae_state, return_unused=True)
        if unused:
            ok = False
            print(f"[vae] converter left {len(unused)} keys unconsumed: "
                  f"{sorted(unused)[:10]}")
        model_tree = SDVAE(SDVAEConfig()).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
            rng=jax.random.PRNGKey(0))["params"]
        got, want = _tree_paths(tree), _tree_paths(model_tree)
        drift = {k for k in set(got) ^ set(want)} | {
            k for k in set(got) & set(want) if got[k] != want[k]}
        if drift:
            ok = False
            print(f"[vae] converted tree != model tree: {sorted(drift)[:10]}")
        else:
            print(f"[vae] converted tree loads into SDVAE ({len(got)} leaves)")

    # ---- UNet --------------------------------------------------------------
    unet_state = load_diffusers_state(os.path.join(args.model_dir, "unet"))
    if unet_state is None:
        print("[unet] no weight files found — skipped")
    else:
        with open(os.path.join(manifest_dir,
                               "sd_v1_4_unet_manifest.json")) as f:
            ok &= _diff_manifest(unet_state, json.load(f), "unet")
        cfg = UNetConfig(in_channels=4, out_channels=4,
                         use_cross_attention=False)
        tree, unused = convert_sd_unet(unet_state, cfg, return_unused=True)
        # dropping attn2/norm2 is the documented cross-attention removal
        # (reference unet.py:83-105); anything else unconsumed is a bug
        bad = [k for k in unused if ".attn2." not in k and ".norm2." not in k]
        if bad:
            ok = False
            print(f"[unet] converter left {len(bad)} non-cross-attn keys "
                  f"unconsumed: {sorted(bad)[:10]}")
        else:
            print(f"[unet] all keys consumed "
                  f"({len(unused)} cross-attn keys dropped by design)")
        model_tree = CondUNet(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 4)),
            jnp.array([1]))["params"]
        got, want = _tree_paths(tree), _tree_paths(model_tree)
        drift = {k for k in set(got) ^ set(want)} | {
            k for k in set(got) & set(want) if got[k] != want[k]}
        if drift:
            ok = False
            print(f"[unet] converted tree != model tree: {sorted(drift)[:10]}")
        else:
            print(f"[unet] converted tree loads into CondUNet "
                  f"({len(got)} leaves)")
        if args.cond_channels:
            tree = modify_conv_in(
                tree, in_channels=8, cond_channels=args.cond_channels,
                rng=jax.random.PRNGKey(0))
            w = _tree_paths(tree)["conv_in/conv/kernel"]
            print(f"[unet] conv_in surgery ok -> kernel {w}")

    print("VALIDATION " + ("PASSED" if ok else "FAILED"))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
