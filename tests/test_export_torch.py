"""tools/export_torch.py: orbax checkpoint -> reference .pt round trip.

A tiny LDM run is saved, exported to the reference's ldmseg.pt layout, and
re-imported through the torch-.pt load path — every tensor must survive
byte-exactly (the exporters are the declarative inverse of the import
converters, ldmseg_tpu/models/convert.py)."""

import importlib.util
import os
import shutil

import jax
import numpy as np
import pytest

from ldmseg_tpu.core import MeshSpec, make_mesh

from test_trainers import _datasets, tiny_config  # noqa: F401

REF_EXAMPLES = "/root/reference/data/examples/coco"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="bundled examples unavailable"
)


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "export_torch.py")
    spec = importlib.util.spec_from_file_location("export_torch", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _flat(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flat(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = np.asarray(v)
    return out


def test_export_ldm_checkpoint_roundtrip(tmp_path):
    import torch

    from ldmseg_tpu.models.convert import convert_sd_unet, convert_seg_vae
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    # tiny structural dims ride in the snapshot (same mechanism as
    # tools/eval_run.py) so the exporter rebuilds the exact model configs
    p["model_kwargs"].update(
        block_out_channels=[32, 64, 64, 64], layers_per_block=2,
        num_attention_heads=2, cross_attention_dim=16, norm_num_groups=32,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    ex = tmp_path / "ex"
    shutil.copytree(REF_EXAMPLES, ex / "coco", dirs_exist_ok=True)
    ds_t, ds_v = _datasets(str(ex / "coco"), p)
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=run_dir,
        dataset_train=ds_t, dataset_val=ds_v,
    )
    trainer.save(epoch=3, name="model")

    out_pt = str(tmp_path / "ldmseg.pt")
    _load_tool().main([run_dir, "--ckpt", "model", "--out", out_pt])
    data = torch.load(out_pt, map_location="cpu", weights_only=False)
    assert data["epoch"] == 3
    assert set(data) >= {"unet", "vae_semseg", "vae_image", "p"}

    # re-import through the converters: byte-exact vs the live trainer params
    unet_np = {k: v.numpy() for k, v in data["unet"].items()}
    back = _flat(convert_sd_unet(unet_np, trainer.unet_cfg))
    orig = _flat(jax.device_get(trainer.state.params))
    assert set(back) == set(orig)
    for k in orig:
        np.testing.assert_array_equal(back[k], orig[k], err_msg=str(k))

    seg_np = {k: v.numpy() for k, v in data["vae_semseg"].items()}
    back_seg = _flat(convert_seg_vae(seg_np, trainer.vae_cfg))
    orig_seg = _flat(jax.device_get(trainer.frozen["seg_vae"]))
    assert set(back_seg) == set(orig_seg)
    for k in orig_seg:
        np.testing.assert_array_equal(back_seg[k], orig_seg[k], err_msg=str(k))
