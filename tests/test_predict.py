"""tools/predict.py: batch panoptic inference on arbitrary images.

The reference has no standalone inference CLI (generation is only reachable
through the eval loop over a COCO-format dataset); this drives a checkpoint
snapshot over loose image files and writes panoptic maps + segments json.
"""

import glob
import importlib.util
import json
import os

import jax
import numpy as np
import pytest

from ldmseg_tpu.core import MeshSpec, make_mesh

from test_trainers import tiny_config  # noqa: F401  (helper, not fixture)

REF_EXAMPLES = "/root/reference/data/examples/coco"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_EXAMPLES), reason="bundled examples unavailable"
)


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "predict.py")
    spec = importlib.util.spec_from_file_location("predict", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_predict_runs_checkpoint_on_loose_images(tmp_path):
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    p["model_kwargs"].update(
        block_out_channels=[32, 32, 64], layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])

    # datasets only matter for training/eval; predict never touches them,
    # but the trainer used to SAVE the snapshot needs real ones
    from test_trainers import _datasets  # noqa: F401

    import shutil

    ex = tmp_path / "ex"
    shutil.copytree(REF_EXAMPLES, ex / "coco", dirs_exist_ok=True)
    ds_t, ds_v = _datasets(str(ex / "coco"), p)
    trainer = TrainerDiffusion(p, mesh=mesh, results_folder=run_dir,
                               dataset_train=ds_t, dataset_val=ds_v)
    trainer.save(epoch=0, name="best_model")

    images = sorted(glob.glob(os.path.join(REF_EXAMPLES, "rgb_images", "*")))[:2]
    img_dir = tmp_path / "imgs"
    os.makedirs(img_dir)
    for f in images:
        shutil.copy(f, img_dir)
    out_dir = str(tmp_path / "preds")

    results = _load_tool().main([
        run_dir, "--cpu", "--images", str(img_dir), "--out", out_dir,
        "--steps", "2", "--batch-size", "2", "--overlay",
        "--sampler", "dpm++",
    ])
    assert len(results) == 2
    for stem, _nsegs in results:
        pan_png = os.path.join(out_dir, f"{stem}_panoptic.png")
        seg_json = os.path.join(out_dir, f"{stem}_segments.json")
        assert os.path.exists(pan_png)
        assert os.path.exists(os.path.join(out_dir, f"{stem}_overlay.png"))
        with open(seg_json) as f:
            data = json.load(f)
        assert data["sampler"] == "dpm++"
        assert isinstance(data["segments"], list)
        # panoptic map has the original image's size
        from PIL import Image

        im = Image.open(os.path.join(str(img_dir), os.path.basename(
            [p_ for p_ in images if stem in p_][0])))
        pan = np.asarray(Image.open(pan_png))
        assert pan.shape[:2] == (im.height, im.width)
