"""tools/eval_run.py: offline PQ eval replayed from a config snapshot.

A tiny LDM run (non-SD structural dims carried in model_kwargs /
sd_vae_kwargs) is saved, then the tool rebuilds trainer + models purely
from the snapshot and runs the generative eval — the reference eval.sh
workflow (tools/main_ldm.py:219-232) without retyping overrides."""

import importlib.util
import os
import shutil

import jax
import pytest

from ldmseg_tpu.core import MeshSpec, make_mesh

from test_trainers import tiny_config  # noqa: F401  (helper, not fixture)

REF_EXAMPLES = "/root/reference/data/examples/coco"


@pytest.fixture(scope="module")
def examples_root(tmp_path_factory):
    dst = tmp_path_factory.mktemp("ex")
    shutil.copytree(REF_EXAMPLES, dst / "coco", dirs_exist_ok=True)
    return str(dst / "coco")


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools", "eval_run.py")
    spec = importlib.util.spec_from_file_location("eval_run", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_eval_run_replays_snapshot(tmp_path, examples_root):
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    p["data_dir"] = examples_root
    # tiny structural dims ride in the snapshot so eval_run rebuilds the
    # same models without explicit cfg objects
    p["model_kwargs"].update(
        block_out_channels=[32, 32, 64], layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    trainer = TrainerDiffusion(p, mesh=mesh, results_folder=run_dir)
    trainer.save(epoch=0, name="best_model")

    out = _load_tool().main([
        run_dir, "--cpu", "--ckpt", "best_model", "--steps", "2",
        "--max-iter", "1", "--batch-size", "2", "--seed", "0",
    ])
    assert out is None  # ran to completion; PQ of a random net may be 0
    assert os.path.isdir(os.path.join(run_dir, "best_model"))


def test_eval_run_multi_seed_and_thresholds(tmp_path, examples_root, capsys):
    """--seeds runs one eval per noise seed and prints a mean/std summary;
    --mask-th/--overlap-th override the snapshot's postprocess thresholds
    (the reference's release-eval config, eval.sh:8-19)."""
    import json

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    p["data_dir"] = examples_root
    p["model_kwargs"].update(
        block_out_channels=[32, 32, 64], layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    trainer = TrainerDiffusion(p, mesh=mesh, results_folder=run_dir)
    trainer.save(epoch=0, name="best_model")

    _load_tool().main([
        run_dir, "--cpu", "--ckpt", "best_model", "--steps", "2",
        "--max-iter", "1", "--batch-size", "2", "--seeds", "0,1",
        "--mask-th", "0.9", "--overlap-th", "0.9",
    ])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    per_seed = [ln for ln in lines if "results" in ln]
    summary = [ln for ln in lines if "pq_mean" in ln]
    assert [ln["seed"] for ln in per_seed] == [0, 1]
    assert len(summary) == 1 and summary[0]["seeds"] == [0, 1]
    assert len(summary[0]["pq_per_seed"]) == 2
    # threshold overrides are recorded in every row (auditable cells)
    assert all(ln["mask_th"] == 0.9 and ln["overlap_th"] == 0.9
               for ln in per_seed + summary)


def test_gate_matrix_one_process_cells(tmp_path, examples_root, capsys):
    """tools/gate_matrix.py runs several (sampler, steps) cells at the
    SAME seeds in one process (paired design; fresh jit wrapper when the
    sampler changes so a stale cached program can't serve a dpm++ cell
    with ddim code)."""
    import json

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    p["data_dir"] = examples_root
    p["model_kwargs"].update(
        block_out_channels=[32, 32, 64], layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    p["eval_kwargs"]["batch_size"] = 2
    p["holdout"] = 2  # tiny held-out val (2 images) for the base cells
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    trainer = TrainerDiffusion(p, mesh=mesh, results_folder=run_dir)
    trainer.save(epoch=0, name="best_model")

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "gate_matrix.py")
    spec = importlib.util.spec_from_file_location("gate_matrix", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_jsonl = str(tmp_path / "gates.jsonl")
    mod.main([run_dir, "--cpu", "--ckpt", "best_model", "--seeds", "0,1",
              "--cells", "ddim:2,dpm++:2",
              "--variant-cells", "full16:ddim:2,classaware3:ddim:2",
              "--out", out_jsonl])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    per_seed = [ln for ln in lines if "cell" in ln]
    summaries = [ln for ln in lines if "pq_mean" in ln]
    assert [ln["cell"] for ln in per_seed] == (
        ["ddim@2"] * 2 + ["dpm++@2"] * 2
        + ["full16/ddim@2"] * 2 + ["classaware3/ddim@2"] * 2
    )
    assert [ln["seed"] for ln in per_seed] == [0, 1] * 4  # paired seeds
    assert [s["sampler"] for s in summaries] == ["ddim", "dpm++",
                                                 "ddim", "ddim"]
    # variant tags: full16 overrides holdout to 0; classaware flags itself
    assert summaries[2]["holdout"] == 0
    assert summaries[3]["class_aware"] is True
    assert summaries[3]["synthetic_categories"] == 3
    with open(out_jsonl) as f:
        assert len(f.readlines()) == 4


def test_calibrate_postprocess_sweep(tmp_path, examples_root, capsys):
    """tools/calibrate_postprocess.py samples once per seed and sweeps the
    postprocess thresholds on the cached logits (release-config collapse
    attribution, VERDICT r3 Missing #3)."""
    import json

    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion

    p = tiny_config(tmp_path, size=64)
    p["data_dir"] = examples_root
    p["model_kwargs"].update(
        block_out_channels=[32, 32, 64], layers_per_block=1,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
    )
    p["sd_vae_kwargs"] = {"block_out_channels": [8, 8], "layers_per_block": 1,
                          "norm_num_groups": 4, "latent_channels": 4}
    p["eval_kwargs"]["batch_size"] = 2
    run_dir = str(tmp_path / "run")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    trainer = TrainerDiffusion(p, mesh=mesh, results_folder=run_dir)
    trainer.save(epoch=0, name="best_model")

    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "calibrate_postprocess.py")
    spec = importlib.util.spec_from_file_location("calibrate_postprocess", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main([run_dir, "--cpu", "--ckpt", "best_model", "--steps", "2",
              "--seeds", "0,1", "--grid", "0.5,0.9"])
    lines = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    hist = [ln for ln in lines if "confidence_histogram" in ln]
    cells = [ln for ln in lines if "mask_th" in ln]
    assert len(hist) == 1
    # histogram is a distribution over occupied bins
    assert abs(sum(hist[0]["confidence_histogram"].values()) - 1.0) < 0.02
    assert hist[0]["mass_ge_0.9"] <= hist[0]["mass_ge_0.5"] + 1e-9
    # paired sweep: overlap_th rides mask_th; each cell is a 2-seed mean
    assert [(c["mask_th"], c["overlap_th"]) for c in cells] == \
        [(0.5, 0.5), (0.9, 0.9)]
    assert all(len(c["pq_per_seed"]) == 2 for c in cells)
