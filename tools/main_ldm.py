"""Stage-2 CLI: train/evaluate the conditional latent diffusion model.

TPU-native replacement for the reference tools/main_ldm.py (and its SLURM
variant tools/main_ldm_slurm.py — multi-host launch is just
`distributed.multihost=True` + one process per host; rank/world-size
derivation, mp.spawn and DDP wrapping all disappear into jax.distributed +
the device mesh).
"""

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from ldmseg_tpu.core import MeshSpec, load_config, make_mesh, prepare_run_dirs
from ldmseg_tpu.utils.logging import Logger


def main(argv=None):
    import jax

    from ldmseg_tpu.core.config import enable_compile_cache
    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    cfg_dir = os.path.join(os.path.dirname(__file__), "configs")
    cfg = load_config(cfg_dir, overrides=argv)

    p = dict(cfg["base"])
    p.update(cfg["datasets"])
    root_dir = os.path.join(cfg["env"]["root_dir"], cfg["setup"])
    p, run_idx = prepare_run_dirs(p, root_dir, cfg["env"]["data_dir"],
                                  run_idx=cfg.get("run_idx", -1))
    p["name"] = f"{p['train_db_name']}_{run_idx}"

    if cfg.get("debug"):
        p["train_kwargs"]["num_workers"] = 0
        p["eval_kwargs"]["num_workers"] = 0

    dist = cfg.get("distributed", {})
    if dist.get("multihost"):
        jax.distributed.initialize()
    if cfg.get("debug"):
        # debug mode: single device, no data workers (main_ldm.py:53-58)
        mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    else:
        mesh = make_mesh(MeshSpec(**dist.get("mesh", {})))

    if jax.process_index() == 0:
        sys.stdout = Logger(os.path.join(p["output_dir"],
                                         f"log_file_host_{jax.process_index()}.txt"))
    print(json.dumps({k: v for k, v in p.items() if k != "name"},
                     indent=2, sort_keys=True, default=str))
    print(f"mesh: {mesh}")

    from ldmseg_tpu.models.descriptors import get_image_descriptor_model
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion, build_unet_config

    # conditioning selector (reference main_ldm.py:155, descriptors.py:67):
    # may rewrite the UNet config (cross-attn on, context dims)
    image_fn, text_encoder_fn, tokenizer, unet_cfg = get_image_descriptor_model(
        p["train_kwargs"].get("image_descriptors", "remove"),
        p.get("pretrained_model_path"),
        build_unet_config(p),
    )

    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=p["output_dir"], unet_cfg=unet_cfg,
        tokenizer=tokenizer, text_encoder_fn=text_encoder_fn,
        image_descriptor_fn=image_fn,
        seed=p["sampling_kwargs"].get("seed", 0),
    )
    trainer.resume(load_vae=True)
    if p.get("load_path"):
        trainer.load(p["load_path"], load_vae=True)

    if p.get("eval_only"):
        trainer.compute_metrics(
            metrics=["pq"], threshold_output=True, save_images=True, seed=42,
            num_inference_steps=trainer.num_inference_steps,
        )
        return

    trainer.train_loop()


if __name__ == "__main__":
    main()
