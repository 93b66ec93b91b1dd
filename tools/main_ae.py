"""Stage-1 CLI: train/evaluate the shallow panoptic auto-encoder.

TPU-native replacement for the reference tools/main_ae.py: no mp.spawn /
process-per-GPU — one process per host, SPMD over the device mesh. CLI
overrides use the same dotted syntax as the reference's hydra flags:

    python tools/main_ae.py datasets=coco base.train_kwargs.batch_size=8 \
        base.optimizer_kwargs.lr=1e-4 debug=True
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
    p.update(cfg["datasets"])  # dataset config overrides base (main_ldm.py:42)
    root_dir = os.path.join(cfg["env"]["root_dir"], cfg["setup"])
    p, run_idx = prepare_run_dirs(p, root_dir, cfg["env"]["data_dir"],
                                  run_idx=cfg.get("run_idx", -1))
    name = f"{p['train_db_name']}_{run_idx}"
    p["name"] = name

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

    from ldmseg_tpu.train.trainer_ae import TrainerAE

    trainer = TrainerAE(p, mesh=mesh, results_folder=p["output_dir"])
    trainer.resume()
    if p.get("load_path"):
        trainer.load(p["load_path"])

    if p.get("eval_only"):
        trainer.compute_metrics(["miou", "pq"], threshold_output=True,
                                save_images=True)
        return

    trainer.train_loop()


if __name__ == "__main__":
    main()
