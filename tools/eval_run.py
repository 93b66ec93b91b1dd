"""Offline PQ eval of a finished LDM run from its config snapshot.

Replays the exact configuration recorded beside a checkpoint
(`<ckpt>.config.json`, written by TrainerDiffusion.save) and runs the
generative PQ eval on the val split — the reference's eval workflow
(`tools/scripts/eval.sh:8-19`, `tools/main_ldm.py:219-232`) without
retyping every override. Combine with env knobs for serving A/Bs, e.g.
``LDMSEG_INT8=unet python tools/eval_run.py <run_dir>``.

    python tools/eval_run.py /tmp/.../run_12 [--ckpt best_model]
        [--steps 50] [--seed 42] [--max-iter N] [--batch-size B]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default="best_model",
                    help="checkpoint dir name inside run_dir")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--sampler", choices=["ddim", "dpm++"], default=None,
                    help="override sampling_kwargs.sampler for the A/B "
                         "(dpm++ = DPM-Solver++(2M), fewer UNet evals)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ldmseg_tpu.core import MeshSpec, make_mesh
    from ldmseg_tpu.core.config import enable_compile_cache

    enable_compile_cache()

    cfg_path = os.path.join(args.run_dir, f"{args.ckpt}.config.json")
    with open(cfg_path) as f:
        p = json.load(f)
    # the snapshot recorded train-time dirs; keep outputs beside the run
    p["output_dir"] = args.run_dir
    p["save_dir"] = os.path.join(args.run_dir, "predictions")
    p["eval_only"] = True
    if args.batch_size is not None:
        p["eval_kwargs"]["batch_size"] = args.batch_size
    if args.sampler is not None:
        p["sampling_kwargs"]["sampler"] = args.sampler
    p["eval_kwargs"]["num_workers"] = 0

    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    print(f"mesh: {mesh}; ckpt: {args.ckpt}; steps: {args.steps}; "
          f"sampler: {p['sampling_kwargs'].get('sampler', 'ddim')}; "
          f"int8: {os.environ.get('LDMSEG_INT8', '0')}")

    from ldmseg_tpu.models.descriptors import get_image_descriptor_model
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion, build_unet_config

    image_fn, text_encoder_fn, tokenizer, unet_cfg = get_image_descriptor_model(
        p["train_kwargs"].get("image_descriptors", "remove"),
        p.get("pretrained_model_path"),
        build_unet_config(p),
    )
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=args.run_dir, unet_cfg=unet_cfg,
        tokenizer=tokenizer, text_encoder_fn=text_encoder_fn,
        image_descriptor_fn=image_fn,
        seed=p["sampling_kwargs"].get("seed", 0),
    )
    trainer.load(os.path.join(args.run_dir, args.ckpt), load_vae=True)
    results = trainer.compute_metrics(
        metrics=["pq"], threshold_output=True, save_images=True,
        seed=args.seed, max_iter=args.max_iter,
        num_inference_steps=args.steps,
    )
    print(json.dumps({"results": results.get("pq"), "ckpt": args.ckpt,
                      "steps": args.steps,
                      "int8": os.environ.get("LDMSEG_INT8", "0")}))


if __name__ == "__main__":
    main()
