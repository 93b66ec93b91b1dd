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
    ap.add_argument("--seeds", default=None,
                    help="comma-separated noise seeds; runs one eval per "
                         "seed in a single process (the sampler is already "
                         "compiled after the first) and prints a summary "
                         "line with PQ mean/std — quantifies noise-seed "
                         "variance on small val sets")
    ap.add_argument("--max-iter", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    # postprocess-threshold overrides for the reference's "release eval"
    # configuration (mask_th 0.9, overlap_th 0.9 — /root/reference/
    # tools/scripts/eval.sh:8-19; "boosted" variants README.md:148)
    ap.add_argument("--mask-th", type=float, default=None)
    ap.add_argument("--overlap-th", type=float, default=None)
    ap.add_argument("--count-th", type=int, default=None)
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    ap.add_argument("--sampler", choices=["ddim", "dpm++"], default=None,
                    help="override sampling_kwargs.sampler for the A/B "
                         "(dpm++ = DPM-Solver++(2M), fewer UNet evals)")
    # dataset-variant overrides (examples proxy only): re-evaluate a trained
    # run on a different split protocol than it trained with, e.g. held-out
    # vs full-16 PQ side by side, or the synthetic-category class-aware eval
    ap.add_argument("--holdout", type=int, default=None,
                    help="override datasets holdout (0 = full 16 images; "
                         "N = last N sorted images as val)")
    ap.add_argument("--synthetic-categories", type=int, default=None,
                    help="override datasets synthetic_categories (2 or 3 "
                         "area-bucket classes on the examples proxy)")
    ap.add_argument("--class-aware", action="store_true",
                    help="run the class-aware PanopticEvaluator (reference "
                         "panoptic_evaluation.py:60-73) instead of agnostic; "
                         "requires synthetic_categories>=2 on examples")
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
    for k, v in (("mask_th", args.mask_th), ("overlap_th", args.overlap_th),
                 ("count_th", args.count_th)):
        if v is not None:
            p["eval_kwargs"][k] = v
    p["eval_kwargs"]["num_workers"] = 0
    if args.holdout is not None:
        p["holdout"] = args.holdout
    if args.synthetic_categories is not None:
        p["synthetic_categories"] = args.synthetic_categories

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
    seeds = ([int(s) for s in args.seeds.split(",")] if args.seeds
             else [args.seed])
    tags = {"ckpt": args.ckpt, "steps": args.steps,
            "sampler": p["sampling_kwargs"].get("sampler", "ddim"),
            "mask_th": p["eval_kwargs"]["mask_th"],
            "overlap_th": p["eval_kwargs"]["overlap_th"],
            "holdout": p.get("holdout", 0),
            "class_aware": bool(args.class_aware),
            "int8": os.environ.get("LDMSEG_INT8", "0"),
            "int8_act": os.environ.get("LDMSEG_INT8_ACT", "0")}
    pqs = []
    for seed in seeds:
        results = trainer.compute_metrics(
            metrics=["pq"], threshold_output=True, save_images=True,
            seed=seed, max_iter=args.max_iter,
            num_inference_steps=args.steps,
            class_agnostic=not args.class_aware,
        )
        pqs.append(results["pq"]["panoptic_seg"]["PQ"])
        # "results" stays the leading key: tools/scripts/pq_gates_r03.sh
        # greps '^{"results"' for the summary line
        print(json.dumps(dict({"results": results.get("pq"), "seed": seed},
                              **tags)))
    if len(seeds) > 1:
        mean = sum(pqs) / len(pqs)
        std = (sum((x - mean) ** 2 for x in pqs) / (len(pqs) - 1)) ** 0.5
        print(json.dumps(dict({"pq_mean": round(mean, 3),
                               "pq_std": round(std, 3),
                               "seeds": seeds,
                               "pq_per_seed": [round(x, 3) for x in pqs]},
                              **tags)))


if __name__ == "__main__":
    main()
