"""Paired multi-seed PQ gate matrix in ONE process.

Loads the trained run once, then evaluates every (sampler, steps) serving
cell at the SAME noise seeds — the statistically honest protocol (VERDICT
r3 Missing #2): deltas between cells are judged against the seed std
instead of riding a single draw. One process = one model load + one
sampler compile per (sampler, steps) pair instead of per cell
(`tools/eval_run.py` stays the single-cell tool; env-dependent cells like
LDMSEG_INT8 still need their own process because quantization is decided
at trace time). Dataset-variant cells (--variant-cells) swap ds_val
in-process too: full-16 continuity and the class-aware synthetic-category
eval reuse the already-compiled ddim@50 program (identical batch shapes).

    python tools/gate_matrix.py <run_dir> [--ckpt best_model]
        [--seeds 0,42,123] [--cells ddim:50,ddim:25,dpm++:25,dpm++:15]
        [--variant-cells full16:ddim:50,classaware3:ddim:50]
        [--out artifacts/bench_r04/pq_gates.jsonl]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--ckpt", default="best_model")
    ap.add_argument("--seeds", default="0,42,123")
    ap.add_argument("--cells", default="ddim:50,ddim:25,dpm++:25,dpm++:15")
    ap.add_argument("--variant-cells", default=None,
                    help="dataset-variant cells evaluated in the SAME "
                         "process after the sampler cells, e.g. "
                         "'full16:ddim:50,classaware3:ddim:50' — full16 "
                         "re-evaluates on all 16 images (holdout=0, "
                         "continuity with round-3 train-set PQ); "
                         "classawareN uses N synthetic area-bucket "
                         "categories with the class-aware evaluator")
    ap.add_argument("--out", default=None, help="append jsonl summary here")
    ap.add_argument("--temperature", type=float, default=None,
                    help="postprocess temperature override (e.g. the T* "
                         "fitted by calibrate_postprocess --fit-temperature"
                         "); recorded in every row")
    ap.add_argument("--mask-th", type=float, default=None,
                    help="override the snapshot's mask_th (e.g. 0.9 for "
                         "a release-config cell)")
    ap.add_argument("--overlap-th", type=float, default=None,
                    help="override the snapshot's overlap_th")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from ldmseg_tpu.core import MeshSpec, make_mesh
    from ldmseg_tpu.core.config import enable_compile_cache

    enable_compile_cache()

    with open(os.path.join(args.run_dir, f"{args.ckpt}.config.json")) as f:
        p = json.load(f)
    p["output_dir"] = args.run_dir
    p["save_dir"] = os.path.join(args.run_dir, "predictions")
    p["eval_only"] = True
    p["eval_kwargs"]["num_workers"] = 0
    if args.temperature is not None:
        p["eval_kwargs"]["temperature"] = args.temperature
    if args.mask_th is not None:
        p["eval_kwargs"]["mask_th"] = args.mask_th
    if args.overlap_th is not None:
        p["eval_kwargs"]["overlap_th"] = args.overlap_th

    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    from ldmseg_tpu.models.descriptors import get_image_descriptor_model
    from ldmseg_tpu.train.trainer_ldm import (
        TrainerDiffusion,
        build_unet_config,
    )

    image_fn, text_fn, tokenizer, unet_cfg = get_image_descriptor_model(
        p["train_kwargs"].get("image_descriptors", "remove"),
        p.get("pretrained_model_path"), build_unet_config(p),
    )
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=args.run_dir, unet_cfg=unet_cfg,
        tokenizer=tokenizer, text_encoder_fn=text_fn,
        image_descriptor_fn=image_fn,
        seed=p["sampling_kwargs"].get("seed", 0),
    )
    trainer.load(os.path.join(args.run_dir, args.ckpt), load_vae=True)

    seeds = [int(s) for s in args.seeds.split(",")]
    cells = [c.split(":") for c in args.cells.split(",")]
    out_f = open(args.out, "a") if args.out else None

    import jax as _jax

    def set_sampler(sampler):
        if sampler != trainer.sampler:
            # trainer.sampler is read at TRACE time inside _sample_impl;
            # the existing jit wrapper would serve a stale cached program
            # for an already-seen steps count — swap in a fresh wrapper
            trainer.sampler = sampler
            trainer.p["sampling_kwargs"]["sampler"] = sampler
            trainer._sample_jit = _jax.jit(
                trainer._sample_impl,
                static_argnames=("num_inference_steps", "repeat_noise"),
            )

    def swap_val_dataset(**overrides):
        # rebuild the eval split in-process (same model, same compiled
        # sampler when shapes match) — a fresh eval_run process per dataset
        # variant costs ~5 min of import + param upload + compile each
        from ldmseg_tpu.data.coco import get_dataset
        from ldmseg_tpu.data.loader import DataLoader

        kw = dict(trainer._val_ds_kwargs, **overrides)
        ds = get_dataset(
            p["val_db_name"], p["data_dir"], "val",
            transform=trainer.ds_val.transform, caption_dropout=1.0, **kw,
        )
        trainer.ds_val = ds
        trainer.dl_val = DataLoader(
            ds, trainer.batch_size_val, shuffle=False, drop_last=False,
            seed=0, process_index=_jax.process_index(),
            process_count=_jax.process_count(), num_threads=0,
        )

    def run_cell(cell_name, sampler, steps, class_agnostic=True, **tags):
        set_sampler(sampler)
        pqs, segs_per_seed, conf_per_seed, area_per_seed = [], [], [], []
        for seed in seeds:
            res = trainer.compute_metrics(
                metrics=["pq"], threshold_output=True, save_images=False,
                seed=seed, num_inference_steps=steps,
                class_agnostic=class_agnostic,
            )["pq"]["panoptic_seg"]
            pqs.append(res["PQ"])
            # observability columns (VERDICT r4 next #7): a 0.00 PQ row
            # self-explains — 0 kept segments + low conf_mass means the
            # postprocessor was starved of confident pixels, not that the
            # evaluator mismatched everything
            segs_per_seed.append(int(res.get("pred_segments", -1)))
            conf_per_seed.append(round(float(res.get("conf_mass", -1)), 4))
            area_per_seed.append(round(float(res.get("seg_mean_area", -1)), 1))
            print(json.dumps({"cell": cell_name, "seed": seed,
                              "PQ": round(res["PQ"], 3),
                              "SQ": round(res["SQ"], 3),
                              "RQ": round(res["RQ"], 3),
                              "precision": round(res["precision"], 2),
                              "recall": round(res["recall"], 2),
                              "pred_segments": segs_per_seed[-1],
                              "conf_mass": conf_per_seed[-1],
                              "seg_mean_area": area_per_seed[-1]}),
                  flush=True)
        mean = float(np.mean(pqs))
        std = float(np.std(pqs, ddof=1)) if len(pqs) > 1 else 0.0
        line = json.dumps(dict({
            "pq_mean": round(mean, 3), "pq_std": round(std, 3),
            "seeds": seeds, "pq_per_seed": [round(x, 3) for x in pqs],
            "pred_segments_per_seed": segs_per_seed,
            "conf_mass_per_seed": conf_per_seed,
            "seg_mean_area_per_seed": area_per_seed,
            "ckpt": args.ckpt, "steps": steps, "sampler": sampler,
            "mask_th": p["eval_kwargs"]["mask_th"],
            "overlap_th": p["eval_kwargs"]["overlap_th"],
            "temperature": p["eval_kwargs"].get("temperature", 1.0),
            "holdout": p.get("holdout", 0),
            "class_aware": not class_agnostic,
            "int8": os.environ.get("LDMSEG_INT8", "0"),
        }, **tags))
        print(line, flush=True)
        if out_f:
            out_f.write(line + "\n")
            out_f.flush()

    for sampler, steps in cells:
        run_cell(f"{sampler}@{steps}", sampler, int(steps))

    for spec in (args.variant_cells.split(",") if args.variant_cells else []):
        name, sampler, steps = spec.split(":")
        if name == "full16":
            swap_val_dataset(holdout=0)
            run_cell(f"full16/{sampler}@{steps}", sampler, int(steps),
                     holdout=0)
        elif name.startswith("classaware"):
            n = int(name[len("classaware"):] or 3)
            swap_val_dataset(holdout=p.get("holdout", 0),
                             synthetic_categories=n)
            run_cell(f"classaware{n}/{sampler}@{steps}", sampler, int(steps),
                     class_agnostic=False, synthetic_categories=n)
        else:
            raise SystemExit(f"unknown variant cell {name!r}")

    if out_f:
        out_f.close()


if __name__ == "__main__":
    main()
