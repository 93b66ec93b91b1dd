"""Batch panoptic inference CLI: run a trained LDM checkpoint on a folder
of RGB images and write panoptic maps + segments json (+ overlays).

The reference has no standalone inference entry point — generation is only
reachable through the eval loop (reference tools/main_ldm.py:219-232 with a
COCO-format dataset on disk). This serves arbitrary images:

    python tools/predict.py <run_dir> --images 'photos/*.jpg' --out preds \
        [--ckpt best_model] [--steps 50] [--sampler ddim|dpm++] [--overlay]

Per image it writes ``<stem>_panoptic.png`` (colorized instance map, 0=void
black), ``<stem>_segments.json`` (id/area per segment + settings), and with
``--overlay`` a blended visualization. Model/config come entirely from the
run's checkpoint snapshot (same mechanism as tools/eval_run.py).
"""

import argparse
import glob
import json
import os


class _StubDataset:
    """Placeholder dataset: TrainerDiffusion builds loaders at init, but the
    predict path never iterates them — only len() is consulted (it must be
    >= batch_size so the drop_last train loader isn't empty)."""

    meta_data = {}

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, idx):  # pragma: no cover - never reached
        raise RuntimeError("predict.py does not read the training dataset")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("run_dir")
    ap.add_argument("--images", required=True,
                    help="glob or directory of RGB images")
    ap.add_argument("--out", default=None,
                    help="output dir (default <run_dir>/predict)")
    ap.add_argument("--ckpt", default="best_model")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--sampler", choices=["ddim", "dpm++"], default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--overlay", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force the CPU backend")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    from PIL import Image

    from ldmseg_tpu.core import MeshSpec, make_mesh
    from ldmseg_tpu.core.config import enable_compile_cache
    from ldmseg_tpu.eval.postprocess import postprocess_image
    from ldmseg_tpu.models.layers import resize_bilinear
    from ldmseg_tpu.utils.visualize import (
        colorize_ids,
        overlay_panoptic,
        write_image,
    )

    enable_compile_cache()

    paths = (
        sorted(glob.glob(os.path.join(args.images, "*")))
        if os.path.isdir(args.images) else sorted(glob.glob(args.images))
    )
    paths = [p_ for p_ in paths
             if p_.lower().endswith((".jpg", ".jpeg", ".png", ".webp"))]
    assert paths, f"no images match {args.images!r}"
    out_dir = args.out or os.path.join(args.run_dir, "predict")
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(args.run_dir, f"{args.ckpt}.config.json")) as f:
        p = json.load(f)
    p["output_dir"] = args.run_dir
    p["eval_only"] = True
    if args.sampler is not None:
        p["sampling_kwargs"]["sampler"] = args.sampler

    from ldmseg_tpu.models.descriptors import get_image_descriptor_model
    from ldmseg_tpu.train.trainer_ldm import TrainerDiffusion, build_unet_config

    mesh = make_mesh(MeshSpec(data=1, fsdp=1), devices=jax.devices()[:1])
    image_fn, text_encoder_fn, tokenizer, unet_cfg = get_image_descriptor_model(
        p["train_kwargs"].get("image_descriptors", "remove"),
        p.get("pretrained_model_path"),
        build_unet_config(p),
    )
    stub = _StubDataset(p["train_kwargs"]["batch_size"])
    trainer = TrainerDiffusion(
        p, mesh=mesh, results_folder=out_dir,
        dataset_train=stub, dataset_val=stub,
        unet_cfg=unet_cfg, tokenizer=tokenizer,
        text_encoder_fn=text_encoder_fn, image_descriptor_fn=image_fn,
        seed=args.seed,
    )
    trainer.load(os.path.join(args.run_dir, args.ckpt), load_vae=True)

    size = trainer.image_size
    rng = jax.random.PRNGKey(args.seed)
    results = []
    for start in range(0, len(paths), args.batch_size):
        chunk = paths[start:start + args.batch_size]
        pil = [Image.open(f).convert("RGB") for f in chunk]
        orig_sizes = [(im.height, im.width) for im in pil]
        batch = np.stack([
            np.asarray(im.resize((size, size), Image.BICUBIC), np.float32)
            / 255.0
            for im in pil
        ])
        rng, rng_batch = jax.random.split(rng)
        rgb_latents = trainer.encode_rgb_images(batch)
        latents = trainer.sample(rgb_latents, rng=rng_batch,
                                 num_inference_steps=args.steps)
        logits = np.asarray(resize_bilinear(
            trainer.decode_latents(latents, return_logits=True), (size, size)))
        for i, path in enumerate(chunk):
            pan, segs = postprocess_image(
                logits[i], np.ones((size, size), np.int32), orig_sizes[i],
                mask_th=trainer.mask_th, count_th=trainer.count_th,
                overlap_th=trainer.overlap_th,
                ignore_label=trainer.ignore_label,
            )
            stem = os.path.splitext(os.path.basename(path))[0]
            write_image(colorize_ids(pan), out_dir, f"{stem}_panoptic.png")
            with open(os.path.join(out_dir, f"{stem}_segments.json"), "w") as f:
                json.dump({
                    "image": path, "segments": segs,
                    "steps": args.steps,
                    "sampler": trainer.sampler,
                    "mask_th": trainer.mask_th,
                    "count_th": trainer.count_th,
                    "overlap_th": trainer.overlap_th,
                }, f, indent=2)
            if args.overlay:
                full = np.asarray(pil[i], np.float32) / 255.0
                write_image(overlay_panoptic(full, pan), out_dir,
                            f"{stem}_overlay.png")
            results.append((stem, len(segs)))
            print(f"{path}: {len(segs)} segments")
    print(f"wrote {len(results)} predictions to {out_dir}")
    return results


if __name__ == "__main__":
    main()
