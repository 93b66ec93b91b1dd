"""Worker process for the 2-process multihost test.

Run as: python multihost_worker.py <coordinator> <process_id> <num_processes>
        <workdir>

Exercises for real (no mocks) what the reference validates only by running
SLURM jobs (/root/reference/tools/main_ldm_slurm.py:52-57,
ldmseg/evaluations/panoptic_evaluation_agnostic.py:129-132):

  * jax.distributed.initialize across 2 local CPU processes,
  * the host-sharded DataLoader (each process reads a DISJOINT shard),
  * PanopticEvaluator.evaluate()'s cross-process prediction allgather —
    feeding each shard's GT as predictions, the gathered PQ must be 100
    on every process (same as one process seeing all images).

Writes <workdir>/worker_<pid>.json with the processed ids + PQ result.
"""

import json
import os
import sys


def train_mode(workdir):
    """2-process data-parallel train step over a GLOBAL 2-device mesh.

    Each process contributes a DIFFERENT local batch half; XLA inserts the
    cross-process gradient all-reduce from the shardings (the TPU-native
    replacement for DDP/NCCL, core/mesh.py docstring). Asserts params stay
    bit-identical across processes after optimizer steps.
    """
    import json as _json

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ldmseg_tpu.core.mesh import (
        MeshSpec, batch_sharding, make_mesh, replicated_sharding,
    )
    from ldmseg_tpu.losses import SegLossConfig
    from ldmseg_tpu.models import SegVAE, SegVAEConfig
    from ldmseg_tpu.train import (
        OptimConfig, TrainState, make_lr_schedule, make_optimizer,
    )
    from ldmseg_tpu.train.steps_ae import AEStepConfig, make_ae_train_step

    mesh = make_mesh(MeshSpec(data=jax.device_count(), fsdp=1))
    cfg_vae = SegVAEConfig(
        in_channels=7, int_channels=8, out_channels=8,
        block_out_channels=(8, 8, 8, 8), latent_channels=4, norm_num_groups=4,
        num_upscalers=1, upscale_channels=8,
    )
    model = SegVAE(cfg_vae)
    hw, b_local = 16, 2
    rng = np.random.default_rng(100 + jax.process_index())  # different data!
    semseg = rng.integers(0, 8, size=(b_local, hw, hw)).astype(np.int32)
    bits = ((semseg[..., None] >> np.arange(7)) % 2).astype(np.float32)
    local = {
        "image_semseg": bits,
        "semseg": semseg,
        "image": rng.random((b_local, hw, hw, 3)).astype(np.float32),
    }
    bsh = batch_sharding(mesh)
    batch = {
        k: jax.make_array_from_process_local_data(bsh, v)
        for k, v in local.items()
    }

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, hw, hw, 7)), rng=jax.random.PRNGKey(1),
    )
    cfg = AEStepConfig(
        loss_cfg=SegLossConfig(num_points=16, num_classes=8, max_masks=4))
    tx = make_optimizer(
        variables["params"], OptimConfig(lr=1e-3),
        make_lr_schedule("constant", 1e-3, 10),
    )
    state = TrainState.create(variables["params"], tx)
    rsh = replicated_sharding(mesh)
    state = jax.device_put(state, rsh)
    step = jax.jit(make_ae_train_step(model, tx, cfg))
    losses = []
    for _ in range(2):
        state, metrics = step(state, batch, jax.random.PRNGKey(5))
        losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses)), losses

    # params are replicated: every process must hold identical values
    leaf = np.asarray(
        jax.tree_util.tree_leaves(jax.device_get(state.params))[0]
    )
    digest = float(np.abs(leaf).sum())
    from jax.experimental import multihost_utils

    digests = np.asarray(multihost_utils.process_allgather(
        np.asarray([digest], dtype=np.float64))).reshape(-1)
    assert np.allclose(digests, digests[0]), digests
    out = {"losses": losses, "digest": digest}
    with open(os.path.join(
            workdir, f"train_worker_{jax.process_index()}.json"), "w") as f:
        _json.dump(out, f)


def main():
    coord = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    workdir = sys.argv[4]
    mode = sys.argv[5] if len(sys.argv) > 5 else "eval"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

    if mode == "train":
        train_mode(workdir)
        return

    import numpy as np
    from PIL import Image

    from ldmseg_tpu.data.loader import DataLoader
    from ldmseg_tpu.eval import PanopticEvaluator
    from ldmseg_tpu.eval.panoptic import rgb2id

    with open(os.path.join(workdir, "meta.json")) as f:
        meta = json.load(f)
    with open(meta["panoptic_json"]) as f:
        gt = json.load(f)
    annotations = {a["image_id"]: a for a in gt["annotations"]}

    dataset = [
        {"meta": {"image_id": a["image_id"], "file_name": a["file_name"]}}
        for a in gt["annotations"]
    ]
    dl = DataLoader(
        dataset, batch_size=2, shuffle=True, drop_last=False, seed=0,
        process_index=jax.process_index(), process_count=jax.process_count(),
    )

    evaluator = PanopticEvaluator(meta, class_agnostic=True)
    processed = []
    for batch in dl:
        for m in batch["meta"]:
            image_id = m["image_id"]
            png = os.path.join(meta["panoptic_root"], m["file_name"])
            pan = rgb2id(np.array(Image.open(png).convert("RGB")))
            segs = [
                {"id": s["id"], "category_id": 1, "isthing": True}
                for s in annotations[image_id]["segments_info"]
            ]
            evaluator.process(
                [m["file_name"]], [image_id],
                [{"panoptic_seg": (pan, segs)}],
            )
            processed.append(image_id)

    res = evaluator.evaluate(verbose=False)
    assert res is not None
    pq = res["panoptic_seg"]["PQ"]
    with open(os.path.join(workdir, f"worker_{pid}.json"), "w") as f:
        json.dump({"processed": processed, "PQ": pq}, f)
    assert abs(pq - 100.0) < 1e-6, pq


if __name__ == "__main__":
    main()
