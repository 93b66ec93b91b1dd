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


def main():
    coord = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    workdir = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()

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
