"""Real 2-process multihost test: host-sharded loader + PQ allgather.

The reference never fakes multi-node (SURVEY §4) — distributed correctness
was validated by running real SLURM jobs. Here we do better: spawn two
actual jax processes (jax.distributed.initialize, local CPU backend) and
assert (a) the DataLoader shards are disjoint and cover the dataset, and
(b) PanopticEvaluator.evaluate()'s cross-process prediction gather yields
the same PQ=100 GT-roundtrip as a single process seeing every image
(parity: panoptic_evaluation_agnostic.py:129-162, comm.gather to rank 0).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

WORKER = os.path.join(os.path.dirname(__file__), "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _make_synthetic_gt(tmp_path, n_images=8):
    from ldmseg_tpu.eval.panoptic import id2rgb
    from PIL import Image

    root = tmp_path / "panoptic"
    root.mkdir()
    annotations = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        pan = rng.integers(0, 4, size=(24, 24)).astype(np.uint32)
        pan = np.repeat(np.repeat(pan[::4, ::4], 4, 0), 4, 1)
        Image.fromarray(id2rgb(pan)).save(root / f"{i:012d}.png")
        segs = [
            {"id": int(v), "category_id": 1, "iscrowd": 0,
             "area": int((pan == v).sum())}
            for v in np.unique(pan) if v != 0
        ]
        annotations.append({"image_id": i, "file_name": f"{i:012d}.png",
                            "segments_info": segs})
    gt_json = tmp_path / "panoptic_val.json"
    with open(gt_json, "w") as f:
        json.dump({
            "annotations": annotations,
            "categories": [{"id": 1, "name": "object", "isthing": 1}],
        }, f)
    meta = {
        "panoptic_json": str(gt_json),
        "panoptic_root": str(root),
        "thing_dataset_id_to_contiguous_id": {"1": 0},
        "stuff_dataset_id_to_contiguous_id": {"1": 0},
    }
    with open(tmp_path / "meta.json", "w") as f:
        json.dump(meta, f)
    return n_images


def _worker_env():
    env = dict(os.environ)
    # workers must NOT inherit the test session's 8-device flag: 1 CPU
    # device per process, 2 processes
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    return env


def _run_worker_pair(tmp_path, mode=None, attempts=2):
    """Spawn the 2-process worker pair; one retry — the coordination
    barrier can time out when the 1-core box is under heavy load."""
    env = _worker_env()
    last = None
    for _ in range(attempts):
        coord = f"127.0.0.1:{_free_port()}"
        args = [coord, None, "2", str(tmp_path)] + ([mode] if mode else [])
        procs = []
        for i in range(2):
            args[1] = str(i)
            procs.append(subprocess.Popen(
                [sys.executable, WORKER] + args,
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            ))
        try:
            outs = [p.communicate(timeout=600)[0] for p in procs]
        except subprocess.TimeoutExpired:
            for p in procs:
                p.kill()
            outs = [p.communicate()[0] for p in procs]
        if all(p.returncode == 0 for p in procs):
            return
        last = "\n".join(o[-3000:] for o in outs)
    raise AssertionError(f"worker pair failed twice:\n{last}")


@pytest.mark.slow
def test_two_process_loader_shards_and_pq_gather(tmp_path):
    n_images = _make_synthetic_gt(tmp_path)
    _run_worker_pair(tmp_path)

    results = []
    for i in range(2):
        with open(tmp_path / f"worker_{i}.json") as f:
            results.append(json.load(f))

    # disjoint shards covering the whole set
    sets = [set(r["processed"]) for r in results]
    assert sets[0].isdisjoint(sets[1])
    assert sets[0] | sets[1] == set(range(n_images))
    # every process computed the gathered (global) PQ
    for r in results:
        assert r["PQ"] == pytest.approx(100.0)


@pytest.mark.slow
def test_two_process_data_parallel_train_step(tmp_path):
    """2-process DP train step over a global mesh: different local batches,
    XLA-inserted cross-process gradient all-reduce, params stay identical
    on both processes (replaces DDP/NCCL validation, main_ldm.py:188-192)."""
    _run_worker_pair(tmp_path, mode="train")
    results = []
    for i in range(2):
        with open(tmp_path / f"train_worker_{i}.json") as f:
            results.append(json.load(f))
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["digest"] == results[1]["digest"]
