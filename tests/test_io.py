"""IO tests: diffusers-layout weight loading, loader prefetch, checkpoints."""

import os

import numpy as np
import pytest

from ldmseg_tpu.data.loader import DataLoader, collate
from ldmseg_tpu.models.sd_weights import load_diffusers_state


def test_load_diffusers_state_safetensors(tmp_path):
    from safetensors.numpy import save_file

    d = tmp_path / "unet"
    d.mkdir()
    state = {
        "conv_in.weight": np.random.rand(8, 4, 3, 3).astype(np.float32),
        "conv_in.bias": np.random.rand(8).astype(np.float32),
    }
    save_file(state, str(d / "diffusion_pytorch_model.safetensors"))
    loaded = load_diffusers_state(str(d))
    assert set(loaded) == set(state)
    np.testing.assert_array_equal(loaded["conv_in.weight"], state["conv_in.weight"])


def test_load_diffusers_state_missing_dir(tmp_path):
    assert load_diffusers_state(str(tmp_path / "nope")) is None


def test_load_diffusers_state_torch_bin(tmp_path):
    import torch

    d = tmp_path / "vae"
    d.mkdir()
    torch.save({"encoder.conv_in.weight": torch.randn(4, 3, 3, 3)},
               str(d / "diffusion_pytorch_model.bin"))
    loaded = load_diffusers_state(str(d))
    assert loaded["encoder.conv_in.weight"].shape == (4, 3, 3, 3)
    assert loaded["encoder.conv_in.weight"].dtype == np.float32


class _ToyDataset:
    def __init__(self, n=10):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "image": np.full((4, 4, 3), i, np.float32),
            "semseg": np.full((4, 4), i, np.int32),
            "image_semseg": np.full((4, 4, 7), i, np.float32),
            "meta": {"image_id": i},
            "text": f"t{i}",
        }


def test_loader_threaded_prefetch_matches_sync():
    ds = _ToyDataset(10)
    sync = list(DataLoader(ds, 2, shuffle=True, seed=5, num_threads=0))
    thr = list(DataLoader(ds, 2, shuffle=True, seed=5, num_threads=1))
    assert len(sync) == len(thr) == 5
    for a, b in zip(sync, thr):
        np.testing.assert_array_equal(a["image"], b["image"])
        assert a["text"] == b["text"]


def test_loader_partial_batch_padding():
    ds = _ToyDataset(5)
    dl = DataLoader(ds, 2, shuffle=False, drop_last=False)
    batches = list(dl)
    assert len(batches) == 3
    # final batch repeat-padded to keep shapes static
    assert batches[-1]["image"].shape == (2, 4, 4, 3)
    np.testing.assert_array_equal(batches[-1]["image"][1], batches[-1]["image"][0])


def test_loader_is_padding_flags_exactly_once_across_processes():
    """Each dataset image is non-padding exactly once ACROSS process shards:
    the wrap-pad of the global index space (ADVICE r4 #2) and the partial-
    batch repeat-pad are both flagged in meta['is_padding']."""
    n, pc = 5, 2  # 5 images over 2 processes -> one wrap-padded duplicate
    counts = {}
    for pi in range(pc):
        dl = DataLoader(_ToyDataset(n), 2, shuffle=False, drop_last=False,
                        process_index=pi, process_count=pc)
        for batch in dl:
            for m in batch["meta"]:
                assert "is_padding" in m
                if not m["is_padding"]:
                    counts[m["image_id"]] = counts.get(m["image_id"], 0) + 1
    assert counts == {i: 1 for i in range(n)}


def test_loader_partial_batch_padding_flagged():
    ds = _ToyDataset(5)
    dl = DataLoader(ds, 2, shuffle=False, drop_last=False)
    batches = list(dl)
    flags = [m["is_padding"] for b in batches for m in b["meta"]]
    assert flags == [False] * 5 + [True]  # repeat-padded 6th slot


def test_checkpoint_save_restore_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ldmseg_tpu.train.checkpoint import restore_checkpoint, save_checkpoint

    payload = {
        "step": 7,
        "params": {"layer": {"kernel": jnp.ones((2, 3)), "bias": jnp.zeros(3)}},
    }
    save_checkpoint(str(tmp_path), payload)
    out = restore_checkpoint(str(tmp_path))
    assert int(out["step"]) == 7
    np.testing.assert_array_equal(np.asarray(out["params"]["layer"]["kernel"]),
                                  np.ones((2, 3)))
    # overwrite works (orbax refuses by default; we swap atomically)
    payload["step"] = 8
    save_checkpoint(str(tmp_path), payload)
    assert int(restore_checkpoint(str(tmp_path))["step"]) == 8
    assert restore_checkpoint(str(tmp_path), name="missing") is None


def test_checkpoint_async_save(tmp_path):
    """block=False saves return immediately and become durable by the next
    save / any restore / finalize_pending_saves; the previous checkpoint
    stays intact while a save is in flight (train_kwargs.async_save)."""
    import jax.numpy as jnp

    from ldmseg_tpu.train.checkpoint import (
        finalize_pending_saves,
        restore_checkpoint,
        save_checkpoint,
    )

    payload = {"step": 1, "w": jnp.full((64, 64), 1.0)}
    save_checkpoint(str(tmp_path), payload, block=False)
    finalize_pending_saves()
    assert int(restore_checkpoint(str(tmp_path))["step"]) == 1

    # async overwrite: restore finalizes the in-flight save first
    payload["step"] = 2
    save_checkpoint(str(tmp_path), payload, block=False)
    out = restore_checkpoint(str(tmp_path))
    assert int(out["step"]) == 2
    np.testing.assert_array_equal(np.asarray(out["w"]), np.ones((64, 64)))

    # back-to-back async saves self-finalize (at most one in flight)
    for s in (3, 4):
        save_checkpoint(str(tmp_path), {"step": s, "w": jnp.zeros((8,))},
                        block=False)
    finalize_pending_saves()
    assert int(restore_checkpoint(str(tmp_path))["step"]) == 4


def test_metrics_logger_log_image(tmp_path):
    """log_image records the panel path in metrics.jsonl (and would forward
    a wandb.Image when wandb is enabled — reference ldm_cond.py:1446-1477)."""
    import json

    from ldmseg_tpu.utils.metrics_logger import MetricsLogger

    ml = MetricsLogger(str(tmp_path), use_wandb=False)
    ml.log_image("train/grid", str(tmp_path / "all.png"), step=7)
    lines = [json.loads(line) for line in open(tmp_path / "metrics.jsonl")]
    assert lines[-1]["image/train/grid"].endswith("all.png")
    assert lines[-1]["step"] == 7
