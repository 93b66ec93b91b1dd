"""tools/protect_weights.py: survivable weights artifact (pack/verify/restore).

Round 2 and round 3 both lost trained checkpoints to environment resets;
the packed .npz is the committed artifact that survives (VERDICT r3
next-round #5). The reference has no equivalent — its torch.save'd .pt
files (trainers_ldm_cond.py:1791-1814) assume a durable filesystem."""

import importlib.util
import json
import os

import numpy as np

from ldmseg_tpu.train.checkpoint import restore_checkpoint, save_checkpoint


def _load_tool():
    path = os.path.join(os.path.dirname(__file__), "..", "tools",
                        "protect_weights.py")
    spec = importlib.util.spec_from_file_location("protect_weights", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pack_verify_restore_roundtrip(tmp_path, capsys):
    import ml_dtypes

    rng = np.random.default_rng(0)
    payload = {
        "unet": {"blk": {"w": rng.normal(size=(8, 4)).astype(np.float32),
                         "b": np.zeros((4,), np.float32)}},
        "vae_semseg": {"conv": rng.normal(size=(3, 3, 2, 2)).astype(np.float32)},
        "step": np.asarray(123, np.int32),
        "epoch": np.asarray(7, np.int32),
        "ema": None,  # EMA-disabled runs store None (run_42 did)
        "opt_state": {"mu": rng.normal(size=(8, 4)).astype(np.float32)},
    }
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir, payload, name="best_model",
                    config={"train_kwargs": {"batch_size": 8}})

    tool = _load_tool()
    out = str(tmp_path / "w.npz")
    tool.main(["pack", run_dir, "--ckpt", "best_model", "--out", out])
    packed = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # optimizer state dropped; weights + counters kept
    assert packed["leaves"] == 6 and os.path.exists(out)  # incl. ema=None

    assert tool.main(["verify", out]) == 0
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["ok"] and v["hash_mismatches"] == []

    dst = str(tmp_path / "restored")
    tool.main(["restore", out, "--run-dir", dst])
    data = restore_checkpoint(dst, name="best_model")
    assert data is not None and "opt_state" not in data
    assert int(data["step"]) == 123 and int(data["epoch"]) == 7
    # None leaves survive pack->restore without allow_pickle (npz object
    # arrays are never written; the manifest carries packed="none")
    assert data.get("ema") is None
    # float weights round-trip through bf16 exactly at bf16 resolution
    want = payload["unet"]["blk"]["w"].astype(ml_dtypes.bfloat16)
    got = data["unet"]["blk"]["w"]
    assert got.dtype == np.float32
    np.testing.assert_array_equal(got, want.astype(np.float32))
    # config snapshot travels with the artifact
    with open(os.path.join(dst, "best_model.config.json")) as f:
        assert json.load(f)["train_kwargs"]["batch_size"] == 8


def test_verify_detects_corruption(tmp_path, capsys):
    payload = {"params": {"w": np.ones((4, 4), np.float32)},
               "step": np.asarray(1, np.int32)}
    run_dir = str(tmp_path / "run")
    save_checkpoint(run_dir, payload, name="model", config=None)
    tool = _load_tool()
    out = str(tmp_path / "w.npz")
    tool.main(["pack", run_dir, "--ckpt", "model", "--out", out])
    capsys.readouterr()

    z = dict(np.load(out).items())
    meta = json.loads(bytes(z["__meta__"]).decode())
    z["params/w"] = z["params/w"].copy()
    z["params/w"][0] ^= 1  # flip one bit of the packed bf16
    np.savez(out, **z)
    assert tool.main(["verify", out]) == 1
    v = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert v["hash_mismatches"] == ["params/w"]
    assert set(meta["leaves"]) == {"params/w", "step"}
