"""Survivable trained-weights artifact: pack / restore / verify.

Rounds 2 and 3 both lost their trained checkpoints to environment resets
(`artifacts/runs/**` model dirs are .gitignored and the host fs is wiped
between rounds — VERDICT r3 weak #5 / next-round #5). This tool converts
an orbax checkpoint into ONE compressed .npz small enough to commit:

  * weights only (unet / vae_semseg / vae_image / params + step/epoch/pq);
    optimizer state and EMA are deliberately dropped (re-derivable),
  * float leaves cast to bfloat16 and stored as uint16 views (numpy can't
    serialize ml_dtypes.bfloat16 directly), everything else verbatim,
  * a json manifest per leaf: shape, original dtype, sha256 of the packed
    bytes — so a restored tree is verifiable leaf-by-leaf.

The reference has no equivalent (torch.save'd .pt files are assumed to
live on a durable filesystem, trainers_ldm_cond.py:1791-1814); this is
infrastructure for the round-based environment.

Retention policy (VERDICT r4 weak #5): ONE artifact path per run stage,
overwritten in place when a better checkpoint supersedes it —
``artifacts/weights/run41_ae.npz`` (stage 1) and
``artifacts/weights/run42_best_model.npz`` (stage 2). Do NOT add
per-round or per-step paths: git keeps every superseded blob in history
anyway (the .git pack is already ~1.4 GB from one UNet), so new paths
balloon history AND clutter the tree. Overwriting the same path keeps
the tree at exactly one live artifact per stage; anyone needing an older
artifact can check out the commit that packed it. Budget: keep
``artifacts/weights/`` under ~2 GB live.

  pack:    python tools/protect_weights.py pack <run_dir> --ckpt best_model \
               --out artifacts/weights/run42_best.npz
  restore: python tools/protect_weights.py restore artifacts/weights/run42_best.npz \
               --run-dir <run_dir> [--name best_model]
  verify:  python tools/protect_weights.py verify artifacts/weights/run42_best.npz
"""

import argparse
import hashlib
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# checkpoint keys that are re-derivable training state, not weights
DROP_KEYS = ("opt_state", "ema_opt_state")
SEP = "/"


def _flatten(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _flatten(v, f"{prefix}{SEP}{k}" if prefix else str(k))
    else:
        yield prefix, tree


def _unflatten(flat):
    out = {}
    for path, v in flat.items():
        node = out
        parts = path.split(SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def pack(args):
    from ldmseg_tpu.train.checkpoint import load_config_snapshot, restore_checkpoint

    # refuse to pack while a save of this checkpoint may be in flight
    # (ADVICE r4 #3): save_checkpoint writes to <name>.tmp_new* then
    # atomically renames, so a LIVE tmp dir means the visible dir is about
    # to be replaced (or, if the trainer was killed mid-save, is stale but
    # complete). Packing mid-swap could read a half-deleted dir.
    tmp_dirs = [d for d in os.listdir(args.run_dir)
                if d.startswith(f"{args.ckpt}.tmp_new")]
    if tmp_dirs and not args.force:
        import time
        ages = {d: time.time() - os.path.getmtime(os.path.join(args.run_dir, d))
                for d in tmp_dirs}
        fresh = {d: a for d, a in ages.items() if a < 120}
        if fresh:
            raise SystemExit(
                f"save in flight? fresh tmp dirs {fresh} next to "
                f"{args.ckpt!r} — wait for the trainer to exit (kill -0 "
                f"loop) or pass --force")
        print(f"note: stale tmp dirs {list(ages)} (killed mid-save); the "
              f"visible {args.ckpt!r} dir is the last completed save")

    data = restore_checkpoint(args.run_dir, name=args.ckpt)
    assert data is not None, f"no checkpoint {args.ckpt!r} in {args.run_dir}"
    config = load_config_snapshot(args.run_dir, name=args.ckpt)
    for k in DROP_KEYS:
        data.pop(k, None)

    import ml_dtypes

    arrays, manifest = {}, {}
    for path, leaf in _flatten(data):
        if leaf is None:
            # e.g. the 'ema' slot of an EMA-disabled run: manifest-only
            # (an object-dtype npz entry would need allow_pickle and its
            # .tobytes() hash would be pointer garbage)
            manifest[path] = {"packed": "none"}
            continue
        arr = np.asarray(leaf)
        entry = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
        if arr.dtype in (np.float64, np.float32):
            packed = arr.astype(ml_dtypes.bfloat16).view(np.uint16)
            entry["packed"] = "bfloat16_as_uint16"
        elif arr.dtype == ml_dtypes.bfloat16:
            packed = arr.view(np.uint16)
            entry["packed"] = "bfloat16_as_uint16"
        else:
            packed = arr
            entry["packed"] = "verbatim"
        entry["sha256"] = hashlib.sha256(np.ascontiguousarray(packed).tobytes()).hexdigest()
        arrays[path] = packed
        manifest[path] = entry

    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    meta = {"ckpt": args.ckpt, "run_dir": os.path.abspath(args.run_dir),
            "config": config, "leaves": manifest}
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(args.out, **arrays)
    n_params = sum(int(np.prod(m["shape"])) for m in manifest.values()
                   if "shape" in m)
    print(json.dumps({"out": args.out, "leaves": len(manifest),
                      "params": n_params,
                      "bytes": os.path.getsize(args.out)}))


def _load(path):
    z = np.load(path)
    meta = json.loads(bytes(z["__meta__"]).decode())
    return z, meta


def _is_none_entry(entry):
    # "none" entries (current pack) and legacy scalar object entries (the
    # round-4 run42 artifact packed an EMA-disabled None as dtype=object;
    # its recorded hash is pointer bytes, unverifiable by construction)
    return entry.get("packed") == "none" or (
        entry.get("dtype") == "object" and entry.get("shape") == []
    )


def verify(args):
    z, meta = _load(args.npz)
    bad = []
    for path, entry in meta["leaves"].items():
        if _is_none_entry(entry):
            continue
        h = hashlib.sha256(np.ascontiguousarray(z[path]).tobytes()).hexdigest()
        if h != entry["sha256"]:
            bad.append(path)
    print(json.dumps({"npz": args.npz, "leaves": len(meta["leaves"]),
                      "hash_mismatches": bad, "ok": not bad}))
    return 1 if bad else 0


def restore(args):
    import ml_dtypes

    from ldmseg_tpu.train.checkpoint import save_checkpoint

    z, meta = _load(args.npz)
    flat = {}
    for path, entry in meta["leaves"].items():
        if _is_none_entry(entry):
            flat[path] = None
            continue
        arr = z[path]
        h = hashlib.sha256(np.ascontiguousarray(arr).tobytes()).hexdigest()
        assert h == entry["sha256"], f"hash mismatch at {path}"
        if entry["packed"] == "bfloat16_as_uint16":
            # restore at the original param dtype (fp32 training casts on load)
            arr = arr.view(ml_dtypes.bfloat16).astype(entry["dtype"])
        if entry["shape"] == []:
            arr = arr.reshape(())
        flat[path] = arr
    payload = _unflatten(flat)
    name = args.name or meta["ckpt"]
    os.makedirs(args.run_dir, exist_ok=True)
    out = save_checkpoint(args.run_dir, payload, name=name,
                          config=meta["config"])
    print(json.dumps({"restored": out, "leaves": len(flat)}))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (pack/restore are pure "
                         "host IO; keeps the tool off a busy TPU)")
    sub = ap.add_subparsers(dest="cmd", required=True)
    p = sub.add_parser("pack")
    p.add_argument("run_dir")
    p.add_argument("--ckpt", default="best_model")
    p.add_argument("--out", required=True)
    p.add_argument("--force", action="store_true",
                   help="pack even if a fresh .tmp_new save dir exists")
    p.set_defaults(fn=pack)
    p = sub.add_parser("restore")
    p.add_argument("npz")
    p.add_argument("--run-dir", dest="run_dir", required=True)
    p.add_argument("--name", default=None)
    p.set_defaults(fn=restore)
    p = sub.add_parser("verify")
    p.add_argument("npz")
    p.set_defaults(fn=verify)
    args = ap.parse_args(argv)
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    return args.fn(args) or 0


if __name__ == "__main__":
    raise SystemExit(main())
