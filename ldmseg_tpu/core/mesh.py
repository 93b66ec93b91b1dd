"""Device mesh and sharding helpers.

The reference scales with one process per GPU + DDP/NCCL all-reduce
(reference: tools/main_ldm.py:69,108-111,188-192) and optional ZeRO-1
optimizer-state sharding (reference: ldmseg/trainers/optim.py:40-49).

TPU-natively both collapse into sharding annotations over a
``jax.sharding.Mesh``:

  * ``data``  — batch dimension sharding (data parallelism). Gradient
    all-reduce is inserted by XLA from the shardings; no explicit barrier
    or all_gather per step (the reference issues both every step,
    trainers_ldm_cond.py:864-868).
  * ``fsdp``  — parameter/optimizer-state sharding (ZeRO-style). With
    ``fsdp=1`` this degenerates to plain DP with replicated params.

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and
shard the input pipeline by ``jax.process_index()``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    data: int = -1  # -1: all remaining devices
    fsdp: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        data = self.data
        if data == -1:
            assert n_devices % self.fsdp == 0, (n_devices, self.fsdp)
            data = n_devices // self.fsdp
        assert data * self.fsdp == n_devices, (
            f"mesh {data}x{self.fsdp} != {n_devices} devices"
        )
        return MeshSpec(data=data, fsdp=self.fsdp)


def make_mesh(spec: Optional[MeshSpec] = None, devices: Optional[Sequence[Any]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or MeshSpec()).resolve(len(devices))
    dev_array = np.asarray(devices).reshape(spec.data, spec.fsdp)
    return Mesh(dev_array, axis_names=("data", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over both data and fsdp axes.

    Using both axes for the batch keeps every chip busy even when fsdp>1
    (ZeRO-style: params sharded over fsdp, batch over data*fsdp).
    """
    return NamedSharding(mesh, P(("data", "fsdp")))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _fsdp_spec(shape: Sequence[int], fsdp_size: int, min_size: int = 2**16) -> P:
    """Choose a PartitionSpec sharding the largest divisible axis over fsdp."""
    if fsdp_size <= 1 or np.prod(shape, dtype=np.int64) < min_size:
        return P()
    # prefer the largest axis divisible by fsdp_size
    order = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in order:
        if shape[i] % fsdp_size == 0:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def shard_params_fsdp(params: Any, mesh: Mesh, min_size: int = 2**16) -> Any:
    """Build a NamedSharding pytree for params: fsdp-shard large tensors.

    This is the ZeRO-equivalent layout: with adamw, optimizer moments inherit
    the same sharding, so optimizer state is sharded `for free` (SURVEY §2.10).
    """
    fsdp_size = mesh.shape.get("fsdp", 1)

    def one(leaf):
        spec = _fsdp_spec(np.shape(leaf), fsdp_size, min_size)
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map(one, params)


def local_batch_slice(global_batch: int, mesh: Mesh) -> int:
    """Per-process batch size for host-sharded input pipelines."""
    n_proc = jax.process_count()
    assert global_batch % n_proc == 0, (global_batch, n_proc)
    return global_batch // n_proc
