"""Spatial/sequence-parallel (sp mesh axis) tests.

Beyond the reference (SURVEY §5: no sequence/context parallelism exists
there): the sp axis shards the NHWC activation rows across chips so one
high-resolution sample can run on many devices — XLA SPMD inserts halo
exchanges for the convolutions, and attention runs sequence-parallel via
shard_map (local Q rows vs all-gathered K/V; kernels/attention.py).

All on the virtual 8-device CPU mesh; numerics are compared against the
unsharded single-device program.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.core.mesh import (
    MeshSpec,
    current_sp_mesh,
    make_mesh,
    sp_scope,
    spatial_sharding,
)
from ldmseg_tpu.kernels.attention import mha_reference, multi_head_attention


def test_meshspec_resolves_sp(cpu_devices):
    spec = MeshSpec(data=-1, fsdp=2, sp=2).resolve(8)
    assert (spec.data, spec.fsdp, spec.sp) == (2, 2, 2)
    mesh = make_mesh(MeshSpec(sp=4), devices=cpu_devices)
    assert dict(mesh.shape) == {"data": 2, "fsdp": 1, "sp": 4}


def test_sp_scope_stack(cpu_devices):
    mesh = make_mesh(MeshSpec(sp=4), devices=cpu_devices)
    flat = make_mesh(MeshSpec(), devices=cpu_devices)  # sp == 1
    assert current_sp_mesh() is None
    with sp_scope(flat):
        assert current_sp_mesh() is None  # sp=1 meshes don't activate it
        with sp_scope(mesh):
            assert current_sp_mesh() is mesh
    assert current_sp_mesh() is None


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_attention_matches_reference(cpu_devices, sp):
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=sp), devices=cpu_devices[:sp])
    k = jax.random.PRNGKey(0)
    q, kk, v = (
        jax.random.normal(jax.random.fold_in(k, i), (2, 64, 3, 8))
        for i in range(3)
    )
    ref = mha_reference(q, kk, v)
    with sp_scope(mesh):
        out = jax.jit(multi_head_attention)(q, kk, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_sp_attention_combined_data_axis(cpu_devices):
    """DP x SP mesh: the batch stays sharded over data while rows shard
    over sp (the bspec branch in kernels/attention.py)."""
    mesh = make_mesh(MeshSpec(data=2, fsdp=1, sp=2), devices=cpu_devices[:4])
    k = jax.random.PRNGKey(7)
    q, kk, v = (
        jax.random.normal(jax.random.fold_in(k, i), (4, 32, 2, 8))
        for i in range(3)
    )
    ref = mha_reference(q, kk, v)
    with sp_scope(mesh):
        out = jax.jit(multi_head_attention)(q, kk, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("sp", [2, 4])
def test_sp_ring_attention_matches_reference(cpu_devices, sp, monkeypatch):
    """Ring attention (K/V circulating via ppermute with online-softmax
    merging, O(S/sp) memory per chip) computes the same function as plain
    attention."""
    monkeypatch.setenv("LDMSEG_SP_ATTN", "ring")
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=sp), devices=cpu_devices[:sp])
    k = jax.random.PRNGKey(8)
    q, kk, v = (
        jax.random.normal(jax.random.fold_in(k, i), (2, 64, 3, 8))
        for i in range(3)
    )
    ref = mha_reference(q, kk, v)
    with sp_scope(mesh):
        out = jax.jit(multi_head_attention)(q, kk, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sp_attn_auto_mode_switches_on_kv_size(cpu_devices, monkeypatch):
    """auto: all-gathered K/V under the threshold, ring above it."""
    from ldmseg_tpu.kernels import attention as A

    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=2), devices=cpu_devices[:2])
    q = jax.random.normal(jax.random.PRNGKey(9), (1, 64, 2, 8))
    ref = mha_reference(q, q, q)

    calls = []
    orig = A._ring_attention_local

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(A, "_ring_attention_local", spy)
    monkeypatch.setenv("LDMSEG_SP_ATTN", "auto")
    # tiny threshold -> ring; huge threshold -> allgather
    monkeypatch.setenv("LDMSEG_SP_RING_MB", "0.001")
    with sp_scope(mesh):
        out = multi_head_attention(q, q, q)
    assert calls, "ring path not taken despite tiny threshold"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    calls.clear()
    monkeypatch.setenv("LDMSEG_SP_RING_MB", "1e9")
    with sp_scope(mesh):
        out = multi_head_attention(q, q, q)
    assert not calls, "ring path taken despite huge threshold"
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_sp_attention_skips_indivisible_seq(cpu_devices):
    """Sequences not divisible by sp fall back to the single-shard path."""
    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=4), devices=cpu_devices[:4])
    k = jax.random.PRNGKey(1)
    q = jax.random.normal(k, (1, 33, 2, 8))
    with sp_scope(mesh):
        out = multi_head_attention(q, q, q)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(mha_reference(q, q, q)), atol=1e-5
    )


def test_sp_unet_forward_matches_unsharded(cpu_devices):
    """Full tiny-UNet forward with rows sharded over sp == unsharded run
    (convs partitioned by XLA halo exchange, attention via shard_map)."""
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 8)) * 0.5
    t = jnp.array([7])
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]

    ref = model.apply({"params": params}, x, t)

    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=4), devices=cpu_devices[:4])
    xs = jax.device_put(x, spatial_sharding(mesh))

    def fwd(x_):
        x_ = jax.lax.with_sharding_constraint(x_, spatial_sharding(mesh))
        return model.apply({"params": params}, x_, t)

    with sp_scope(mesh):
        out = jax.jit(fwd)(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_sp_ddim_sample_matches_unsharded(cpu_devices):
    """4-step DDIM scan under the sp mesh == the unsharded scan."""
    from ldmseg_tpu.diffusion.ddim import make_schedule
    from ldmseg_tpu.diffusion.sampling import ddim_sample
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4)) * 0.3
    x0 = jnp.concatenate([rgb, rgb], axis=-1)
    params = model.init(jax.random.PRNGKey(1), x0, jnp.array([0]))["params"]
    sched = make_schedule(num_train_timesteps=1000)

    def make_run(mesh=None):
        def denoise(inputs, t, context):
            if mesh is not None:
                inputs = jax.lax.with_sharding_constraint(
                    inputs, spatial_sharding(mesh))
            return model.apply({"params": params}, inputs,
                               jnp.full((inputs.shape[0],), t))[..., :4]

        def run(r):
            return ddim_sample(denoise, sched, r, rgb, num_inference_steps=4,
                               latent_shape=(1, 16, 16, 4))

        return run

    ref = jax.jit(make_run())(jax.random.PRNGKey(2))

    mesh = make_mesh(MeshSpec(data=1, fsdp=1, sp=4), devices=cpu_devices[:4])
    with sp_scope(mesh):
        out = jax.jit(make_run(mesh))(jax.random.PRNGKey(2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)
