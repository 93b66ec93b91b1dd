"""Int8 serving-quantization tests (kernels/quant.py + layers wiring).

CPU-runnable: XLA lowers int8 dot/conv with int32 accumulation on every
backend; on-chip throughput is measured separately (BENCHMARKS.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldmseg_tpu.kernels.quant import (
    int8_conv,
    int8_enabled,
    int8_matmul,
    quant_scope,
    quantize_per_channel,
    quantize_per_tensor,
)


def test_quantize_per_tensor_roundtrip():
    x = jax.random.normal(jax.random.PRNGKey(0), (64, 32)) * 3.0
    q, s = quantize_per_tensor(x)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(q, np.float32) * float(s) - np.asarray(x))
    assert err.max() <= float(s) / 2 + 1e-6  # round-to-nearest bound


def test_quantize_per_channel_scales_independent():
    w = jnp.stack([jnp.ones((8,)) * 0.01, jnp.ones((8,)) * 100.0], axis=1)
    q, s = quantize_per_channel(w, channel_axis=1)
    # both columns use their own scale -> both hit the full int8 range
    assert int(jnp.max(jnp.abs(q[:, 0]))) == 127
    assert int(jnp.max(jnp.abs(q[:, 1]))) == 127
    np.testing.assert_allclose(
        np.asarray(q, np.float32) * np.asarray(s), np.asarray(w), rtol=1e-2
    )


def test_int8_matmul_close_to_fp32():
    k = jax.random.PRNGKey(1)
    x = jax.random.normal(k, (128, 96))
    w = jax.random.normal(jax.random.PRNGKey(2), (96, 64)) * 0.05
    ref = x @ w
    out = int8_matmul(x, w, jnp.float32)
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.02, rel


def test_int8_conv_close_to_fp32():
    k = jax.random.PRNGKey(3)
    x = jax.random.normal(k, (2, 16, 16, 8))
    w = jax.random.normal(jax.random.PRNGKey(4), (3, 3, 8, 12)) * 0.1
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    out = int8_conv(x, w, stride=(1, 1), padding=[(1, 1), (1, 1)],
                    out_dtype=jnp.float32)
    rel = np.linalg.norm(np.asarray(out - ref)) / np.linalg.norm(np.asarray(ref))
    assert rel < 0.03, rel


def test_rowwise_act_scales_beat_per_tensor_on_outlier_tokens(monkeypatch):
    """LDMSEG_INT8_ACT=row gives each token its own scale, so one outlier
    row must not destroy the quantization of the others (it does with a
    single per-tensor scale)."""
    k = jax.random.PRNGKey(5)
    x = jax.random.normal(k, (64, 96))
    x = x.at[0].mul(100.0)  # outlier token
    w = jax.random.normal(jax.random.PRNGKey(6), (96, 32)) * 0.05
    ref = np.asarray(x @ w)

    monkeypatch.setenv("LDMSEG_INT8_ACT", "tensor")
    err_tensor = np.linalg.norm(
        np.asarray(int8_matmul(x, w, jnp.float32)) - ref)
    monkeypatch.setenv("LDMSEG_INT8_ACT", "row")
    err_row = np.linalg.norm(np.asarray(int8_matmul(x, w, jnp.float32)) - ref)
    assert err_row < err_tensor / 5, (err_row, err_tensor)

    # conv: per-sample scales, one outlier image
    xc = jax.random.normal(k, (3, 8, 8, 8)).at[0].mul(50.0)
    wc = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 8, 8)) * 0.1
    refc = np.asarray(jax.lax.conv_general_dilated(
        xc, wc, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")))
    # the outlier image's own quantization noise is scale-proportional and
    # identical in both modes — the per-sample win is on the OTHER images,
    # so measure the error restricted to them
    monkeypatch.setenv("LDMSEG_INT8_ACT", "tensor")
    errc_tensor = np.linalg.norm((np.asarray(
        int8_conv(xc, wc, stride=(1, 1), padding=[(1, 1), (1, 1)],
                  out_dtype=jnp.float32)) - refc)[1:])
    monkeypatch.setenv("LDMSEG_INT8_ACT", "row")
    errc_row = np.linalg.norm((np.asarray(
        int8_conv(xc, wc, stride=(1, 1), padding=[(1, 1), (1, 1)],
                  out_dtype=jnp.float32)) - refc)[1:])
    assert errc_row < errc_tensor / 5, (errc_row, errc_tensor)


def test_act_granularity_rejects_unknown(monkeypatch):
    from ldmseg_tpu.kernels.quant import act_granularity

    monkeypatch.setenv("LDMSEG_INT8_ACT", "channel")
    with pytest.raises(ValueError, match="LDMSEG_INT8_ACT"):
        act_granularity()


def test_int8_grad_raises_loudly():
    """Differentiating through the serving path must error at trace time,
    not silently return zero gradients (training with LDMSEG_INT8 set)."""
    w = jnp.ones((4, 4))
    with pytest.raises(NotImplementedError, match="not differentiable"):
        jax.grad(lambda x: int8_matmul(x, w, jnp.float32).sum())(jnp.ones((2, 4)))


def test_scope_gating(monkeypatch):
    monkeypatch.setenv("LDMSEG_INT8", "unet")
    assert not int8_enabled()
    with quant_scope("unet"):
        assert int8_enabled()
        with quant_scope("vae"):
            assert int8_enabled()  # still inside the unet extent
    assert not int8_enabled()
    monkeypatch.setenv("LDMSEG_INT8", "1")
    assert int8_enabled()
    monkeypatch.setenv("LDMSEG_INT8", "0")
    assert not int8_enabled()


def test_param_tree_identical_and_outputs_close(monkeypatch):
    """The int8 twins must expose nn.Conv/nn.Dense-identical param trees so
    any checkpoint applies in either mode, and a trained-scale forward must
    stay close to the bf16 one."""
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 8)) * 0.5
    t = jnp.array([7])

    monkeypatch.setenv("LDMSEG_INT8", "0")
    params = model.init(jax.random.PRNGKey(1), x, t)["params"]
    ref = model.apply({"params": params}, x, t)

    monkeypatch.setenv("LDMSEG_INT8", "1")
    params_q = model.init(jax.random.PRNGKey(1), x, t)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(
        params_q
    )
    shapes = jax.tree_util.tree_map(lambda a, b: a.shape == b.shape, params, params_q)
    assert all(jax.tree_util.tree_leaves(shapes))

    out = model.apply({"params": params}, x, t)  # same params, int8 compute
    rel = np.linalg.norm(np.asarray(out - ref)) / (
        np.linalg.norm(np.asarray(ref)) + 1e-8
    )
    assert rel < 0.2, rel  # random-init net; layered int8 error stays bounded


def test_int8_sampling_scan_compiles_and_is_finite(monkeypatch):
    """The full DDIM scan must trace/compile with int8 layers inside: the
    weight quantization is loop-invariant (hoisted by XLA like the bf16
    converts) and the outputs stay finite over 4 steps."""
    from ldmseg_tpu.diffusion.ddim import make_schedule
    from ldmseg_tpu.diffusion.sampling import ddim_sample
    from ldmseg_tpu.models.unet import CondUNet, tiny_unet_config

    monkeypatch.setenv("LDMSEG_INT8", "unet")
    cfg = tiny_unet_config()
    model = CondUNet(cfg)
    rgb = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4)) * 0.3
    x = jnp.concatenate([rgb, rgb], axis=-1)
    params = model.init(jax.random.PRNGKey(1), x, jnp.array([0]))["params"]
    sched = make_schedule(num_train_timesteps=1000)

    def denoise(inputs, t, context):
        return model.apply({"params": params}, inputs,
                           jnp.full((inputs.shape[0],), t))[..., :4]

    out = jax.jit(
        lambda r: ddim_sample(denoise, sched, r, rgb, num_inference_steps=4,
                              latent_shape=(1, 8, 8, 4))
    )(jax.random.PRNGKey(2))
    assert out.shape == (1, 8, 8, 4)
    assert bool(jnp.isfinite(out).all())


def test_unet_scope_excludes_vae(monkeypatch):
    """LDMSEG_INT8=unet must leave the VAEs byte-identical to bf16."""
    from ldmseg_tpu.models.vae_sd import SDVAE, SDVAEConfig

    cfg = SDVAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                      norm_num_groups=4)
    model = SDVAE(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 3))

    monkeypatch.setenv("LDMSEG_INT8", "0")
    params = model.init({"params": jax.random.PRNGKey(1)}, x, None, False)["params"]
    ref = model.apply(
        {"params": params}, x, None, False,
        method=lambda m, a, r, sp: m.encode(a, r, sample_posterior=sp),
    )

    monkeypatch.setenv("LDMSEG_INT8", "unet")
    out = model.apply(
        {"params": params}, x, None, False,
        method=lambda m, a, r, sp: m.encode(a, r, sample_posterior=sp),
    )
    for a, b in zip(jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
