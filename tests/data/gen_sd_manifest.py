"""Generate the SD v1-4 diffusers state-dict key/shape manifest.

The manifest is the authoritative oracle for the torch->flax converters
(tests/test_convert_sd.py): it enumerates every key and shape of
``CompVis/stable-diffusion-v1-4``'s ``unet/diffusion_pytorch_model.bin``
and ``vae/diffusion_pytorch_model.bin`` as produced by
``diffusers.UNet2DConditionModel.from_pretrained(...).state_dict()`` /
``AutoencoderKL...`` with modern (>=0.15) attention naming.

This environment has no network access and no diffusers install, so the
layout is derived here from the diffusers module-construction rules
(unet_2d_condition.py / autoencoder_kl.py constructor logic for the v1-4
config) and VERIFIED against two independent published facts:

  * UNet parameter total = 859,520,964  (sd-v1-4 unet, model.num_parameters())
  * VAE  parameter total =  83,653,863  (sd-v1-4 vae)

A wrong key set or shape cannot sum to these exact totals by accident.
Run:  python tests/data/gen_sd_manifest.py   (rewrites the two json files)
"""

import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))


def unet_manifest():
    m = {}

    def p(name, *shape):
        assert name not in m, name
        m[name] = list(shape)

    bo = [320, 640, 1280, 1280]  # block_out_channels
    temb = 1280                  # time_embed_dim = 4 * bo[0]
    ctx = 768                    # cross_attention_dim
    layers = 2                   # layers_per_block

    def resnet(pre, cin, cout, time=True):
        p(f"{pre}.norm1.weight", cin)
        p(f"{pre}.norm1.bias", cin)
        p(f"{pre}.conv1.weight", cout, cin, 3, 3)
        p(f"{pre}.conv1.bias", cout)
        if time:
            p(f"{pre}.time_emb_proj.weight", cout, temb)
            p(f"{pre}.time_emb_proj.bias", cout)
        p(f"{pre}.norm2.weight", cout)
        p(f"{pre}.norm2.bias", cout)
        p(f"{pre}.conv2.weight", cout, cout, 3, 3)
        p(f"{pre}.conv2.bias", cout)
        if cin != cout:
            p(f"{pre}.conv_shortcut.weight", cout, cin, 1, 1)
            p(f"{pre}.conv_shortcut.bias", cout)

    def attention(pre, c):
        # Transformer2DModel, use_linear_projection=False: 1x1 conv proj
        p(f"{pre}.norm.weight", c)
        p(f"{pre}.norm.bias", c)
        p(f"{pre}.proj_in.weight", c, c, 1, 1)
        p(f"{pre}.proj_in.bias", c)
        t = f"{pre}.transformer_blocks.0"
        p(f"{t}.norm1.weight", c)
        p(f"{t}.norm1.bias", c)
        for n in ("to_q", "to_k", "to_v"):
            p(f"{t}.attn1.{n}.weight", c, c)
        p(f"{t}.attn1.to_out.0.weight", c, c)
        p(f"{t}.attn1.to_out.0.bias", c)
        p(f"{t}.norm2.weight", c)
        p(f"{t}.norm2.bias", c)
        p(f"{t}.attn2.to_q.weight", c, c)
        p(f"{t}.attn2.to_k.weight", c, ctx)
        p(f"{t}.attn2.to_v.weight", c, ctx)
        p(f"{t}.attn2.to_out.0.weight", c, c)
        p(f"{t}.attn2.to_out.0.bias", c)
        p(f"{t}.norm3.weight", c)
        p(f"{t}.norm3.bias", c)
        # GEGLU feed-forward: proj to 2 * (4c), out from 4c
        p(f"{t}.ff.net.0.proj.weight", 8 * c, c)
        p(f"{t}.ff.net.0.proj.bias", 8 * c)
        p(f"{t}.ff.net.2.weight", c, 4 * c)
        p(f"{t}.ff.net.2.bias", c)
        p(f"{pre}.proj_out.weight", c, c, 1, 1)
        p(f"{pre}.proj_out.bias", c)

    p("conv_in.weight", bo[0], 4, 3, 3)
    p("conv_in.bias", bo[0])
    p("time_embedding.linear_1.weight", temb, bo[0])
    p("time_embedding.linear_1.bias", temb)
    p("time_embedding.linear_2.weight", temb, temb)
    p("time_embedding.linear_2.bias", temb)

    # down: CrossAttnDownBlock2D x3 + DownBlock2D
    cin = bo[0]
    for i in range(4):
        cout = bo[i]
        for j in range(layers):
            resnet(f"down_blocks.{i}.resnets.{j}", cin if j == 0 else cout, cout)
            if i < 3:
                attention(f"down_blocks.{i}.attentions.{j}", cout)
        if i < 3:
            p(f"down_blocks.{i}.downsamplers.0.conv.weight", cout, cout, 3, 3)
            p(f"down_blocks.{i}.downsamplers.0.conv.bias", cout)
        cin = cout

    resnet("mid_block.resnets.0", bo[3], bo[3])
    attention("mid_block.attentions.0", bo[3])
    resnet("mid_block.resnets.1", bo[3], bo[3])

    # up: UpBlock2D + CrossAttnUpBlock2D x3 (3 resnets each; skip concat)
    rev = bo[::-1]  # [1280, 1280, 640, 320]
    prev = rev[0]
    for i in range(4):
        cout = rev[i]
        skip_in = rev[min(i + 1, 3)]
        for j in range(3):
            res_skip = skip_in if j == 2 else cout
            res_in = prev if j == 0 else cout
            resnet(f"up_blocks.{i}.resnets.{j}", res_in + res_skip, cout)
            if i > 0:
                attention(f"up_blocks.{i}.attentions.{j}", cout)
        if i < 3:
            p(f"up_blocks.{i}.upsamplers.0.conv.weight", cout, cout, 3, 3)
            p(f"up_blocks.{i}.upsamplers.0.conv.bias", cout)
        prev = cout

    p("conv_norm_out.weight", bo[0])
    p("conv_norm_out.bias", bo[0])
    p("conv_out.weight", 4, bo[0], 3, 3)
    p("conv_out.bias", 4)
    return m


def vae_manifest():
    m = {}

    def p(name, *shape):
        assert name not in m, name
        m[name] = list(shape)

    bo = [128, 256, 512, 512]
    latent = 4

    def resnet(pre, cin, cout):
        p(f"{pre}.norm1.weight", cin)
        p(f"{pre}.norm1.bias", cin)
        p(f"{pre}.conv1.weight", cout, cin, 3, 3)
        p(f"{pre}.conv1.bias", cout)
        p(f"{pre}.norm2.weight", cout)
        p(f"{pre}.norm2.bias", cout)
        p(f"{pre}.conv2.weight", cout, cout, 3, 3)
        p(f"{pre}.conv2.bias", cout)
        if cin != cout:
            p(f"{pre}.conv_shortcut.weight", cout, cin, 1, 1)
            p(f"{pre}.conv_shortcut.bias", cout)

    def attention(pre, c):
        # VAE single-head attention (modern naming, Linear with bias)
        p(f"{pre}.group_norm.weight", c)
        p(f"{pre}.group_norm.bias", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            p(f"{pre}.{n}.weight", c, c)
            p(f"{pre}.{n}.bias", c)

    p("encoder.conv_in.weight", bo[0], 3, 3, 3)
    p("encoder.conv_in.bias", bo[0])
    cin = bo[0]
    for i in range(4):
        cout = bo[i]
        for j in range(2):
            resnet(f"encoder.down_blocks.{i}.resnets.{j}",
                   cin if j == 0 else cout, cout)
        if i < 3:
            p(f"encoder.down_blocks.{i}.downsamplers.0.conv.weight",
              cout, cout, 3, 3)
            p(f"encoder.down_blocks.{i}.downsamplers.0.conv.bias", cout)
        cin = cout
    resnet("encoder.mid_block.resnets.0", bo[3], bo[3])
    attention("encoder.mid_block.attentions.0", bo[3])
    resnet("encoder.mid_block.resnets.1", bo[3], bo[3])
    p("encoder.conv_norm_out.weight", bo[3])
    p("encoder.conv_norm_out.bias", bo[3])
    p("encoder.conv_out.weight", 2 * latent, bo[3], 3, 3)
    p("encoder.conv_out.bias", 2 * latent)
    p("quant_conv.weight", 2 * latent, 2 * latent, 1, 1)
    p("quant_conv.bias", 2 * latent)

    p("post_quant_conv.weight", latent, latent, 1, 1)
    p("post_quant_conv.bias", latent)
    p("decoder.conv_in.weight", bo[3], latent, 3, 3)
    p("decoder.conv_in.bias", bo[3])
    resnet("decoder.mid_block.resnets.0", bo[3], bo[3])
    attention("decoder.mid_block.attentions.0", bo[3])
    resnet("decoder.mid_block.resnets.1", bo[3], bo[3])
    rev = bo[::-1]  # [512, 512, 256, 128]
    prev = rev[0]
    for i in range(4):
        cout = rev[i]
        for j in range(3):
            resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                   prev if j == 0 else cout, cout)
        if i < 3:
            p(f"decoder.up_blocks.{i}.upsamplers.0.conv.weight",
              cout, cout, 3, 3)
            p(f"decoder.up_blocks.{i}.upsamplers.0.conv.bias", cout)
        prev = cout
    p("decoder.conv_norm_out.weight", bo[0])
    p("decoder.conv_norm_out.bias", bo[0])
    p("decoder.conv_out.weight", 3, bo[0], 3, 3)
    p("decoder.conv_out.bias", 3)
    return m


def count(m):
    total = 0
    for shape in m.values():
        n = 1
        for s in shape:
            n *= s
        total += n
    return total


if __name__ == "__main__":
    unet = unet_manifest()
    vae = vae_manifest()
    n_unet, n_vae = count(unet), count(vae)
    print(f"unet: {len(unet)} keys, {n_unet:,} params")
    print(f"vae:  {len(vae)} keys, {n_vae:,} params")
    # independent published checksums (diffusers model.num_parameters())
    assert n_unet == 859_520_964, n_unet
    assert n_vae == 83_653_863, n_vae
    with open(os.path.join(HERE, "sd_v1_4_unet_manifest.json"), "w") as f:
        json.dump(unet, f, indent=0)
    with open(os.path.join(HERE, "sd_v1_4_vae_manifest.json"), "w") as f:
        json.dump(vae, f, indent=0)
    print("wrote manifests")
