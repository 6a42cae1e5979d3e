"""Synthesized FULL torch-checkpoint key sets (key -> shape) for every module
of the released V-Express weights, written down independently from the
importer so a misspelled mapping cannot hide (VERDICT r1 item 7 / missing #6).

Sources of truth for the naming:
  * SD1.5 UNet / diffusers conventions as instantiated by the reference
    (/root/reference/modules/unet_2d_condition.py, unet_3d.py — standard
    diffusers state-dict naming: down_blocks.{i}.resnets.{j}.*, attentions,
    transformer_blocks.0.attn1/attn2/ff.net.{0,2}, time_embedding.linear_{1,2})
  * V-Express additions: attn1_5/norm1_5 (modules/attention.py:336-348),
    motion modules (modules/motion_module.py: temporal_transformer.{norm,
    proj_in, transformer_blocks.0.attention_blocks.{0,1}, norms.{0,1}, ff,
    ff_norm, proj_out})
  * VKpsGuider (modules/v_kps_guider.py:10-45: conv_in, blocks.{0..5}, conv_out)
  * AudioProjection (modules/audio_projection.py:89-150: pos_emb (Embedding),
    latents, proj_in, layers.{i}.{0,1}, proj_out, norm_out)
"""

from __future__ import annotations

from typing import Dict, Tuple

Shape = Tuple[int, ...]
SD = Dict[str, Shape]


def _ln(prefix: str, dim: int) -> SD:
    return {f"{prefix}.weight": (dim,), f"{prefix}.bias": (dim,)}


def _attn(prefix: str, dim: int, kv_dim: int) -> SD:
    """diffusers Attention: qkv bias-free, to_out.0 with bias."""
    return {
        f"{prefix}.to_q.weight": (dim, dim),
        f"{prefix}.to_k.weight": (dim, kv_dim),
        f"{prefix}.to_v.weight": (dim, kv_dim),
        f"{prefix}.to_out.0.weight": (dim, dim),
        f"{prefix}.to_out.0.bias": (dim,),
    }


def _geglu_ff(prefix: str, dim: int, mult: int = 4) -> SD:
    return {
        f"{prefix}.net.0.proj.weight": (2 * mult * dim, dim),
        f"{prefix}.net.0.proj.bias": (2 * mult * dim,),
        f"{prefix}.net.2.weight": (dim, mult * dim),
        f"{prefix}.net.2.bias": (dim,),
    }


def _resnet(prefix: str, cin: int, cout: int, temb: int) -> SD:
    d = {
        f"{prefix}.norm1.weight": (cin,),
        f"{prefix}.norm1.bias": (cin,),
        f"{prefix}.conv1.weight": (cout, cin, 3, 3),
        f"{prefix}.conv1.bias": (cout,),
        f"{prefix}.time_emb_proj.weight": (cout, temb),
        f"{prefix}.time_emb_proj.bias": (cout,),
        f"{prefix}.norm2.weight": (cout,),
        f"{prefix}.norm2.bias": (cout,),
        f"{prefix}.conv2.weight": (cout, cout, 3, 3),
        f"{prefix}.conv2.bias": (cout,),
    }
    if cin != cout:
        d[f"{prefix}.conv_shortcut.weight"] = (cout, cin, 1, 1)
        d[f"{prefix}.conv_shortcut.bias"] = (cout,)
    return d


def _basic_transformer_block(prefix: str, dim: int, cross: int, temporal: bool) -> SD:
    d: SD = {}
    d.update(_attn(f"{prefix}.attn1", dim, dim))
    d.update(_ln(f"{prefix}.norm1", dim))
    if temporal:  # reference-injection attention (attention.py:336-348)
        d.update(_attn(f"{prefix}.attn1_5", dim, dim))
        d.update(_ln(f"{prefix}.norm1_5", dim))
    d.update(_attn(f"{prefix}.attn2", dim, cross))
    d.update(_ln(f"{prefix}.norm2", dim))
    d.update(_geglu_ff(f"{prefix}.ff", dim))
    d.update(_ln(f"{prefix}.norm3", dim))
    return d


def _spatial_transformer(prefix: str, dim: int, cross: int, temporal: bool) -> SD:
    d = {
        f"{prefix}.norm.weight": (dim,),
        f"{prefix}.norm.bias": (dim,),
        f"{prefix}.proj_in.weight": (dim, dim, 1, 1),
        f"{prefix}.proj_in.bias": (dim,),
        f"{prefix}.proj_out.weight": (dim, dim, 1, 1),
        f"{prefix}.proj_out.bias": (dim,),
    }
    d.update(_basic_transformer_block(f"{prefix}.transformer_blocks.0", dim, cross, temporal))
    return d


def _motion_module(prefix: str, dim: int, max_len: int = 32) -> SD:
    p = f"{prefix}.temporal_transformer"
    d = {
        f"{p}.norm.weight": (dim,),
        f"{p}.norm.bias": (dim,),
        f"{p}.proj_in.weight": (dim, dim),
        f"{p}.proj_in.bias": (dim,),
        f"{p}.proj_out.weight": (dim, dim),
        f"{p}.proj_out.bias": (dim,),
    }
    tb = f"{p}.transformer_blocks.0"
    for i in range(2):  # 2x Temporal_Self (inference_v2.yaml:17)
        d.update(_attn(f"{tb}.attention_blocks.{i}", dim, dim))
        d.update(_ln(f"{tb}.norms.{i}", dim))
        # sinusoidal PE buffer — present in checkpoints, skipped by importer
        d[f"{tb}.attention_blocks.{i}.pos_encoder.pe"] = (1, max_len, dim)
    d.update(_geglu_ff(f"{tb}.ff", dim))
    d.update(_ln(f"{tb}.ff_norm", dim))
    return d


def unet_keys(
    temporal: bool,
    motion: bool = False,
    mid_motion: bool = True,
    ch: Tuple[int, ...] = (320, 640, 1280, 1280),
    layers: int = 2,
    cross: int = 768,
    in_ch: int = 4,
    out_ch: int = 4,
) -> SD:
    """Full SD1.5-shaped UNet state dict keys. temporal=False: the 2D
    reference net; temporal=True (+motion): the 3D denoising UNet."""
    temb = ch[0] * 4
    d: SD = {
        "conv_in.weight": (ch[0], in_ch, 3, 3),
        "conv_in.bias": (ch[0],),
        "time_embedding.linear_1.weight": (temb, ch[0]),
        "time_embedding.linear_1.bias": (temb,),
        "time_embedding.linear_2.weight": (temb, temb),
        "time_embedding.linear_2.bias": (temb,),
        "conv_norm_out.weight": (ch[0],),
        "conv_norm_out.bias": (ch[0],),
        "conv_out.weight": (out_ch, ch[0], 3, 3),
        "conv_out.bias": (out_ch,),
    }

    skips = [ch[0]]
    cin = ch[0]
    for b in range(4):
        cout = ch[b]
        has_attn = b != 3
        for l in range(layers):
            d.update(_resnet(f"down_blocks.{b}.resnets.{l}", cin if l == 0 else cout, cout, temb))
            if has_attn:
                d.update(_spatial_transformer(f"down_blocks.{b}.attentions.{l}", cout, cross, temporal))
            if temporal and motion:
                d.update(_motion_module(f"down_blocks.{b}.motion_modules.{l}", cout))
            skips.append(cout)
        if b != 3:
            d[f"down_blocks.{b}.downsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            d[f"down_blocks.{b}.downsamplers.0.conv.bias"] = (cout,)
            skips.append(cout)
        cin = cout

    d.update(_resnet("mid_block.resnets.0", ch[3], ch[3], temb))
    d.update(_spatial_transformer("mid_block.attentions.0", ch[3], cross, temporal))
    if temporal and motion and mid_motion:
        d.update(_motion_module("mid_block.motion_modules.0", ch[3]))
    d.update(_resnet("mid_block.resnets.1", ch[3], ch[3], temb))

    rev = list(reversed(ch))
    prev = ch[3]
    for b in range(4):
        cout = rev[b]
        has_attn = b != 0
        for l in range(layers + 1):
            skip = skips.pop()
            d.update(_resnet(f"up_blocks.{b}.resnets.{l}", prev + skip, cout, temb))
            prev = cout
            if has_attn:
                d.update(_spatial_transformer(f"up_blocks.{b}.attentions.{l}", cout, cross, temporal))
            if temporal and motion:
                d.update(_motion_module(f"up_blocks.{b}.motion_modules.{l}", cout))
        if b != 3:
            d[f"up_blocks.{b}.upsamplers.0.conv.weight"] = (cout, cout, 3, 3)
            d[f"up_blocks.{b}.upsamplers.0.conv.bias"] = (cout,)
    assert not skips
    return d


def reference_net_keys() -> SD:
    return unet_keys(temporal=False)


def denoising_unet_keys() -> SD:
    return unet_keys(temporal=True, motion=True, mid_motion=True)


def v_kps_guider_keys(ch: Tuple[int, ...] = (16, 32, 96, 256), out: int = 320) -> SD:
    d: SD = {"conv_in.weight": (ch[0], 3, 3, 3), "conv_in.bias": (ch[0],)}
    for i in range(len(ch) - 1):
        d[f"blocks.{2 * i}.weight"] = (ch[i], ch[i], 3, 3)
        d[f"blocks.{2 * i}.bias"] = (ch[i],)
        d[f"blocks.{2 * i + 1}.weight"] = (ch[i + 1], ch[i], 3, 3)
        d[f"blocks.{2 * i + 1}.bias"] = (ch[i + 1],)
    d["conv_out.weight"] = (out, ch[-1], 3, 3)
    d["conv_out.bias"] = (out,)
    return d


def audio_projection_keys(
    dim: int = 768, depth: int = 4, dim_head: int = 64, heads: int = 12,
    num_queries: int = 5, embedding_dim: int = 768, output_dim: int = 768,
    ff_mult: int = 4, max_seq_len: int = 10,
) -> SD:
    inner = dim_head * heads
    d: SD = {
        "pos_emb.weight": (max_seq_len, embedding_dim),
        "latents": (1, num_queries, dim),
        "proj_in.weight": (dim, embedding_dim),
        "proj_in.bias": (dim,),
        "proj_out.weight": (output_dim, dim),
        "proj_out.bias": (output_dim,),
        "norm_out.weight": (output_dim,),
        "norm_out.bias": (output_dim,),
    }
    for i in range(depth):
        a = f"layers.{i}.0"
        d.update(_ln(f"{a}.norm1", dim))
        d.update(_ln(f"{a}.norm2", dim))
        d[f"{a}.to_q.weight"] = (inner, dim)
        d[f"{a}.to_kv.weight"] = (inner * 2, dim)
        d[f"{a}.to_out.weight"] = (dim, inner)
        f = f"layers.{i}.1"
        d.update(_ln(f"{f}.0", dim))
        d[f"{f}.1.weight"] = (dim * ff_mult, dim)
        d[f"{f}.3.weight"] = (dim, dim * ff_mult)
    return d
