"""Torch -> flax weight converters for the reference networks.

These make reference-trained checkpoints loadable in-framework and back the
numeric-parity tests: a torch ``state_dict`` of the reference module
(/root/reference/unet_model.py:189-323 ``Unet``,
/root/reference/h_vae_model_copy.py:91-137 ``ResVAE`` / :457-547 ``ResVAEN``,
/root/reference/unet_openai.py:361-577 ``UNetModel``) is mapped onto the
matching flax module's variables, after which outputs agree to float
tolerance (tests/test_torch_parity.py).

Layout conventions converted here:
- Conv2d ``(O, I, kH, kW)`` -> flax ``(kH, kW, I, O)``.
- ConvTranspose2d ``(I, O, kH, kW)`` -> flax ConvTranspose
  ``(kH, kW, I, O)`` with the SPATIAL TAPS FLIPPED: torch's transposed conv
  is the gradient of a correlation, flax's ``padding='SAME'`` path is a
  fractionally-strided correlation, and the two coincide exactly under a
  spatial flip (verified numerically for the k=4/s=2/p=1 Up/Downsample
  shapes, unet_model.py:29-33).
- Linear ``(O, I)`` -> ``(I, O)``.
- Dense heads that flatten conv features permute their input (or output)
  basis between torch's NCHW and this repo's NHWC flatten order
  (h_vae_model_copy.py:68-70 mu/logvar heads, :104-126 z_lin).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _np(v):
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _conv(sd, name, bias=True):
    out = {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0))}
    if bias:
        out["bias"] = jnp.asarray(_np(sd[f"{name}.bias"]))
    return out


def _conv_transpose(sd, name):
    w = _np(sd[f"{name}.weight"])  # (I, O, kH, kW)
    return {
        "kernel": jnp.asarray(w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()),
        "bias": jnp.asarray(_np(sd[f"{name}.bias"])),
    }


def _dense(sd, name):
    return {"kernel": jnp.asarray(_np(sd[f"{name}.weight"]).T),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _norm(sd, name):
    return {"scale": jnp.asarray(_np(sd[f"{name}.weight"])),
            "bias": jnp.asarray(_np(sd[f"{name}.bias"]))}


def _bn(sd, name):
    params = _norm(sd, name)
    stats = {"mean": jnp.asarray(_np(sd[f"{name}.running_mean"])),
             "var": jnp.asarray(_np(sd[f"{name}.running_var"]))}
    return params, stats


# ---------------------------------------------------------------------------
# Latent score UNet (unet_model.py Unet -> nn/unet.py LatentUNet)
# ---------------------------------------------------------------------------

def _convnext_block(sd, prefix, has_time):
    """ConvNextBlock (unet_model.py:92-124) -> nn/blocks.py ConvNeXtBlock."""
    out = {
        "ds_conv": _conv(sd, f"{prefix}.ds_conv"),
        "norm1": _norm(sd, f"{prefix}.net.0"),
        "conv1": _conv(sd, f"{prefix}.net.1"),
        "norm2": _norm(sd, f"{prefix}.net.3"),
        "conv2": _conv(sd, f"{prefix}.net.4"),
    }
    if has_time and f"{prefix}.mlp.1.weight" in sd:
        out["time_proj"] = _dense(sd, f"{prefix}.mlp.1")
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _resnet_block(sd, prefix, has_time):
    """ResnetBlock (unet_model.py:67-90) -> nn/blocks.py ResnetBlock."""
    out = {
        "block1": {"proj": _conv(sd, f"{prefix}.block1.proj"),
                   "norm": _norm(sd, f"{prefix}.block1.norm")},
        "block2": {"proj": _conv(sd, f"{prefix}.block2.proj"),
                   "norm": _norm(sd, f"{prefix}.block2.norm")},
    }
    if has_time and f"{prefix}.mlp.1.weight" in sd:
        out["time_proj"] = _dense(sd, f"{prefix}.mlp.1")
    if f"{prefix}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{prefix}.res_conv")
    return out


def _attention(sd, prefix, linear):
    """(Linear)Attention inside Residual(PreNorm(.)) (unet_model.py:126-187).

    Returns (attn_params, prenorm_params): flax adopts the attention module
    at the UNet's top level (LinearAttention_k / Attention_k) while the
    PreNorm GroupNorm lives under the named ``*_attn`` wrapper.
    """
    attn = {"to_qkv": _conv(sd, f"{prefix}.fn.fn.to_qkv", bias=False)}
    if linear:
        attn["to_out"] = _conv(sd, f"{prefix}.fn.fn.to_out.0")
        attn["out_norm"] = _norm(sd, f"{prefix}.fn.fn.to_out.1")
    else:
        attn["to_out"] = _conv(sd, f"{prefix}.fn.fn.to_out")
    return attn, {"norm": _norm(sd, f"{prefix}.fn.norm")}


def load_torch_unet(state_dict, n_resolutions: int, use_convnext: bool = True):
    """Reference ``Unet.state_dict()`` -> ``LatentUNet`` params dict.

    ``n_resolutions`` = len(dim_mults). The flax module must be built with
    the same (dim, init_dim, channels, dim_mults, use_convnext) config.
    """
    sd = {k: v for k, v in state_dict.items()}
    block = _convnext_block if use_convnext else _resnet_block
    params = {
        "init_conv": _conv(sd, "init_conv"),
        "final_block": block(sd, "final_conv.0", has_time=False),
        "final_conv": _conv(sd, "final_conv.1"),
    }
    if "time_mlp.1.weight" in sd:  # absent for with_time_emb=False (NorUnet)
        params["time_mlp"] = {"fc1": _dense(sd, "time_mlp.1"),
                              "fc2": _dense(sd, "time_mlp.3")}
    n = n_resolutions
    lin_idx = 0
    for i in range(n):
        params[f"down{i}_block1"] = block(sd, f"downs.{i}.0", True)
        params[f"down{i}_block2"] = block(sd, f"downs.{i}.1", True)
        attn, pre = _attention(sd, f"downs.{i}.2", linear=True)
        params[f"LinearAttention_{lin_idx}"] = attn
        params[f"down{i}_attn"] = pre
        lin_idx += 1
        if i < n - 1:
            params[f"down{i}_down"] = _conv(sd, f"downs.{i}.3")
    params["mid_block1"] = block(sd, "mid_block1", True)
    attn, pre = _attention(sd, "mid_attn", linear=False)
    params["Attention_0"] = attn
    params["mid_attn"] = pre
    params["mid_block2"] = block(sd, "mid_block2", True)
    for j in range(n - 1):
        params[f"up{j}_block1"] = block(sd, f"ups.{j}.0", True)
        params[f"up{j}_block2"] = block(sd, f"ups.{j}.1", True)
        attn, pre = _attention(sd, f"ups.{j}.2", linear=True)
        params[f"LinearAttention_{lin_idx}"] = attn
        params[f"up{j}_attn"] = pre
        lin_idx += 1
        params[f"up{j}_up"] = _conv_transpose(sd, f"ups.{j}.3")
    return params


# ---------------------------------------------------------------------------
# ADM UNet (unet_openai.py UNetModel -> nn/unet_adm.py ADMUNet)
# ---------------------------------------------------------------------------

def _adm_res_block(sd, prefix):
    """ADM ResBlock (unet_openai.py:216-306) -> ADMResBlock params."""
    out = {
        "in_norm": _norm(sd, f"{prefix}.in_layers.0"),
        "in_conv": _conv(sd, f"{prefix}.in_layers.2"),
        "emb_proj": _dense(sd, f"{prefix}.emb_layers.1"),
        "out_norm": _norm(sd, f"{prefix}.out_layers.0"),
        "out_conv": _conv(sd, f"{prefix}.out_layers.3"),
    }
    if f"{prefix}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{prefix}.skip_connection")
    return out


def _adm_attention(sd, prefix, num_heads):
    """ADM AttentionBlock (unet_openai.py:308-359) -> ADMAttentionBlock.

    Layout bridge: torch's ``QKVAttention`` reshapes the 3C qkv channels to
    (B*heads, 3d, T), so its channel order is per-HEAD-interleaved
    [h0:(q,k,v), h1:(q,k,v), ...]; the flax module splits the last axis into
    three contiguous thirds [q(all heads), k, v]. The conv1d weights/bias
    are permuted accordingly (pure relabeling - identical attention).
    """
    qw = _np(sd[f"{prefix}.qkv.weight"])[:, :, 0]  # (3C, C)
    qb = _np(sd[f"{prefix}.qkv.bias"])
    C = qw.shape[0] // 3
    d = C // num_heads
    # flax output index (part, h, j) <- torch channel h*3d + part*d + j.
    part, h, j = np.meshgrid(np.arange(3), np.arange(num_heads),
                             np.arange(d), indexing="ij")
    perm = (h * 3 * d + part * d + j).reshape(-1)
    pw = _np(sd[f"{prefix}.proj_out.weight"])[:, :, 0]  # (C, C)
    return {
        "norm": _norm(sd, f"{prefix}.norm"),
        "qkv": {"kernel": jnp.asarray(qw[perm].T),
                "bias": jnp.asarray(qb[perm])},
        "proj_out": {"kernel": jnp.asarray(pw.T),
                     "bias": jnp.asarray(_np(sd[f"{prefix}.proj_out.bias"]))},
    }


def load_torch_adm_unet(state_dict, model_channels: int, num_res_blocks: int,
                        channel_mult, attention_resolutions,
                        num_heads: int = 1, num_heads_upsample: int = -1):
    """Reference ``UNetModel``/``SuperResModel.state_dict()``
    (unet_openai.py:361-593) -> ``ADMUNet`` params dict.

    The structural args must match the torch constructor's; the index
    bookkeeping below mirrors the reference's ``input_blocks`` /
    ``output_blocks`` construction loops (unet_openai.py:437-526) exactly.
    """
    sd = {k: v for k, v in state_dict.items()}
    heads_up = num_heads if num_heads_upsample == -1 else num_heads_upsample
    params = {
        "time_fc1": _dense(sd, "time_embed.0"),
        "time_fc2": _dense(sd, "time_embed.2"),
        "in_conv": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
    }
    if "proj.0.weight" in sd:  # use_z (unet_openai.py:427-433)
        params["z_fc1"] = _dense(sd, "proj.0")
        params["z_fc2"] = _dense(sd, "proj.2")
    if "label_emb.weight" in sd:
        params["label_emb"] = {
            "embedding": jnp.asarray(_np(sd["label_emb.weight"]))}

    idx, ds = 0, 1
    n_levels = len(channel_mult)
    for level in range(n_levels):
        for i in range(num_res_blocks):
            idx += 1
            params[f"down{level}_{i}_res"] = _adm_res_block(
                sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"down{level}_{i}_attn"] = _adm_attention(
                    sd, f"input_blocks.{idx}.1", num_heads)
        if level != n_levels - 1:
            idx += 1
            if f"input_blocks.{idx}.0.op.weight" in sd:  # conv_resample
                params[f"down{level}_ds"] = _conv(sd, f"input_blocks.{idx}.0.op")
            ds *= 2

    params["mid_res1"] = _adm_res_block(sd, "middle_block.0")
    params["mid_attn"] = _adm_attention(sd, "middle_block.1", num_heads)
    params["mid_res2"] = _adm_res_block(sd, "middle_block.2")

    idx = 0
    for level in range(n_levels - 1, -1, -1):
        for i in range(num_res_blocks + 1):
            params[f"up{level}_{i}_res"] = _adm_res_block(
                sd, f"output_blocks.{idx}.0")
            li = 1
            if ds in attention_resolutions:
                params[f"up{level}_{i}_attn"] = _adm_attention(
                    sd, f"output_blocks.{idx}.{li}", heads_up)
                li += 1
            if level and i == num_res_blocks:
                if f"output_blocks.{idx}.{li}.conv.weight" in sd:
                    params[f"up{level}_us"] = _conv(
                        sd, f"output_blocks.{idx}.{li}.conv")
                ds //= 2
            idx += 1
    return params


# ---------------------------------------------------------------------------
# ResVAE / ResVAEN (h_vae_model_copy.py) -> models/vae.py ResVAE
# ---------------------------------------------------------------------------

def _rblock(sd, prefix):
    """RBlock/RBlockN (h_vae_model_copy.py:9-39/347-377) -> ResBlock."""
    bn1_p, bn1_s = _bn(sd, f"{prefix}.conv.1")
    bn2_p, bn2_s = _bn(sd, f"{prefix}.conv.4")
    params = {
        "conv1": _conv(sd, f"{prefix}.conv.0", bias=False),
        "bn1": bn1_p,
        "conv2": _conv(sd, f"{prefix}.conv.3", bias=False),
        "bn2": bn2_p,
    }
    stats = {"bn1": bn1_s, "bn2": bn2_s}
    # size_conv exists in the torch module even when unused; only map it
    # when the flax module created one (in_width != out_width).
    return params, stats


def _nchw_to_nhwc_in_perm(C, H, W):
    """Permutation p with flax_flat[i] = torch_flat[p[i]] for flattened
    feature maps: torch NCHW order c*H*W+h*W+w, flax NHWC order
    h*W*C+w*C+c."""
    h, w, c = np.meshgrid(np.arange(H), np.arange(W), np.arange(C),
                          indexing="ij")
    return (c * H * W + h * W + w).reshape(-1)


def _res_encoder(sd, prefix, enc_channel_list, size_in: int):
    """ResEncoder(N) subtree (h_vae_model_copy.py:41-71/379-409) ->
    ``models.vae.ResEncoder`` (params, batch_stats). ``prefix`` includes the
    trailing dot (e.g. ``"enc."``)."""
    params: dict = {"stem_conv": _conv(sd, f"{prefix}ch_enc.0")}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, f"{prefix}ch_enc.1")

    for i, (cin, mid, out, rate) in enumerate(enc_channel_list):
        p, s = _rblock(sd, f"{prefix}r_blocks.{i}")
        if cin != out:
            p["size_conv"] = _conv(sd, f"{prefix}r_blocks.{i}.size_conv",
                                   bias=False)
        params[f"block{i}"], stats[f"block{i}"] = p, s

    # mu/logvar heads: torch flattens the NCHW half-map; flax the NHWC one.
    feat_size = size_in // 2
    for _, _, _, rate in enc_channel_list:
        feat_size //= rate
    c_half = enc_channel_list[-1][2] // 2
    perm = _nchw_to_nhwc_in_perm(c_half, feat_size, feat_size)
    for tname, fname in ((f"{prefix}mu_lin", "mu_lin"),
                         (f"{prefix}logvar_lin", "logvar_lin")):
        w = _np(sd[f"{tname}.weight"])  # (size_z, flat)
        params[fname] = {
            "kernel": jnp.asarray(w[:, perm].T),
            "bias": jnp.asarray(_np(sd[f"{tname}.bias"])),
        }
    return params, stats


def _res_decoder(sd, prefix, z_lin_name, dec_channel_list, size_in: int):
    """ResDecoder(N) subtree + its z_lin (h_vae_model_copy.py:73-89/411-428;
    z_lin lives on the parent module, h_vae_model_copy.py:104-126) ->
    ``models.vae.ResDecoder`` (params, batch_stats)."""
    params: dict = {}
    stats: dict = {}

    # z_lin: torch output reshapes to NCHW, flax to NHWC.
    dec_init = size_in
    for _, _, _, rate in dec_channel_list:
        dec_init //= rate
    c0 = dec_channel_list[0][0]
    out_perm = _nchw_to_nhwc_in_perm(c0, dec_init, dec_init)
    zw = _np(sd[f"{z_lin_name}.weight"])  # (flat, size_z)
    zb = _np(sd[f"{z_lin_name}.bias"])
    params["z_lin"] = {"kernel": jnp.asarray(zw[out_perm].T),
                       "bias": jnp.asarray(zb[out_perm])}

    for i, (cin, mid, out, rate) in enumerate(dec_channel_list):
        p, s = _rblock(sd, f"{prefix}r_blocks.{i}")
        if cin != out:
            p["size_conv"] = _conv(sd, f"{prefix}r_blocks.{i}.size_conv",
                                   bias=False)
        params[f"block{i}"], stats[f"block{i}"] = p, s

    # Head: ch_dec.0 is a plain RBlock (same shape in/out, no size_conv
    # mapped), ch_dec.1 the 5x5 conv (h_vae_model_copy.py:80-84/417-424).
    p, s = _rblock(sd, f"{prefix}ch_dec.0")
    params["head_block"], stats["head_block"] = p, s
    params["head_conv"] = _conv(sd, f"{prefix}ch_dec.1")
    return params, stats


def load_torch_resvae(state_dict, enc_channel_list, dec_channel_list,
                      size_in: int, size_z: int):
    """Reference ``ResVAE``/``ResVAEN``/``ResAE(N)`` state_dict ->
    ``models.vae.ResVAE`` variables ({"params", "batch_stats"}).

    Handles the NCHW->NHWC basis permutations of the three dense layers that
    flatten/unflatten conv features (mu_lin, logvar_lin, z_lin).
    """
    sd = {k: v for k, v in state_dict.items()}
    enc_p, enc_s = _res_encoder(sd, "enc.", enc_channel_list, size_in)
    dec_p, dec_s = _res_decoder(sd, "dec.", "z_lin", dec_channel_list,
                                size_in)
    return {"params": {"enc": enc_p, "dec": dec_p},
            "batch_stats": {"enc": enc_s, "dec": dec_s}}


# ---------------------------------------------------------------------------
# Mixture-family baselines (mopoe_model.py MOPOEPolyRes / MMVAEPolyRes /
# MVPolyRes / MVTPolyRes) -> models/baselines/mixture.py
# ---------------------------------------------------------------------------

def load_torch_mixture_vaes(state_dict, n_mod: int, enc_channel_list,
                            dec_channel_list, size_in: int, size_z: int):
    """Reference mixture-baseline state_dict -> ``MixtureMultimodalVAE``
    variables.

    All four torch classes (``MOPOEPolyRes`` mopoe_model.py:310,
    ``MMVAEPolyRes`` :470, ``MVPolyRes`` :547, ``MVTPolyRes`` :644) hold the
    same ``vae_list`` of per-modality ``ResVAE``; the flax module stacks them
    along a leading modality axis (nn.vmap, variable_axes={"params": 0}), so
    the conversion is per-modality ``load_torch_resvae`` + leaf-wise stack.
    """
    per_mod = []
    for m in range(n_mod):
        prefix = f"vae_list.{m}."
        sub = {k[len(prefix):]: v for k, v in state_dict.items()
               if k.startswith(prefix)}
        per_mod.append(load_torch_resvae(sub, enc_channel_list,
                                         dec_channel_list, size_in, size_z))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_mod)
    return {"params": {"vaes": stacked["params"]},
            "batch_stats": {"vaes": stacked["batch_stats"]}}


# ---------------------------------------------------------------------------
# MMVAE+ (mmplus_model.py PolyMNIST_10modalities) -> models/baselines/mmplus.py
# ---------------------------------------------------------------------------

def load_torch_mmplus(state_dict, n_mod: int, enc_channel_list,
                      dec_channel_list, size_in: int, dim_u: int):
    """Reference ``PolyMNIST_10modalities`` state_dict (mmplus_model.py:
    197-385) -> ``MMVAEPlus(arch='res')`` variables.

    Each torch modality VAE wraps the house nets: ``Enc.enc`` is a plain
    ``ResEncoder`` (the softmax scale transform is functional,
    mmplus_model.py:216-218) and ``Dec`` composes its own ``z_lin`` + ReLU
    with a ``ResDecoder`` (:225-249) - exactly the composition of this
    repo's flax ``ResDecoder``. Prior params: the per-modality trainable
    w-prior raw scales (``vaes.{m}._pw_params.1``, softmax-parameterized,
    :268-275) stack into the (n_mod, latent_dim_w) ``pw_raw``.
    """
    per_enc, per_dec = [], []
    for m in range(n_mod):
        pseudo = _mmplus_vae_pseudo_sd(state_dict, m)
        enc_p, enc_s = _res_encoder(pseudo, "enc.", enc_channel_list, size_in)
        dec_p, dec_s = _res_decoder(pseudo, "dec.", "z_lin",
                                    dec_channel_list, size_in)
        per_enc.append({"p": enc_p, "s": enc_s})
        per_dec.append({"p": dec_p, "s": dec_s})
    encs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_enc)
    decs = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_dec)

    return {"params": {"encs": encs["p"], "decs": decs["p"],
                       "pw_raw": _stack_pw_raw(state_dict, n_mod,
                                               dim_u // 2)},
            "batch_stats": {"encs": encs["s"], "decs": decs["s"]}}


def _mmplus_vae_pseudo_sd(state_dict, m: int):
    """Remap modality m's wrapped-net keys (``vaes.{m}.enc.enc`` /
    ``dec.dec_`` / ``dec.z_lin``, mmplus_model.py:197-249) to the flat
    ``enc.`` / ``dec.`` / ``z_lin.`` layout the ResVAE converters expect."""
    pseudo = {}
    pe, pd, pz = (f"vaes.{m}.enc.enc.", f"vaes.{m}.dec.dec_.",
                  f"vaes.{m}.dec.z_lin.")
    for k, v in state_dict.items():
        if k.startswith(pe):
            pseudo["enc." + k[len(pe):]] = v
        elif k.startswith(pd):
            pseudo["dec." + k[len(pd):]] = v
        elif k.startswith(pz):
            pseudo["z_lin." + k[len(pz):]] = v
    return pseudo


def _stack_pw_raw(state_dict, n_mod: int, fallback_dim_w: int):
    """Stack the reference's PER-MODALITY trainable w-prior raw scales
    (``vaes.{m}._pw_params.1``, mmplus_model.py:272-275 /
    mmplus_model_cel.py:422) into the flax models' (n_mod, latent_dim_w)
    ``pw_raw`` (row m = modality m's prior, sampled per DESTINATION in the
    cross matrix). A present row fixes latent_dim_w (so a non-even w/z
    split converts correctly); ``fallback_dim_w`` only sizes the zero rows
    when the state_dict has no pw at all."""
    present = [_np(state_dict[f"vaes.{m}._pw_params.1"])[0]
               for m in range(n_mod)
               if f"vaes.{m}._pw_params.1" in state_dict]
    dim_w = present[0].shape[-1] if present else fallback_dim_w
    rows = []
    for m in range(n_mod):
        pw = state_dict.get(f"vaes.{m}._pw_params.1")
        rows.append(_np(pw)[0] if pw is not None
                    else np.zeros((dim_w,), np.float32))
    return jnp.asarray(np.stack(rows))


def load_torch_mmplus_het(state_dict, img_enc, img_dec, mask_enc, mask_dec,
                          size_in: int = 128, n_mod: int = 3):
    """Reference ``MMPLUSCeleba`` state_dict (mmplus_model_cel.py:473-519;
    modality nets :197-471) -> ``HeterogeneousMMVAEPlus`` variables over
    (celeba_image_vae, celeba_mask_vae, AttributeVAE) modules for
    ``n_mod=3``, or (celeba_image_vae, AttributeVAE) for the reference's
    2-modality (img, att) variant (mmplus_model_cel.py:481-483).

    The conv VAEs wrap ResEncoderN (``enc.enc``) and z_lin+ReLU+ResDecoderN
    (``dec.z_lin``, ``dec.dec_``) - the composition of this repo's flax
    ResVAE(variant='celeb'); the last modality is the Linear/BatchNorm1d
    attribute pair (same stack as CelebAAttrNewBN). The per-modality
    w-prior raw scales stack via ``_stack_pw_raw``."""
    if n_mod not in (2, 3):
        raise ValueError(
            f"MMPLUSCeleba has n_mod in (2, 3) (mmplus_model_cel.py:"
            f"475-483), got {n_mod}")
    params: dict = {}
    stats: dict = {}
    conv_mods = [(0, (img_enc, img_dec))]
    if n_mod == 3:
        conv_mods.append((1, (mask_enc, mask_dec)))
    for i, (enc_l, dec_l) in conv_mods:
        pseudo = _mmplus_vae_pseudo_sd(state_dict, i)
        enc_p, enc_s = _res_encoder(pseudo, "enc.", enc_l, size_in)
        dec_p, dec_s = _res_decoder(pseudo, "dec.", "z_lin", dec_l, size_in)
        params[f"modality_modules_{i}"] = {"enc": enc_p, "dec": dec_p}
        stats[f"modality_modules_{i}"] = {"enc": enc_s, "dec": dec_s}

    a = n_mod - 1  # attribute VAE is always the LAST modality
    sub = {}
    for k, v in state_dict.items():
        if k.startswith(f"vaes.{a}.enc."):
            sub[k[len(f"vaes.{a}.enc."):]] = v
        elif k.startswith(f"vaes.{a}.dec."):
            sub[k[len(f"vaes.{a}.dec."):]] = v
    attr = load_torch_attr_vae(sub)
    params[f"modality_modules_{a}"] = attr["params"]
    stats[f"modality_modules_{a}"] = attr["batch_stats"]

    dim_w = _np(state_dict[f"vaes.{a}.enc.mu_lin.bias"]).shape[0] // 2
    params["pw_raw"] = _stack_pw_raw(state_dict, n_mod, dim_w)
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Contrastive representation encoders (h_vae_model.py CelImgRep / CelMaskRep
# / CelAttrRep) -> nn/contrastive.py
# ---------------------------------------------------------------------------

def _projection_head(sd, prefix):
    """ProjectionHead (h_vae_model.py:964-985) -> nn/contrastive.py
    ProjectionHead params."""
    return {"projection": _dense(sd, f"{prefix}projection"),
            "fc": _dense(sd, f"{prefix}fc"),
            "layer_norm": _norm(sd, f"{prefix}layer_norm")}


def load_torch_rep_encoder(state_dict, channel_list, size_in: int):
    """Reference ``CelImgRep`` / ``CelMaskRep`` state_dict
    (h_vae_model.py:1040-1070: ResEncoderN + ProjectionHead) ->
    ``nn.contrastive.ImageRepEncoder`` variables."""
    sd = dict(state_dict)
    enc_p, enc_s = _res_encoder(sd, "enc.", channel_list, size_in)
    return {"params": {"enc": enc_p, "proj": _projection_head(sd, "proj.")},
            "batch_stats": {"enc": enc_s}}


def load_torch_attr_rep(state_dict):
    """Reference ``CelAttrRep`` state_dict (h_vae_model.py:987-998, encoder
    ``CelAttrEnc`` :807-836) -> ``nn.contrastive.AttrRepEncoder`` variables.
    The unused ``logvar_lin`` head is dropped (the rep encoder reads mu
    only, h_vae_model.py:995-997)."""
    sd = dict(state_dict)
    enc_p, enc_s = {}, {}
    for i in range(5):
        enc_p[f"fc{i}"] = _dense(sd, f"enc.enc_net.{3 * i}")
        enc_p[f"bn{i}"], enc_s[f"bn{i}"] = _bn(sd, f"enc.enc_net.{3 * i + 1}")
    params = {"enc": enc_p, "mu": _dense(sd, "enc.mu_lin"),
              "proj": _projection_head(sd, "proj.")}
    return {"params": params, "batch_stats": {"enc": enc_s}}


# ---------------------------------------------------------------------------
# Attribute VAE / AE (h_vae_model.py CelebAAttrNewBN*) -> models/vae.py
# ---------------------------------------------------------------------------

def load_torch_attr_vae(state_dict):
    """Reference ``CelebAAttrNewBN`` / ``...AE`` / ``...AE40`` state_dict
    (h_vae_model.py:712-962) -> ``models.vae.AttributeVAE`` variables.

    The torch nets are Linear/BatchNorm1d/ReLU stacks (Linear at Sequential
    index 3i, BN at 3i+1) with the decoder's output Linear at index 15. The
    AE flavors drop ``logvar_lin`` (h_vae_model.py:862); its flax params are
    filled with a large-negative bias so the head yields logvar ~ -60
    (std ~ 1e-13): the AE wrapper never reads them, and misusing the
    checkpoint through the VAE reparametrize path then degenerates to the
    deterministic mu an AE means, instead of silently sampling with unit
    variance (logvar=0).
    """
    sd = dict(state_dict)
    params: dict = {}
    stats: dict = {}
    for net in ("enc_net", "dec_net"):
        p, s = {}, {}
        for i in range(5):
            p[f"fc{i}"] = _dense(sd, f"{net}.{3 * i}")
            p[f"bn{i}"], s[f"bn{i}"] = _bn(sd, f"{net}.{3 * i + 1}")
        params[net], stats[net] = p, s
    params["mu_lin"] = _dense(sd, "mu_lin")
    size_z = params["mu_lin"]["bias"].shape[0]
    if "logvar_lin.weight" in sd:
        params["logvar_lin"] = _dense(sd, "logvar_lin")
    else:
        params["logvar_lin"] = {"kernel": jnp.zeros((512, size_z)),
                                "bias": jnp.full((size_z,), -60.0)}
    params["out_lin"] = _dense(sd, "dec_net.15")
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Evaluation classifiers (polymnist_model.py PMCLF, h_vae_model_copy.py
# ResCLF / ClfImg) -> models/classifiers.py
# ---------------------------------------------------------------------------

def load_torch_pmclf(state_dict):
    """Reference ``PMCLF`` state_dict (polymnist_model.py:372-392) ->
    ``PolyMNISTClassifier`` params.

    ``fc1`` consumes the flattened (128, 4, 4) conv map (NView at
    clf_net.6): its input basis is permuted from torch's NCHW flatten order
    to this repo's NHWC one.
    """
    sd = dict(state_dict)
    params = {f"conv{i}": _conv(sd, f"clf_net.{2 * i}") for i in range(3)}
    perm = _nchw_to_nhwc_in_perm(128, 4, 4)
    w = _np(sd["clf_net.7.weight"])  # (512, 2048)
    params["fc1"] = {"kernel": jnp.asarray(w[:, perm].T),
                     "bias": jnp.asarray(_np(sd["clf_net.7.bias"]))}
    params["fc2"] = _dense(sd, "clf_net.9")
    return params


def load_torch_resclf(state_dict, channel_list, size_in: int = 128):
    """Reference ``ResCLF`` state_dict (h_vae_model_copy.py:208-235) ->
    ``ResClassifier`` variables ({"params", "batch_stats"})."""
    sd = dict(state_dict)
    params: dict = {"stem_conv": _conv(sd, "ch_enc.0")}
    stats: dict = {}
    params["stem_bn"], stats["stem_bn"] = _bn(sd, "ch_enc.1")
    for i, (cin, mid, out, rate) in enumerate(channel_list):
        p, s = _rblock(sd, f"r_blocks.{i}")
        if cin != out:
            p["size_conv"] = _conv(sd, f"r_blocks.{i}.size_conv", bias=False)
        params[f"block{i}"], stats[f"block{i}"] = p, s
    feat = size_in // 2
    for _, _, _, rate in channel_list:
        feat //= rate
    perm = _nchw_to_nhwc_in_perm(channel_list[-1][2], feat, feat)
    w = _np(sd["clf_lin.weight"])
    params["clf_lin"] = {"kernel": jnp.asarray(w[:, perm].T),
                         "bias": jnp.asarray(_np(sd["clf_lin.bias"]))}
    return {"params": params, "batch_stats": stats}


def load_torch_mopoe_clf(state_dict):
    """Reference ``ClfImg`` (+ ``FeatureExtractorImg``) state_dict
    (h_vae_model_copy.py:296-342) -> ``MoPoEImageClassifier`` variables.

    The final feature map is 1x1 spatial, so the flatten basis needs no
    NCHW/NHWC permutation.
    """
    sd = dict(state_dict)
    fx = "feature_extractor"
    params: dict = {"conv1": _conv(sd, f"{fx}.conv1", bias=False),
                    "linear": _dense(sd, "linear")}
    stats: dict = {}
    for i in range(1, 5):
        prefix = f"{fx}.resblock{i}.0"
        p = {"conv1": _conv(sd, f"{prefix}.conv1", bias=False),
             "conv2": _conv(sd, f"{prefix}.conv2", bias=False),
             "down_conv": _conv(sd, f"{prefix}.downsample.0")}
        s = {}
        p["bn1"], s["bn1"] = _bn(sd, f"{prefix}.bn1")
        p["bn2"], s["bn2"] = _bn(sd, f"{prefix}.bn2")
        p["down_bn"], s["down_bn"] = _bn(sd, f"{prefix}.downsample.1")
        params[f"resblock{i}"], stats[f"resblock{i}"] = p, s
    return {"params": params, "batch_stats": stats}


# ---------------------------------------------------------------------------
# Flat MLP score nets (lat_sm2_model.py LSMPoly64_sm / Poly_sm*) ->
# nn/mlp_scores.py FlatScoreMLP
# ---------------------------------------------------------------------------

def load_torch_flat_score(state_dict):
    """Reference Linear/Softplus score-MLP state_dict (``LSMPoly64_sm``
    lat_sm2_model.py:348-371, ``Poly_sm``/``Poly_sm2`` :248-296) ->
    ``FlatScoreMLP`` params. Hidden-layer count is inferred from the keys;
    the flax module's ``hidden_mults`` must match the torch widths."""
    sd = dict(state_dict)
    n_layers = sum(1 for k in sd if k.startswith("layers.") and
                   k.endswith(".weight"))
    params = {f"fc{i}": _dense(sd, f"layers.{2 * i}")
              for i in range(n_layers - 1)}
    params["out"] = _dense(sd, f"layers.{2 * (n_layers - 1)}")
    return params


# ---------------------------------------------------------------------------
# Hierarchical VAE (h_vae_model.py HVAE -> models/hvae.py)
# ---------------------------------------------------------------------------

def _hvae_rblock(sd, prefix):
    """h_vae_model.RBlock (h_vae_model.py:7-39: 1x1/3x3/3x3/1x1 Sequential at
    conv.{0,2,4,6} + optional size_conv) -> models/hvae.py HRBlock params."""
    p = {f"conv{i + 1}": _conv(sd, f"{prefix}conv.{2 * i}") for i in range(4)}
    # The torch block always CREATES size_conv but only APPLIES it when
    # in_width != out_width (h_vae_model.py:31-33); map it only when the
    # mapped widths differ (flax creates it lazily).
    w1 = _np(sd[f"{prefix}conv.0.weight"])  # (mid, in, 1, 1)
    w4 = _np(sd[f"{prefix}conv.6.weight"])  # (out, mid, 1, 1)
    if w1.shape[1] != w4.shape[0]:
        p["size_conv"] = _conv(sd, f"{prefix}size_conv")
    return p


def _hvae_tblock(sd, prefix):
    """h_vae_model.TBlock (h_vae_model.py:42-97) -> models/hvae.py TBlock."""
    p = {}
    for tname, fname in (("conv_pr", "pr"), ("conv_q", "q")):
        for i in range(4):
            p[f"{fname}{i + 1}"] = _conv(sd, f"{prefix}{tname}.{2 * i}")
    p["conv_z"] = _conv(sd, f"{prefix}conv_z")
    p["r_block"] = _hvae_rblock(sd, f"{prefix}r_block.")
    return p


def load_torch_hvae(state_dict, enc_channel_list, dec_channel_list,
                    size_in: int, size_z: int):
    """Reference ``HVAE`` state_dict (h_vae_model.py:279-331; Encoder
    :215-244, Decoder :246-276) -> ``models.hvae.HVAE`` params.

    Handles the NCHW->NHWC basis permutations of mu_lin/logvar_lin (which
    flatten the channel-chunked HALF feature map) and of z_lin's output
    (reshaped to the decoder's initial feature map)."""
    sd = dict(state_dict)
    params: dict = {"in_conv": _conv(sd, "enc.in_conv")}
    for i in range(len(enc_channel_list)):
        params[f"enc{i}"] = _hvae_rblock(sd, f"enc.r_blocks.{i}.")

    feat_size = size_in
    for _, _, _, rate in enc_channel_list:
        feat_size //= rate
    c_half = enc_channel_list[-1][2] // 2
    perm = _nchw_to_nhwc_in_perm(c_half, feat_size, feat_size)
    for name in ("mu_lin", "logvar_lin"):
        w = _np(sd[f"enc.{name}.weight"])
        params[name] = {"kernel": jnp.asarray(w[:, perm].T),
                        "bias": jnp.asarray(_np(sd[f"enc.{name}.bias"]))}

    params["learnable_feat"] = jnp.asarray(_np(sd["learnable_feat"]))
    c0 = enc_channel_list[-1][2]
    out_perm = _nchw_to_nhwc_in_perm(c0, feat_size, feat_size)
    zw = _np(sd["z_lin.weight"])  # (flat, 2 * size_z)
    zb = _np(sd["z_lin.bias"])
    params["z_lin"] = {"kernel": jnp.asarray(zw[out_perm].T),
                       "bias": jnp.asarray(zb[out_perm])}

    for i in range(len(dec_channel_list)):
        params[f"dec{i}"] = _hvae_tblock(sd, f"dec.t_blocks.{i}.")
    params["out_conv"] = _conv(sd, "dec.out_conv")
    return {"params": params}
