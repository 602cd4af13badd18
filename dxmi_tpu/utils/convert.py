"""PyTorch-checkpoint -> Flax-params conversion.

The published DxMI checkpoints (pretrained/cifar10_ddpm etc., reference
README.md:92-105) are PyTorch state dicts in NCHW layout. This module maps
them onto dxmi_tpu's NHWC Flax parameter trees:

  * Conv2d weight (O, I, kh, kw)   -> Conv kernel (kh, kw, I, O)
  * Linear weight (O, I)           -> Dense kernel (I, O)
  * GroupNorm weight/bias          -> scale/bias
  * Embedding weight               -> embedding

``fix_legacy_dict`` replicates the reference's checkpoint-key fixups
(/root/reference/utils.py:260-273): strip ``module.`` prefixes and unwrap
``model`` / ``state_dict`` containers.

Inputs are dicts of numpy arrays (call ``torch_state_to_numpy`` first if
you have torch tensors) so this module itself never imports torch.
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import numpy as np


def torch_state_to_numpy(state_dict) -> Dict[str, np.ndarray]:
    """Detach/convert a torch state dict to numpy (requires torch)."""
    return {k: np.asarray(v.detach().cpu().numpy()) for k, v in state_dict.items()}


def fix_legacy_dict(d: Dict[str, Any]) -> Dict[str, Any]:
    """Unwrap 'model'/'state_dict'/'ema' containers and strip 'module.'."""
    keys = list(d.keys())
    if "model" in keys:
        d = d["model"]
    elif "state_dict" in keys:
        d = d["state_dict"]
    elif "ema" in keys:
        d = d["ema"]
    return {k.replace("module.", ""): v for k, v in d.items()}


def _set(tree: Dict, path, leaf) -> None:
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = leaf


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.transpose(w, (2, 3, 1, 0))


def _dense_kernel(w: np.ndarray) -> np.ndarray:
    # (O, I) -> (I, O)
    return np.transpose(w, (1, 0))


# ---------------------------------------------------------------------------
# UNetSmall (reference models/DxMI/unet_small.py checkpoint layout)
# ---------------------------------------------------------------------------

_UNET_SMALL_RENAMES = [
    (re.compile(r"^temb\.dense\.(\d)\."), lambda m: f"temb_dense{m.group(1)}."),
    (re.compile(r"^down\.(\d+)\.block\.(\d+)\."), lambda m: f"down_{m.group(1)}_block_{m.group(2)}."),
    (re.compile(r"^down\.(\d+)\.attn\.(\d+)\."), lambda m: f"down_{m.group(1)}_attn_{m.group(2)}."),
    (re.compile(r"^down\.(\d+)\.downsample\."), lambda m: f"down_{m.group(1)}_downsample."),
    (re.compile(r"^up\.(\d+)\.block\.(\d+)\."), lambda m: f"up_{m.group(1)}_block_{m.group(2)}."),
    (re.compile(r"^up\.(\d+)\.attn\.(\d+)\."), lambda m: f"up_{m.group(1)}_attn_{m.group(2)}."),
    (re.compile(r"^up\.(\d+)\.upsample\."), lambda m: f"up_{m.group(1)}_upsample."),
    (re.compile(r"^mid\.block_1\."), lambda m: "mid_block_1."),
    (re.compile(r"^mid\.attn_1\."), lambda m: "mid_attn_1."),
    (re.compile(r"^mid\.block_2\."), lambda m: "mid_block_2."),
]

# module-local names that are GroupNorms in the reference U-Net
_GN_NAMES = {"norm", "norm1", "norm2", "norm_out"}
# module-local names that are Linear layers
_DENSE_NAMES = {"temb_dense0", "temb_dense1", "temb_proj"}


def convert_unet_small(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference unet_small ``Model`` state dict to Flax params.

    Returns ``{'params': tree}``. A ``log_betas`` entry (injected into the
    torch net by VARSampler, var_sampler.py:354-355) is returned separately
    under key ``'log_betas'`` when present — in dxmi_tpu it belongs to the
    sampler's parameter tree, not the network's.
    """
    state = fix_legacy_dict(state)
    params: Dict[str, Any] = {}
    log_betas: Optional[np.ndarray] = None

    for key, val in state.items():
        val = np.asarray(val, dtype=np.float32)
        if key == "log_betas":
            log_betas = val
            continue
        if key == "std":  # buffer registered for trainable_beta='fix_last'
            continue

        name = key
        for pat, repl in _UNET_SMALL_RENAMES:
            name = pat.sub(lambda m, r=repl: r(m), name)

        parts = name.split(".")
        *mods, leaf = parts
        local = mods[-1] if mods else ""

        if local in _GN_NAMES or (local == "norm" and "attn" in name):
            # GroupNorm -> GroupNorm32 wrapper: <mod>/gn/{scale,bias}
            leaf_name = "scale" if leaf == "weight" else "bias"
            _set(params, mods + ["gn", leaf_name], val)
        elif leaf == "weight":
            if val.ndim == 4:
                _set(params, mods + ["kernel"], _conv_kernel(val))
            elif val.ndim == 2:
                _set(params, mods + ["kernel"], _dense_kernel(val))
            else:
                _set(params, mods + ["scale"], val)
        elif leaf == "bias":
            _set(params, mods + ["bias"], val)
        else:
            raise ValueError(f"unhandled key: {key} -> {name}")

    out = {"params": params}
    if log_betas is not None:
        out["log_betas"] = log_betas
    return out


def convert_unet_small_encoder(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference ``UNetEncoder`` (time-dependent value net,
    unet_small.py:336-443) state dict: the U-Net encoder half plus the
    pooled head Sequential (out.0 GroupNorm, out.3 1x1 conv)."""
    state = fix_legacy_dict(state)
    head = {}
    rest = {}
    for k, v in state.items():
        if k.startswith("out."):
            head[k] = v
        else:
            rest[k] = v
    out = convert_unet_small(rest)
    params = out["params"]
    for k, v in head.items():
        v = np.asarray(v, dtype=np.float32)
        if k == "out.0.weight":
            _set(params, ["out_norm", "scale"], v)
        elif k == "out.0.bias":
            _set(params, ["out_norm", "bias"], v)
        elif k == "out.3.weight":
            _set(params, ["out_conv", "kernel"], _conv_kernel(v))
        elif k == "out.3.bias":
            _set(params, ["out_conv", "bias"], v)
        else:
            raise ValueError(f"unhandled head key: {k}")
    return out


# ---------------------------------------------------------------------------
# IGEBMEncoder (reference models/modules.py checkpoint layout)
# ---------------------------------------------------------------------------


def convert_igebm(state: Dict[str, np.ndarray], keepdim: bool = False) -> Dict[str, Any]:
    """Convert a reference ``IGEBMEncoderV2`` state dict to Flax params.

    Handles the ``TimeIndependentValue`` wrapper's ``net.`` prefix
    (value checkpoints are saved as the wrapper's state dict).
    """
    state = fix_legacy_dict(state)
    # strip the TimeIndependentValue wrapper prefix if present
    if all(k.startswith("net.") for k in state):
        state = {k[4:]: v for k, v in state.items()}

    params: Dict[str, Any] = {}
    sn: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in state.items():
        val = np.asarray(val, dtype=np.float32)
        name = re.sub(r"^blocks\.(\d+)\.", lambda m: f"block_{m.group(1)}.", key)
        name = name.replace("skip.0.", "skip.")  # torch Sequential wrapper
        parts = name.split(".")
        *mods, leaf = parts

        if "parametrizations" in parts:
            # torch.nn.utils.parametrizations.spectral_norm layout
            # (modules.py:44-62): X.parametrizations.weight.{original,0._u,0._v}
            i = parts.index("parametrizations")
            conv_path = parts[:i]
            tail = ".".join(parts[i + 1:])
            grp = sn.setdefault(".".join(conv_path), {})
            if tail == "weight.original":
                grp["weight"] = val
                _set(params, conv_path + ["kernel"], _conv_kernel(val))
            elif tail == "weight.0._u":
                grp["u"] = val
            elif tail == "weight.0._v":
                grp["v"] = val
            else:
                raise ValueError(f"unhandled spectral-norm key: {key}")
        elif "class_embed" in name and leaf == "weight":
            _set(params, mods + ["embedding"], val)
        elif leaf == "weight":
            if val.ndim == 4:
                _set(params, mods + ["kernel"], _conv_kernel(val))
            elif val.ndim == 2:
                # 'linear' is a Dense when keepdim=False, else a 1x1 conv
                _set(params, mods + ["kernel"], _dense_kernel(val))
            else:
                raise ValueError(f"unexpected weight ndim for {key}: {val.ndim}")
        elif leaf == "bias":
            _set(params, mods + ["bias"], val)
        else:
            raise ValueError(f"unhandled key: {key}")

    out: Dict[str, Any] = {"params": params}
    if sn:
        out["sn_stats"] = _igebm_sn_stats(sn)
    return out


# creation order of the nn.SpectralNorm wrappers inside ResBlockEBM /
# IGEBMEncoder (igebm.py): conv1 -> conv2 -> skip
_SN_INDEX = {"conv1": 0, "conv2": 1, "skip": 2}


def _igebm_sn_stats(sn: Dict[str, Dict[str, np.ndarray]]) -> Dict[str, Any]:
    """Build the flax 'sn_stats' collection from torch spectral-norm
    parametrization tensors.

    torch stores u (O,) / v (I*H*W,) for W.reshape(O, -1); flax
    ``nn.SpectralNorm`` stores u (1, O) for kernel.reshape(-1, O) plus a
    sigma scalar that it re-derives by power iteration from u — so sigma
    is seeded with u^T W v (exact when u/v have converged).
    """
    stats: Dict[str, Any] = {}
    for conv_path, grp in sorted(sn.items()):
        missing = {"weight", "u", "v"} - set(grp)
        if missing:
            raise ValueError(
                f"incomplete spectral-norm tensors for {conv_path}: "
                f"missing {sorted(missing)}")
        w, u, v = grp["weight"], grp["u"], grp["v"]
        sigma = float(u @ w.reshape(w.shape[0], -1) @ v)
        parts = conv_path.split(".")
        parent, convname = parts[:-1], parts[-1]
        wrapper = f"SpectralNorm_{_SN_INDEX[convname]}"
        _set(stats, parent + [wrapper, f"{convname}/kernel/u"],
             u[None, :].astype(np.float32))
        _set(stats, parent + [wrapper, f"{convname}/kernel/sigma"],
             np.float32(sigma))
    return stats


def wrap_value_params(igebm_params: Dict[str, Any]) -> Dict[str, Any]:
    """Nest encoder variables (params and any extra collections such as
    'sn_stats') under the TimeIndependentValue module."""
    return {coll: {"net": tree} for coll, tree in igebm_params.items()}


# ---------------------------------------------------------------------------
# UNetADM (reference models/cm/unet.py checkpoint layout, e.g. the published
# edm_imagenet64_ema.pt / edm_bedroom256_ema.pt weights)
# ---------------------------------------------------------------------------

_ADM_GN_NAMES = {"in_layers_0", "out_layers_0", "norm", "out_0"}
_ADM_DENSE_NAMES = {"time_embed_0", "time_embed_2", "emb_layers_1"}
_ADM_CONTAINERS = {"input_blocks", "output_blocks", "middle_block",
                   "time_embed", "in_layers", "out_layers", "emb_layers",
                   "out"}


def _adm_flax_path(key: str):
    """Map a torch UNetModel state-dict key to the flax module path.

    Examples:
      input_blocks.1.0.in_layers.0.weight -> (input_blocks_1_0, in_layers_0)
      middle_block.1.qkv.weight           -> (middle_block_1, qkv)
      output_blocks.2.2.conv.weight       -> (output_blocks_2_2_conv,)
      out.0.weight                        -> (out_0,)
    """
    tokens = key.split(".")
    leaf = tokens.pop()  # weight / bias
    groups = []
    cur = None
    for tok in tokens:
        if tok.isdigit():
            assert cur is not None, key
            cur = f"{cur}_{tok}"
        else:
            if cur is not None:
                groups.append(cur)
            cur = tok
    if cur is not None:
        groups.append(cur)
    # 'op' (downsample conv) and 'conv' (upsample conv) fold into the
    # containing block's flax name; so does a trailing sub-index group
    if len(groups) >= 2 and groups[-1] in ("op", "conv"):
        groups = groups[:-2] + [f"{groups[-2]}_{groups[-1]}"]
    return groups, leaf


def convert_unet_adm(state: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Convert a reference cm ``UNetModel`` state dict to UNetADM params.

    Handles ``log_betas`` (injected by OpenAIDiffusion,
    openai_diffusion.py:43-48) by returning it separately.
    """
    state = fix_legacy_dict(state)
    params: Dict[str, Any] = {}
    log_betas: Optional[np.ndarray] = None

    for key, val in state.items():
        val = np.asarray(val, dtype=np.float32)
        if key == "log_betas":
            log_betas = val
            continue
        groups, leaf = _adm_flax_path(key)
        local = groups[-1]

        if local == "label_emb":
            _set(params, groups + ["embedding"], val)
        elif local in _ADM_GN_NAMES:
            _set(params, groups + ["gn", "scale" if leaf == "weight" else "bias"], val)
        elif leaf == "weight":
            if val.ndim == 4:
                _set(params, groups + ["kernel"], _conv_kernel(val))
            elif val.ndim == 2:
                _set(params, groups + ["kernel"], _dense_kernel(val))
            else:
                raise ValueError(f"unhandled weight shape {val.shape} for {key}")
        elif leaf == "bias":
            _set(params, groups + ["bias"], val)
        else:
            raise ValueError(f"unhandled key: {key}")

    out = {"params": params}
    if log_betas is not None:
        out["log_betas"] = log_betas
    return out
