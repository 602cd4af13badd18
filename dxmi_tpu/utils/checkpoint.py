"""Checkpointing with the reference's run-directory contract.

The run directory is the serialized experiment (reference
generate_cifar10.py:46-53): ``config.yaml`` plus ``sampler_{best,last}``,
``value_{best,last}`` checkpoints, best-FID gated (train_cifar10.py:120-135).

Files are single msgpack blobs (flax.serialization) holding
``{"params": <pytree>, "meta": {...}}`` — the Flax analogue of the
reference's ``{"state_dict": ..., "fid": ..., "epoch": ...}`` torch saves.
PyTorch ``.pth``/``.pt`` checkpoints from the reference ecosystem are
ingested through ``load_torch_checkpoint`` + ``dxmi_tpu.utils.convert``.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def save_checkpoint(path: str, params: Any, meta: Optional[Dict[str, Any]] = None,
                    extra: Optional[Dict[str, Any]] = None) -> None:
    """``extra`` adds further top-level collections to the payload (e.g.
    ``{"sn_stats": ...}`` for spectral-norm nets)."""
    payload = {
        "params": jax.tree.map(np.asarray, params),
        "meta": dict(meta or {}),
    }
    for coll, tree in (extra or {}).items():
        payload[coll] = jax.tree.map(np.asarray, tree)
    blob = serialization.msgpack_serialize(payload)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def load_checkpoint(path: str) -> Dict[str, Any]:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def resolve_run_checkpoint(log_dir: str, name: str, which: str):
    """Resolve a run-dir checkpoint with the reference's back-compat
    order (generate_cifar10.py:133-140): ``{name}_{which}.msgpack`` ->
    ``{name}.msgpack`` -> ``{name}_{which}.pth`` -> ``{name}.pth``.
    Returns (path, 'msgpack'|'torch')."""
    for cand, fmt in ((f"{name}_{which}.msgpack", "msgpack"),
                      (f"{name}.msgpack", "msgpack"),
                      (f"{name}_{which}.pth", "torch"),
                      (f"{name}.pth", "torch"),
                      (f"{name}_{which}.pt", "torch"),
                      (f"{name}.pt", "torch")):
        p = os.path.join(log_dir, cand)
        if os.path.exists(p):
            return p, fmt
    raise FileNotFoundError(
        f"no {name} checkpoint in {log_dir} (tried {name}_{which}.msgpack, "
        f"{name}.msgpack, {name}_{which}.pth, {name}.pth)")


def load_run_checkpoint(log_dir: str, name: str, which: str,
                        torch_kind: Optional[str] = None):
    """Load a run-dir checkpoint payload ({'params', 'meta'[, 'sn_stats']})
    resolving both dxmi_tpu msgpack names AND the reference's torch run-dir
    contract — a published ``sampler.pth`` run dir works directly, with
    conversion per ``torch_kind`` ('unet_small' | 'unet_adm' | 'igebm' |
    'value'; None = no converter for this net). Returns (payload, path)."""
    path, fmt = resolve_run_checkpoint(log_dir, name, which)
    if fmt == "msgpack":
        return load_checkpoint(path), path
    if torch_kind is None:
        raise SystemExit(
            f"{path}: found a torch checkpoint but this net has no "
            "torch->flax converter (the DDGAN NCSN++ is a documented "
            "reconstruction, SURVEY.md §2.0) — convert/train a dxmi_tpu "
            ".msgpack instead (docs/migration.md)")
    from dxmi_tpu.utils import convert

    state = load_torch_checkpoint(path)
    meta = state.pop("__meta__", {})
    if torch_kind == "unet_small":
        out = convert.convert_unet_small(state)
    elif torch_kind == "unet_adm":
        out = convert.convert_unet_adm(state)
    elif torch_kind == "igebm":
        out = convert.convert_igebm(state)
    elif torch_kind == "value":
        out = convert.wrap_value_params(convert.convert_igebm(state))
    else:
        raise ValueError(f"unknown torch_kind {torch_kind}")
    params = out["params"]
    if "log_betas" in out:
        params = {"net": params, "log_betas": out["log_betas"]}
    payload: Dict[str, Any] = {
        "params": params,
        "meta": {k: v for k, v in meta.items()
                 if isinstance(v, (int, float, str))},
    }
    if "sn_stats" in out:
        payload["sn_stats"] = out["sn_stats"]
    return payload, path


def load_sampler_params(path: str, current: Optional[Dict[str, Any]] = None
                        ) -> Dict[str, Any]:
    """Load SAMPLER params from a dxmi_tpu .msgpack, whatever its layout:
    a run-dir/save_checkpoint payload ({'params': ..., 'meta': ...}), a
    bare full-sampler tree ({'net': ..., 'log_betas': ...}), or a bare
    net tree (scripts/convert_checkpoint.py output). ``current`` supplies
    the non-net entries (log_betas, ...) when the file holds only a net
    tree."""
    import jax.numpy as jnp

    ckpt = load_checkpoint(path)
    tree = ckpt.get("params", ckpt) if isinstance(ckpt, dict) else ckpt
    if "net" in tree:  # full sampler params (net + log_betas ...)
        return jax.tree.map(jnp.asarray, tree)
    out = dict(current or {})
    out["net"] = jax.tree.map(jnp.asarray, tree)
    return out


def save_run_checkpoint(logdir: str, postfix: str, *, sampler_params=None,
                        v_params=None, f_params=None,
                        v_stats=None, f_stats=None,
                        meta: Optional[Dict[str, Any]] = None) -> None:
    """Write the reference's file family: sampler_{postfix}, value_{postfix},
    energy_{postfix} (train_cifar10.py:58-79). ``v_stats``/``f_stats`` embed
    spectral-norm 'sn_stats' collections in the value/energy files."""
    os.makedirs(logdir, exist_ok=True)
    if sampler_params is not None:
        save_checkpoint(os.path.join(logdir, f"sampler_{postfix}.msgpack"),
                        sampler_params, meta)
    if v_params is not None:
        save_checkpoint(os.path.join(logdir, f"value_{postfix}.msgpack"),
                        v_params,
                        extra={"sn_stats": v_stats} if v_stats is not None else None)
    if f_params is not None:
        save_checkpoint(os.path.join(logdir, f"energy_{postfix}.msgpack"),
                        f_params,
                        extra={"sn_stats": f_stats} if f_stats is not None else None)


def save_train_state(logdir: str, state: Any, *, i_iter: int, epoch: int,
                     best_fid: float = float("inf"),
                     name: str = "train_state.msgpack") -> None:
    """Serialize the FULL training state (params + optimizer states +
    betas_for_q) for preemption-safe resume (SURVEY.md §5: the reference
    is save-only with no optimizer-state resume)."""
    from flax import serialization as ser

    leaves = [np.asarray(x) for x in jax.tree.leaves(state)]
    payload = {
        "leaves": {str(i): a for i, a in enumerate(leaves)},
        "meta": {"i_iter": int(i_iter), "epoch": int(epoch),
                 "best_fid": float(best_fid)},
    }
    tmp = os.path.join(logdir, name + ".tmp")
    with open(tmp, "wb") as f:
        f.write(ser.msgpack_serialize(payload))
    os.replace(tmp, os.path.join(logdir, name))


def load_train_state(logdir: str, state_template: Any,
                     name: str = "train_state.msgpack"):
    """Restore (state, meta) from a save_train_state file; the template
    provides the pytree structure (e.g. trainer.init_state(...))."""
    from flax import serialization as ser

    with open(os.path.join(logdir, name), "rb") as f:
        payload = ser.msgpack_restore(f.read())
    treedef = jax.tree.structure(state_template)
    leaves = [payload["leaves"][str(i)]
              for i in range(len(payload["leaves"]))]
    assert len(leaves) == treedef.num_leaves, \
        "saved state does not match the current trainer configuration"
    state = jax.tree.unflatten(treedef, leaves)
    return state, payload["meta"]


def save_checkpoint_orbax(path: str, params: Any) -> None:
    """Orbax-backed checkpoint (multi-host-safe, sharding-aware). Optional
    alternative to the msgpack files for large sharded runs."""
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params, force=True)


def load_checkpoint_orbax(path: str, like: Any = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            return ckptr.restore(os.path.abspath(path), like)
        return ckptr.restore(os.path.abspath(path))


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a PyTorch checkpoint into a flat numpy state dict (requires the
    baked-in CPU torch; used only for converting published weights)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    meta = {}
    if isinstance(ckpt, dict):
        # outer metadata (fid/epoch/i_iter next to 'state_dict',
        # reference train_cifar10.py:58-79) survives the unwrap
        meta = {k: v for k, v in ckpt.items()
                if not hasattr(v, "detach") and not isinstance(v, dict)}
    if isinstance(ckpt, dict) and any(
            hasattr(v, "detach") for v in ckpt.values()):
        state = ckpt
    else:
        from dxmi_tpu.utils.convert import fix_legacy_dict

        state = fix_legacy_dict(ckpt)
    out = {}
    for k, v in state.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
        else:
            meta[k] = v
    out["__meta__"] = meta  # fid/epoch etc. travel along
    return out
