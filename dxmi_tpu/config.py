"""Config system: YAML merge + dot-key CLI overrides + `_target_` registry.

Capability parity with the reference's config surface
(/root/reference/cmd_utils.py:16-62, train_cifar10.py:222-234):

  * two YAML files (model config, dataset config) merged, then overridden by
    ``--a.b value`` CLI pairs with typed parsing,
  * Hydra-style ``_target_:`` class paths instantiated recursively.

Instead of depending on OmegaConf/Hydra, this is a small self-contained
implementation. ``_target_`` strings are resolved through a registry that
also carries an alias table mapping the reference's (sometimes stale) class
paths — e.g. ``models.GCD.v4.GCD_DiDP_NoTime`` (configs/lsun/T4.yaml:34) —
onto this framework's equivalents, so reference YAML files work unchanged.
"""
from __future__ import annotations

import ast
import copy
import importlib
from typing import Any, Callable, Dict, List, Optional

import yaml


# ---------------------------------------------------------------------------
# Typed CLI override parsing (reference: cmd_utils.py:16-62)
# ---------------------------------------------------------------------------


def parse_arg_type(val: str) -> Any:
    """Parse a CLI string into int/float/bool/None/list/str."""
    if val in ("None", "none", "null", "Null"):
        return None
    if val in ("True", "true"):
        return True
    if val in ("False", "false"):
        return False
    try:
        return int(val)
    except ValueError:
        pass
    try:
        return float(val)
    except ValueError:
        pass
    if val.startswith("[") and val.endswith("]"):
        try:
            return ast.literal_eval(val)
        except (ValueError, SyntaxError):
            pass
    return val


def parse_unknown_args(l_args: List[str]) -> Dict[str, Any]:
    """Parse space-separated ``--key value`` pairs into a flat dict.

    A trailing unpaired token is dropped like the reference does
    (cmd_utils.py:38 ``len(l_args)//2``) but with a warning — it is
    usually a typo'd flag or a missing value."""
    if len(l_args) % 2 == 1:
        import sys

        print(f"WARNING: ignoring trailing override token {l_args[-1]!r} "
              "(overrides are --key value pairs)", file=sys.stderr)
    n_args = len(l_args) // 2
    d_args: Dict[str, Any] = {}
    for i in range(n_args):
        key = l_args[i * 2]
        if not key.startswith("--"):
            raise ValueError(f"expected --key, got {key!r}")
        d_args[key[2:]] = parse_arg_type(l_args[i * 2 + 1])
    return d_args


def parse_nested_args(d_cmd_cfg: Dict[str, Any]) -> Dict[str, Any]:
    """Expand dot-separated keys into nested dicts."""
    out: Dict[str, Any] = {}
    for key, val in d_cmd_cfg.items():
        node = out
        parts = key.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return out


# ---------------------------------------------------------------------------
# Config container
# ---------------------------------------------------------------------------


class Config(dict):
    """A dict with attribute access and ``get`` defaulting, sufficient to
    stand in for the OmegaConf DictConfig surface used by the entry points."""

    def __getattr__(self, name: str) -> Any:
        try:
            v = self[name]
        except KeyError as e:
            raise AttributeError(name) from e
        return v

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    @staticmethod
    def _wrap(v: Any) -> Any:
        if isinstance(v, dict) and not isinstance(v, Config):
            return Config({k: Config._wrap(x) for k, x in v.items()})
        if isinstance(v, list):
            return [Config._wrap(x) for x in v]
        return v

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls._wrap(dict(d))

    def to_dict(self) -> Dict[str, Any]:
        def unwrap(v):
            if isinstance(v, dict):
                return {k: unwrap(x) for k, x in v.items()}
            if isinstance(v, list):
                return [unwrap(x) for x in v]
            return v

        return unwrap(self)


def load_yaml(path: str) -> Config:
    with open(path) as f:
        return Config.from_dict(yaml.safe_load(f) or {})


def merge(*configs: Dict[str, Any]) -> Config:
    """Deep-merge configs left to right (later wins, dicts merge recursively)."""

    def _merge(a: Dict[str, Any], b: Dict[str, Any]) -> Dict[str, Any]:
        out = dict(a)
        for k, v in b.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = _merge(out[k], v)
            else:
                out[k] = copy.deepcopy(v)
        return out

    acc: Dict[str, Any] = {}
    for c in configs:
        acc = _merge(acc, c)
    return Config.from_dict(acc)


def save_yaml(cfg: Dict[str, Any], path: str) -> None:
    d = cfg.to_dict() if isinstance(cfg, Config) else cfg
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)


def to_yaml(cfg: Dict[str, Any]) -> str:
    d = cfg.to_dict() if isinstance(cfg, Config) else cfg
    return yaml.safe_dump(d, sort_keys=False)


# ---------------------------------------------------------------------------
# _target_ registry + aliases
# ---------------------------------------------------------------------------

_REGISTRY: Dict[str, Callable] = {}

# Reference class paths (including the stale ones documented in SURVEY.md
# §2.0) mapped onto this framework's targets.
_ALIASES: Dict[str, str] = {
    # live reference paths
    "models.DxMI.unet_small.Model": "dxmi_tpu.models.unet_small.UNetSmall",
    "models.DxMI.unet_small.UNetEncoder": "dxmi_tpu.models.unet_small.UNetSmallEncoder",
    "models.DxMI.var_sampler.VARSampler": "dxmi_tpu.samplers.var.VARSampler",
    "models.DxMI.openai_diffusion.OpenAIDiffusion": "dxmi_tpu.samplers.edm.EDMSampler",
    "models.value.TimeIndependentValue": "dxmi_tpu.models.value.TimeIndependentValue",
    "models.modules.IGEBMEncoderV2": "dxmi_tpu.models.igebm.IGEBMEncoder",
    "models.DxMI.trainer.DxMI_Trainer": "dxmi_tpu.trainers.dxmi.DxMITrainer",
    "models.DxMI.trainer.DxMI_Trainer_Cond": "dxmi_tpu.trainers.dxmi_cond.DxMITrainerCond",
    "models.DxMI.trainer.DxMI_Trainer_EV": "dxmi_tpu.trainers.dxmi_ev.DxMITrainerEV",
    # DDGAN family (absent from the reference snapshot; rebuilt from the
    # config contract, configs/cifar10/T4_ddgan.yaml)
    "models.ddgan.models.ncsnpp_generator_adagn.NCSNpp": "dxmi_tpu.models.ncsnpp.NCSNpp",
    "models.ddgan.NCSNppArgs": "dxmi_tpu.models.ncsnpp.NCSNppArgs",
    "models.ddgan.DDGANSampler": "dxmi_tpu.samplers.ddgan.DDGANSampler",
    # stale pre-rename paths in configs/lsun/*.yaml (SURVEY.md §2.0)
    "models.GCD.v4.GCD_DiDP_NoTime": "dxmi_tpu.trainers.dxmi_cond.DxMITrainerCond",
    "models.GCD.modules.TimeIndependentValue": "dxmi_tpu.models.value.TimeIndependentValue",
    "models.modules.IGEBMEncoderV3": "dxmi_tpu.models.igebm.IGEBMEncoder",
    "models.wideresnet_te.wideresnet.Wide_ResNet": "dxmi_tpu.models.wideresnet.WideResNet",
    # 2D synthetic data
    "loader.synthetic.sample2d": "dxmi_tpu.data.synthetic.sample2d",
}


def register(path: str, fn: Optional[Callable] = None):
    """Register a constructor under a dotted path (decorator or direct)."""
    if fn is None:
        def deco(f):
            _REGISTRY[path] = f
            return f
        return deco
    _REGISTRY[path] = fn
    return fn


def resolve_target(path: str) -> Callable:
    path = _ALIASES.get(path, path)
    if path in _REGISTRY:
        return _REGISTRY[path]
    module, _, name = path.rpartition(".")
    obj = getattr(importlib.import_module(module), name)
    _REGISTRY[path] = obj
    return obj


def instantiate(cfg: Any, **overrides: Any) -> Any:
    """Recursively instantiate a config node with a ``_target_`` key.

    Nested dicts that themselves carry ``_target_`` are instantiated first
    (matching hydra.utils.instantiate's recursive default used at
    train_cifar10.py:255-280). Extra ``overrides`` win over config values.
    """
    if cfg is None:
        return None
    if not isinstance(cfg, dict):
        return cfg
    if "_target_" not in cfg:
        return {k: instantiate(v) if isinstance(v, dict) else v for k, v in cfg.items()}

    kwargs = {}
    for k, v in cfg.items():
        if k == "_target_":
            continue
        if isinstance(v, dict) and "_target_" in v:
            kwargs[k] = instantiate(v)
        else:
            kwargs[k] = v
    kwargs.update(overrides)
    target = resolve_target(cfg["_target_"])
    return target(**kwargs)
