"""Experiment logging with the reference's key-suffix protocol
(/root/reference/models/logger.py:8-19):

  * keys ending ``_``  -> scalar (TensorBoard add_scalar, wandb log)
  * keys ending ``@``  -> image  (TensorBoard add_image)

plus expansion of the trainers' ``per_step/*`` vector metrics into the
reference's per-step scalar families (``running_cost/step_{t}_``,
``value/step_{t}_``, ``sigma/sigma_{t}_``, ``adavelreg/beta{t}_``).

tensorboardX is used when available; wandb is optional and silently
disabled when absent (this container has no egress anyway).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np


class BaseLogger:
    def __init__(self, writer=None, use_wandb: bool = False):
        self.writer = writer
        self.wandb = None
        if use_wandb:
            try:
                import wandb  # noqa: F401

                self.wandb = wandb
            except ImportError:
                self.wandb = None

    def log(self, d_result: Dict[str, Any], i: int) -> None:
        d_wandb = {}
        for key, val in d_result.items():
            if key.endswith("_"):
                v = float(np.asarray(val))
                if self.writer is not None:
                    self.writer.add_scalar(key, v, i)
                d_wandb[key] = v
            elif key.endswith("@"):
                img = np.asarray(val)
                if self.writer is not None:
                    self.writer.add_image(key.rstrip("@"), img, i,
                                          dataformats="HWC" if img.ndim == 3 else "CHW")
        if self.wandb is not None and d_wandb:
            self.wandb.log(d_wandb, step=i)

    def flush(self) -> None:
        if self.writer is not None:
            self.writer.flush()


def init_wandb(project: str, name: str, logdir: str,
               cfg_container: Optional[dict] = None):
    """``wandb.init`` with the reference's contract (train_cifar10.py:
    349-355, train_image_large.py:217-222): project per dataset/T, run
    name ``{model_cfg_name}_{run}``, run files under the log dir, full
    config attached. Returns the wandb module, or None (with a warning)
    when wandb is not installed — the reference hard-depends on it; here
    it is an opt-in (``--wandb``)."""
    try:
        import wandb
    except ImportError:
        print("wandb not installed — --wandb ignored")
        return None
    wandb.init(project=project, name=name, dir=logdir, config=cfg_container)
    return wandb


def expand_metrics(metrics: Dict[str, Any]) -> Dict[str, float]:
    """Convert a trainer metrics dict (scalars + per_step vectors) into the
    reference's flat scalar key families."""
    out: Dict[str, float] = {}
    per_step = {}
    for k, v in metrics.items():
        if k.startswith("per_step/"):
            per_step[k.split("/", 1)[1]] = np.asarray(v)
        else:
            out[k] = float(np.asarray(v))

    t_order = per_step.get("t")
    for name, fmt in (("running_cost", "running_cost/step_{t}_"),
                      ("value", "value/step_{t}_")):
        if name in per_step:
            vec = per_step[name]
            ts = (t_order if t_order is not None
                  else np.arange(len(vec))[::-1])
            for t, val in zip(ts, vec):
                out[fmt.format(t=int(t))] = float(val)
    if "sigma" in per_step:
        for t, val in enumerate(per_step["sigma"]):
            out[f"sigma/sigma_{t}_"] = float(val)
    if "betas_for_q" in per_step:
        for t, val in enumerate(per_step["betas_for_q"]):
            out[f"adavelreg/beta{t}_"] = float(val)
    return out


def weight_norm_of(params) -> float:
    """Global L2 norm of a parameter pytree (the reference logs
    weight_norm/* families, utils.py:140-145)."""
    import jax

    return float(np.sqrt(sum(
        float((np.asarray(x) ** 2).sum()) for x in jax.tree.leaves(params))))


def make_grid(images: np.ndarray, nrow: int = 8, pad: int = 2) -> np.ndarray:
    """Tile (N, H, W, C) images into one (H', W', C) grid (torchvision
    make_grid equivalent for logging sample sheets)."""
    n, h, w, c = images.shape
    ncol = int(np.ceil(n / nrow))
    grid = np.ones((ncol * (h + pad) + pad, nrow * (w + pad) + pad, c),
                   dtype=images.dtype)
    for i in range(n):
        r, co = divmod(i, nrow)
        y = r * (h + pad) + pad
        x = co * (w + pad) + pad
        grid[y:y + h, x:x + w] = images[i]
    return grid
