"""In-training FID orchestration (the reference's ``calculate_fid`` flow,
/root/reference/train_cifar10.py:81-139, adapted to TPU):

  * generate n_fid_samples on-device in sampling_batchsize chunks,
  * run the Flax Inception pool3 extractor on-device (no PNG round-trip —
    the reference writes 10k PNGs to disk and re-reads them; we keep the
    whole loop on the chip and only touch the host for the final mean/cov),
  * compare against cached dataset statistics (``fid_stats`` msgpack /
    ``.pt`` / ``.npz`` all accepted).

Everything degrades gracefully: if Inception weights or dataset statistics
are not on disk (this container has no egress), FID is skipped and the
trainer continues.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dxmi_tpu.fid import stats as stats_lib

DEFAULT_WEIGHTS = ("datasets/pt_inception-2015-12-05.npz",
                   "pretrained/pt_inception-2015-12-05.npz",
                   "datasets/pt_inception-2015-12-05.pth",
                   "pretrained/pt_inception-2015-12-05.pth")
DEFAULT_STATS = ("datasets/cifar10_train_fid_stats.pt",
                 "datasets/cifar10_train_fid_stats.npz",
                 "datasets/fid_stats_cifar10_train.npz")


def _find(paths) -> Optional[str]:
    for p in paths:
        if os.path.exists(p):
            return p
    return None


def load_dataset_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    if path.endswith(".npz"):
        d = np.load(path)
        if "mu" in d:
            return d["mu"], d["sigma"]
        return d["m2"], d["s2"]
    if path.endswith(".pt"):
        import torch

        d = torch.load(path, map_location="cpu", weights_only=False)
        return np.asarray(d["m2"]), np.asarray(d["s2"])
    raise ValueError(f"unknown stats format: {path}")


class FIDState:
    """Cached extractor params + dataset stats. ``extract_raw`` is the
    un-jitted apply (composable inside larger jitted programs)."""

    def __init__(self, extract_fn, m2, s2, extract_raw=None):
        self.extract_fn = extract_fn
        self.extract_raw = extract_raw
        self.m2 = m2
        self.s2 = s2
        # (batch, dispatch_chunk) -> jitted generate+extract program.
        # Re-jitting per FID call would recompile the whole scanned
        # sampler+Inception program every fid_every steps (~90 s each
        # through the remote-compile tunnel — measured, PERF.md).
        self._gen_cache: Dict[Tuple[int, int], Any] = {}


def build_fid_state(weights_path: str, stats_path: str) -> FIDState:
    from dxmi_tpu.fid.inception import InceptionV3FID, load_fid_inception_params

    model = InceptionV3FID()
    params = load_fid_inception_params(weights_path)

    def extract_raw(x01):
        """x01: (B, H, W, C) in [0, 1] -> (B, 2048) pool3 activations."""
        return model.apply({"params": params}, x01)

    m2, s2 = load_dataset_stats(stats_path)
    return FIDState(jax.jit(extract_raw), m2, s2, extract_raw=extract_raw)


def compute_fid_from_sampler(sampler, sampler_params, key, fid_state: FIDState,
                             n_samples: int, batch: int,
                             dispatch_chunk: int = 8) -> float:
    """Generate + extract activations fully on-device. Generation scans
    ``dispatch_chunk`` whole trajectories per dispatch (sample_many) so
    host latency is amortized — the reference instead writes 10k PNGs to
    disk and re-reads them (train_cifar10.py:386-442)."""
    from dxmi_tpu.samplers import sample_many

    acts = []
    n_batches = int(np.ceil(n_samples / batch))

    cache_key = (batch, dispatch_chunk)
    gen_chunk = fid_state._gen_cache.get(cache_key)
    if gen_chunk is None:

        @jax.jit
        def gen_chunk(p, k):
            xs = sample_many(sampler, p, k, dispatch_chunk, batch)  # (M,B,H,W,C)
            x01 = jnp.clip((xs + 1.0) / 2.0, 0.0, 1.0)
            if fid_state.extract_raw is None:
                return x01
            # sequential map, NOT vmap: Inception at 299^2 on M*B images at
            # once would need ~10 GB of activations
            return jax.lax.map(fid_state.extract_raw, x01)

        fid_state._gen_cache[cache_key] = gen_chunk

    done = 0
    while done < n_batches:
        key, k = jax.random.split(key)
        out = gen_chunk(sampler_params, k)
        if fid_state.extract_raw is None:
            for x01 in np.asarray(out):
                acts.append(np.asarray(fid_state.extract_fn(x01)))
        else:
            acts.append(np.asarray(out).reshape(-1, out.shape[-1]))
        done += dispatch_chunk
    acts = np.concatenate(acts)[:n_samples]
    m1, s1 = stats_lib.activation_statistics(acts)
    return stats_lib.frechet_distance(m1, s1, fid_state.m2, fid_state.s2)


def build_cifar_train_stats(weights_path: str, data_dir: str = "datasets",
                            out_path: str =
                            "datasets/cifar10_train_fid_stats.npz",
                            batch: int = 100) -> Optional[str]:
    """Compute + cache the CIFAR-10 train-set FID statistics when the
    cache file is absent (the reference computes fid_stats.pt on the
    first FID call, train_cifar10.py:360-364). Returns the cache path,
    or None when the raw CIFAR batches are not on disk."""
    from dxmi_tpu.data.cifar10 import CIFAR10
    from dxmi_tpu.fid.inception import (InceptionV3FID,
                                        load_fid_inception_params)

    try:
        ds = CIFAR10(data_dir, train=True)
    except (FileNotFoundError, OSError):
        return None
    model = InceptionV3FID()
    params = load_fid_inception_params(weights_path)
    extract = jax.jit(lambda x: model.apply({"params": params}, x))
    acts = []
    for i in range(0, len(ds), batch):
        x = ds.images[i:i + batch].astype(np.float32) / 255.0
        acts.append(np.asarray(extract(x)))
    mu, sigma = stats_lib.activation_statistics(np.concatenate(acts))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, mu=mu, sigma=sigma, m2=mu, s2=sigma)
    return out_path


def maybe_compute_fid(cfg: Dict[str, Any], sampler, sampler_params, key,
                      fid_state: Optional[FIDState]
                      ) -> Tuple[Optional[float], Optional[FIDState]]:
    """Entry-point hook: compute FID when weights+stats exist, else skip."""
    if fid_state is None:
        w = _find(DEFAULT_WEIGHTS)
        s = _find(DEFAULT_STATS)
        if w is not None and s is None \
                and cfg.get("data", {}).get("name") == "cifar10":
            # first-run stats bootstrap from the raw CIFAR batches
            s = build_cifar_train_stats(
                w, data_dir=cfg["data"].get("data_dir", "datasets"))
        if w is None or s is None:
            return None, None
        fid_state = build_fid_state(w, s)
    tr = cfg["training"]
    fid = compute_fid_from_sampler(
        sampler, sampler_params, key, fid_state,
        n_samples=int(tr["n_fid_samples"]),
        batch=int(tr["sampling_batchsize"]))
    return fid, fid_state
