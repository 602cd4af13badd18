"""Offline sample evaluator: FID, sFID, Inception Score, Precision, Recall.

Capability parity with /root/reference/evaluations/evaluator.py (the
openai/guided-diffusion TF1-graph evaluator used for the paper's official
numbers) — re-built TPU-native on the Flax FID Inception:

  * FID      — pool3 (2048-d) Frechet distance,
  * sFID     — spatial features: first 7 channels of the Mixed_6d (17x17)
               output map (= the TF graph's ``mixed_6/conv`` tensor; see
               the tap-mapping note in ``WithTaps``), flattened to 2023-d
               (evaluator.py:23-24),
  * IS       — exp(E KL(p(y|x) || p(y))) from the 1008-way logits head,
  * Prec/Rec — kNN-radius manifold estimation (k=3), batched pairwise
               distances (evaluator.py:205-360).

CLI (same shape as the reference's):
    python evaluations/evaluator.py ref_batch.npz sample_batch.npz

npz format: ``arr_0`` uint8 (N, H, W, 3). Reference batches may instead
carry precomputed statistics (``mu``/``sigma`` [+ ``mu_s``/``sigma_s``]).

NOTE: numbers are comparable across models evaluated with THIS evaluator;
absolute parity with the TF1 graph requires the published pt/TF weights
(converted via ``dxmi_tpu.fid.inception.load_fid_inception_params``).
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

if os.environ.get("DXMI_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["DXMI_PLATFORM"])


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------


def build_extractors(weights_path=None, batch=100):
    """Returns extract(x01_nhwc) -> dict(pool3, spatial, logits?)."""
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.fid.inception import (InceptionV3FID,
                                        load_fid_inception_params,
                                        random_fid_inception_params)

    import flax.linen as nn

    class WithTaps(InceptionV3FID):
        @nn.compact
        def __call__(self, x):  # type: ignore[override]
            # replicate parent forward but tap the Mixed_6d output
            if self.resize_input:
                B, H, W, C = x.shape
                x = jax.image.resize(x, (B, 299, 299, C), method="bilinear")
            if self.normalize_input:
                x = 2.0 * x - 1.0
            from dxmi_tpu.fid import inception as I

            x = I.ConvBN(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
            x = I.ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
            x = I.ConvBN(64, (3, 3), padding=((1, 1), (1, 1)), name="Conv2d_2b_3x3")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = I.ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
            x = I.ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
            x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = I.InceptionA(32, name="Mixed_5b")(x)
            x = I.InceptionA(64, name="Mixed_5c")(x)
            x = I.InceptionA(64, name="Mixed_5d")(x)
            x = I.InceptionB(name="Mixed_6a")(x)
            x = I.InceptionC(128, name="Mixed_6b")(x)
            x = I.InceptionC(160, name="Mixed_6c")(x)
            x = I.InceptionC(160, name="Mixed_6d")(x)
            # sFID spatial tap: the reference evaluator taps the TF graph
            # tensor ``mixed_6/conv:0`` sliced to [..., :7]
            # (/root/reference/evaluations/evaluator.py:24,599).  In the
            # 2015-12-05 classify_image graph, ``mixed_6`` is the THIRD
            # 17x17 InceptionC block (torchvision Mixed_6d) and ``conv``
            # names its branch1x1 unit's post-BN+ReLU output (192ch).
            # Our InceptionC concatenates [branch1x1, ...] first, so the
            # branch1x1 activation IS the first 192 channels of the block
            # output; slicing [..., :7] here is tensor-identical.  NHWC
            # row-major flatten matches the TF evaluator's reshape.
            spatial = x  # (B, 17, 17, 768); [..., :192] == branch1x1 out
            x = I.InceptionC(192, name="Mixed_6e")(x)
            x = I.InceptionD(name="Mixed_7a")(x)
            x = I.InceptionE("avg", name="Mixed_7b")(x)
            x = I.InceptionE("max", name="Mixed_7c")(x)
            pool3 = jnp.mean(x, axis=(1, 2))
            # sFID uses the first 7 channels (2023 = 7*17*17 dims)
            sp = spatial[..., :7].reshape(spatial.shape[0], -1)
            return {"pool3": pool3, "spatial": sp}

    model = WithTaps()
    fc = None
    if weights_path and os.path.exists(weights_path):
        params = load_fid_inception_params(weights_path)
        # optional logits head for IS
        if weights_path.endswith(".npz"):
            raw = dict(np.load(weights_path))
        else:
            import torch

            t = torch.load(weights_path, map_location="cpu", weights_only=False)
            raw = {k: v.numpy() for k, v in
                   (t.state_dict() if hasattr(t, "state_dict") else t).items()}
        if "fc.weight" in raw:
            fc = (np.asarray(raw["fc.weight"], np.float32).T,
                  np.asarray(raw["fc.bias"], np.float32))
    else:
        print("WARNING: FID Inception weights not found — using random "
              "weights; metrics are NOT comparable to published numbers")
        params = random_fid_inception_params(jax.random.key(0))

    @jax.jit
    def _extract(x01):
        return model.apply({"params": params}, x01)

    def extract(x01):
        out = {k: np.asarray(v) for k, v in _extract(jnp.asarray(x01)).items()}
        if fc is not None:
            logits = out["pool3"] @ fc[0] + fc[1]
            e = np.exp(logits - logits.max(axis=1, keepdims=True))
            out["probs"] = e / e.sum(axis=1, keepdims=True)
        return out

    return extract


def read_npz_images(path):
    with np.load(path) as d:
        key = "arr_0" if "arr_0" in d else list(d.keys())[0]
        return d[key]


def iter_npz_batches(path, batch):
    """Stream the image array out of an npz in ``batch``-row chunks WITHOUT
    materializing it (50k x 256^2 uint8 is ~9.8 GB — the reference
    evaluator streams npz batches for the same reason, reference
    evaluator.py:433-571). Reads the .npy member through the zip stream;
    falls back to a full in-memory read for exotic layouts."""
    import zipfile

    from numpy.lib import format as npfmt

    yielded = False
    try:
        with zipfile.ZipFile(path) as z:
            names = z.namelist()
            name = "arr_0.npy" if "arr_0.npy" in names else names[0]
            with z.open(name) as f:
                version = npfmt.read_magic(f)
                npfmt._check_version(version)
                shape, fortran, dtype = npfmt._read_array_header(f, version)
                if fortran or dtype.hasobject or len(shape) < 1:
                    raise ValueError("unsupported layout for streaming")
                row = int(np.prod(shape[1:], dtype=np.int64)) * dtype.itemsize
                n = shape[0]
                for i in range(0, n, batch):
                    k = min(batch, n - i)
                    buf = f.read(k * row)
                    if len(buf) != k * row:
                        raise EOFError("truncated npy member")
                    yield np.frombuffer(buf, dtype=dtype).reshape(
                        (k,) + tuple(shape[1:]))
                    yielded = True
        return
    except Exception as e:  # streaming not possible — load whole array
        if yielded:
            # a mid-stream failure after chunks went out must NOT restart
            # from the top (the consumer would double-count rows)
            raise
        print(f"  (npz streaming unavailable: {e}; reading whole array)")
    imgs = read_npz_images(path)
    for i in range(0, len(imgs), batch):
        yield imgs[i:i + batch]


def npz_has_stats(path):
    with np.load(path) as d:
        return "mu" in d


def extract_all(path, extract, batch=100):
    feats = {"pool3": [], "spatial": [], "probs": []}
    for chunk in iter_npz_batches(path, batch):
        x = chunk.astype(np.float32) / 255.0
        out = extract(x)
        for k in feats:
            if k in out:
                feats[k].append(out[k])
    return {k: np.concatenate(v) for k, v in feats.items() if v}


# ---------------------------------------------------------------------------
# metrics
# ---------------------------------------------------------------------------


def inception_score(probs: np.ndarray, split_size: int = 5000) -> float:
    scores = []
    for i in range(0, len(probs), split_size):
        part = probs[i:i + split_size]
        kl = part * (np.log(part + 1e-12) - np.log(part.mean(0, keepdims=True) + 1e-12))
        scores.append(float(np.exp(kl.sum(1).mean())))
    return float(np.mean(scores))


class ManifoldEstimator:
    """kNN-radius manifold estimation for improved precision/recall
    (evaluator.py:205-360 semantics; k=3).

    ``device=True`` (default) runs the O(N^2 D) pairwise-distance passes
    as jitted fp32 matmul blocks on the accelerator — at the paper's 50k
    x 2048-d protocol that is ~30 TFLOP, minutes in host numpy vs
    seconds on a TPU chip. fp32 + the (a^2+b^2-2ab) identity matches the
    reference TF evaluator's own GPU math (evaluator.py:237-260); the
    numpy path (``device=False``) is kept as the dependency-free
    fallback and test oracle."""

    def __init__(self, nhood_size: int = 3, row_batch: int = 10000,
                 col_batch: int = 10000, device: bool = True):
        self.k = nhood_size
        self.row_batch = row_batch
        self.col_batch = col_batch
        self.device = device

    def _pairwise_d2(self, a, b):
        return (np.sum(a**2, 1)[:, None] + np.sum(b**2, 1)[None]
                - 2 * a @ b.T).clip(0)

    def _row_blocks(self, feats, block_fn, rb, *operands):
        """Run ``block_fn(rows, *operands)`` over fixed-shape row blocks
        (pad the tail so one compiled program serves every block).

        The big side operands (the full feature matrix, radii) are passed
        as ARGUMENTS, never closed over: a jit-captured 50k x 2048 fp32
        constant ships inside the compile payload and the axon
        remote-compile tunnel rejects it (HTTP 413 at the 50k-rehearsal
        scale — PERF.md round 3).

        ``feats`` may already be a device-resident fp32 array (e.g. the
        same matrix passed as an operand in ``manifold_radii``) —
        ``jnp.asarray`` is then a no-op, so the ~400 MB 50k x 2048
        matrix is never held twice on device."""
        import jax.numpy as jnp

        f = jnp.asarray(feats, jnp.float32)
        n = len(feats)
        outs = []
        for i in range(0, n, rb):
            rows = f[i:i + rb]
            m = rows.shape[0]
            if m < rb:
                rows = jnp.pad(rows, ((0, rb - m), (0, 0)))
            outs.append(np.asarray(block_fn(rows, *operands))[:m])
        return np.concatenate(outs, axis=0)

    def manifold_radii(self, feats: np.ndarray) -> np.ndarray:
        if self.device:
            import jax
            import jax.numpy as jnp

            k = self.k

            @jax.jit
            def block(rows, f, sq):
                rsq = jnp.sum(rows * rows, axis=1)
                d2 = jnp.maximum(
                    rsq[:, None] + sq[None, :] - 2.0 * rows @ f.T, 0.0)
                # (k+1) smallest per row, ascending; [k] excludes the
                # self-distance 0 on the diagonal
                smallest = -jax.lax.top_k(-d2, k + 1)[0]
                return smallest[:, k]

            f = jnp.asarray(feats, jnp.float32)
            sq = jnp.sum(f * f, axis=1)
            rb = min(self.row_batch, len(feats))
            # pass the device array as the row source too — _row_blocks'
            # asarray is then a no-op (one device copy, not two)
            return self._row_blocks(f, block, rb, f, sq
                                    ).astype(np.float64)

        n = len(feats)
        radii = np.zeros(n, dtype=np.float64)
        for i in range(0, n, self.row_batch):
            rows = feats[i:i + self.row_batch]
            d_row = np.full((len(rows), n), np.inf)
            for j in range(0, n, self.col_batch):
                cols = feats[j:j + self.col_batch]
                d_row[:, j:j + len(cols)] = self._pairwise_d2(rows, cols)
            # k-th smallest EXCLUDING self (distance 0 at the diagonal)
            part = np.partition(d_row, self.k, axis=1)
            radii[i:i + len(rows)] = part[:, self.k]
        return radii

    def evaluate(self, feats_a, radii_a, feats_b) -> float:
        """Fraction of feats_b inside the manifold of feats_a."""
        if self.device:
            import jax
            import jax.numpy as jnp

            @jax.jit
            def block(rows, f, sq, r):
                rsq = jnp.sum(rows * rows, axis=1)
                d2 = jnp.maximum(
                    rsq[:, None] + sq[None, :] - 2.0 * rows @ f.T, 0.0)
                return (d2 <= r[None, :]).any(axis=1)

            f = jnp.asarray(feats_a, jnp.float32)
            r = jnp.asarray(radii_a, jnp.float32)
            sq = jnp.sum(f * f, axis=1)
            rb = min(self.row_batch, len(feats_b))
            inside = self._row_blocks(feats_b, block, rb, f, sq, r)
            return float(inside.mean())

        inside = np.zeros(len(feats_b), dtype=bool)
        for j in range(0, len(feats_b), self.row_batch):
            rows = feats_b[j:j + self.row_batch]
            for i in range(0, len(feats_a), self.col_batch):
                cols = feats_a[i:i + self.col_batch]
                d2 = self._pairwise_d2(rows, cols)
                inside[j:j + len(rows)] |= (
                    d2 <= radii_a[i:i + len(cols)][None, :]).any(axis=1)
        return float(inside.mean())


def compute_prec_recall(ref_feats, sample_feats, k=3, device: bool = True):
    est = ManifoldEstimator(k, device=device)
    radii_ref = est.manifold_radii(ref_feats)
    radii_sample = est.manifold_radii(sample_feats)
    precision = est.evaluate(ref_feats, radii_ref, sample_feats)
    recall = est.evaluate(sample_feats, radii_sample, ref_feats)
    return precision, recall


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ref_batch")
    p.add_argument("sample_batch")
    p.add_argument("--weights", default=None,
                   help="pt_inception-2015-12-05 weights (.pth or .npz)")
    p.add_argument("--batch", type=int, default=100)
    args = p.parse_args()

    from dxmi_tpu.fid import runner as fid_runner
    from dxmi_tpu.fid import stats as S

    weights = args.weights or fid_runner._find(fid_runner.DEFAULT_WEIGHTS)
    extract = build_extractors(weights, args.batch)

    print("computing sample batch activations...")
    sample = extract_all(args.sample_batch, extract, args.batch)
    print("computing/loading reference batch statistics...")
    if npz_has_stats(args.ref_batch):
        with np.load(args.ref_batch) as d:
            ref_stats = (d["mu"], d["sigma"])
            ref_stats_spatial = ((d["mu_s"], d["sigma_s"])
                                 if "mu_s" in d else None)
            ref_feats = None
    else:
        ref = extract_all(args.ref_batch, extract, args.batch)
        ref_stats = S.activation_statistics(ref["pool3"])
        ref_stats_spatial = S.activation_statistics(ref["spatial"])
        ref_feats = ref

    if "probs" in sample:
        print("Inception Score:", inception_score(sample["probs"]))
    m1, s1 = S.activation_statistics(sample["pool3"])
    print("FID:", S.frechet_distance(m1, s1, *ref_stats))
    if ref_stats_spatial is not None:
        m1s, s1s = S.activation_statistics(sample["spatial"])
        print("sFID:", S.frechet_distance(m1s, s1s, *ref_stats_spatial))
    if ref_feats is not None:
        prec, rec = compute_prec_recall(ref_feats["pool3"], sample["pool3"])
        print("Precision:", prec)
        print("Recall:", rec)


if __name__ == "__main__":
    main()
