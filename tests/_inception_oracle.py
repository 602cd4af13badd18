"""Hand-rolled torch oracle of the FID InceptionV3 + synthetic weights.

Two jobs (VERDICT r2 missing #2 / weak #6):

1. ``make_synthetic_state_dict()`` builds a torch-layout state dict with
   the EXACT key names and shapes of the published
   ``pt_inception-2015-12-05.pth`` file (torchvision inception naming:
   ``<module>.conv.weight``, ``<module>.bn.{weight,bias,running_mean,
   running_var,num_batches_tracked}``, plus ``fc.{weight,bias}`` — see
   /root/reference/pytorch_fid/inception.py:184-209 which constructs
   ``_inception_v3(num_classes=1008, aux_logits=False)`` and loads that
   file into it). This lets ``load_fid_inception_params`` (BN folding)
   run UN-mocked in tests without the 91MB download.

2. ``FIDInceptionOracle`` is a self-contained torch re-implementation of
   the patched FID network (/root/reference/pytorch_fid/inception.py:
   212-329: InceptionA/C/E_1 avg-pool with count_include_pad=False,
   E_2 max-pool pool branch) that ``load_state_dict``s the same dict —
   a cross-framework numeric oracle for pool3, the sFID spatial tap
   (Mixed_6d output = TF ``mixed_6/conv`` semantics), and the fc/IS head.

torchvision is absent in this image, so the blocks are written out by
hand; module attribute names mirror torchvision so state-dict keys line
up.
"""
from __future__ import annotations

import numpy as np

BN_EPS = 1e-3

# (key prefix, in_ch, out_ch, (kh, kw)) for every ConvBN in the network,
# in forward order. Strides/paddings live in the oracle modules; the
# state dict only needs shapes.
def conv_specs():
    specs = []

    def cbn(prefix, i, o, k):
        specs.append((prefix, i, o, k))

    cbn("Conv2d_1a_3x3", 3, 32, (3, 3))
    cbn("Conv2d_2a_3x3", 32, 32, (3, 3))
    cbn("Conv2d_2b_3x3", 32, 64, (3, 3))
    cbn("Conv2d_3b_1x1", 64, 80, (1, 1))
    cbn("Conv2d_4a_3x3", 80, 192, (3, 3))

    def inception_a(name, i, pf):
        cbn(f"{name}.branch1x1", i, 64, (1, 1))
        cbn(f"{name}.branch5x5_1", i, 48, (1, 1))
        cbn(f"{name}.branch5x5_2", 48, 64, (5, 5))
        cbn(f"{name}.branch3x3dbl_1", i, 64, (1, 1))
        cbn(f"{name}.branch3x3dbl_2", 64, 96, (3, 3))
        cbn(f"{name}.branch3x3dbl_3", 96, 96, (3, 3))
        cbn(f"{name}.branch_pool", i, pf, (1, 1))

    inception_a("Mixed_5b", 192, 32)   # -> 256
    inception_a("Mixed_5c", 256, 64)   # -> 288
    inception_a("Mixed_5d", 288, 64)   # -> 288

    cbn("Mixed_6a.branch3x3", 288, 384, (3, 3))
    cbn("Mixed_6a.branch3x3dbl_1", 288, 64, (1, 1))
    cbn("Mixed_6a.branch3x3dbl_2", 64, 96, (3, 3))
    cbn("Mixed_6a.branch3x3dbl_3", 96, 96, (3, 3))  # -> 768

    def inception_c(name, c7):
        cbn(f"{name}.branch1x1", 768, 192, (1, 1))
        cbn(f"{name}.branch7x7_1", 768, c7, (1, 1))
        cbn(f"{name}.branch7x7_2", c7, c7, (1, 7))
        cbn(f"{name}.branch7x7_3", c7, 192, (7, 1))
        cbn(f"{name}.branch7x7dbl_1", 768, c7, (1, 1))
        cbn(f"{name}.branch7x7dbl_2", c7, c7, (7, 1))
        cbn(f"{name}.branch7x7dbl_3", c7, c7, (1, 7))
        cbn(f"{name}.branch7x7dbl_4", c7, c7, (7, 1))
        cbn(f"{name}.branch7x7dbl_5", c7, 192, (1, 7))
        cbn(f"{name}.branch_pool", 768, 192, (1, 1))

    inception_c("Mixed_6b", 128)
    inception_c("Mixed_6c", 160)
    inception_c("Mixed_6d", 160)
    inception_c("Mixed_6e", 192)

    cbn("Mixed_7a.branch3x3_1", 768, 192, (1, 1))
    cbn("Mixed_7a.branch3x3_2", 192, 320, (3, 3))
    cbn("Mixed_7a.branch7x7x3_1", 768, 192, (1, 1))
    cbn("Mixed_7a.branch7x7x3_2", 192, 192, (1, 7))
    cbn("Mixed_7a.branch7x7x3_3", 192, 192, (7, 1))
    cbn("Mixed_7a.branch7x7x3_4", 192, 192, (3, 3))  # -> 1280

    def inception_e(name, i):
        cbn(f"{name}.branch1x1", i, 320, (1, 1))
        cbn(f"{name}.branch3x3_1", i, 384, (1, 1))
        cbn(f"{name}.branch3x3_2a", 384, 384, (1, 3))
        cbn(f"{name}.branch3x3_2b", 384, 384, (3, 1))
        cbn(f"{name}.branch3x3dbl_1", i, 448, (1, 1))
        cbn(f"{name}.branch3x3dbl_2", 448, 384, (3, 3))
        cbn(f"{name}.branch3x3dbl_3a", 384, 384, (1, 3))
        cbn(f"{name}.branch3x3dbl_3b", 384, 384, (3, 1))
        cbn(f"{name}.branch_pool", i, 192, (1, 1))

    inception_e("Mixed_7b", 1280)
    inception_e("Mixed_7c", 2048)  # -> 2048
    return specs


def make_synthetic_state_dict(seed=0, numpy=False):
    """Random weights in the exact pt_inception-2015-12-05 layout.

    Variance-controlled so a 94-conv forward stays O(1): He-scaled conv
    kernels, running_var ~ 1, gamma ~ 1 (ReLU + He keeps activation
    variance roughly constant). Returns a torch state dict (or raw numpy
    arrays with ``numpy=True`` for the .npz re-pack path).
    """
    rng = np.random.RandomState(seed)
    state = {}
    for prefix, i, o, (kh, kw) in conv_specs():
        fan_in = i * kh * kw
        state[f"{prefix}.conv.weight"] = rng.randn(
            o, i, kh, kw).astype(np.float32) * np.sqrt(2.0 / fan_in)
        state[f"{prefix}.bn.weight"] = (
            1.0 + 0.1 * rng.randn(o)).astype(np.float32)
        state[f"{prefix}.bn.bias"] = (0.05 * rng.randn(o)).astype(np.float32)
        state[f"{prefix}.bn.running_mean"] = (
            0.1 * rng.randn(o)).astype(np.float32)
        state[f"{prefix}.bn.running_var"] = (
            1.0 + 0.2 * rng.rand(o)).astype(np.float32)
        state[f"{prefix}.bn.num_batches_tracked"] = np.asarray(
            1000, np.int64)
    state["fc.weight"] = rng.randn(1008, 2048).astype(np.float32) * 0.02
    state["fc.bias"] = (0.01 * rng.randn(1008)).astype(np.float32)
    if numpy:
        return state
    import torch

    return {k: torch.from_numpy(np.asarray(v)) for k, v in state.items()}


# ---------------------------------------------------------------------------
# torch oracle
# ---------------------------------------------------------------------------

def build_oracle(state_dict):
    """Construct the patched-FID torch network and load ``state_dict``.

    Returns a torch.nn.Module whose forward(x_m11_nchw) returns
    (pool3 (B,2048), spatial (B,768,17,17) tapped at Mixed_6d, logits
    (B,1008)). Input is already normalized to [-1,1], 299x299.
    """
    import torch
    import torch.nn as tnn
    import torch.nn.functional as F

    class BasicConv2d(tnn.Module):
        def __init__(self, i, o, k, stride=1, padding=0):
            super().__init__()
            self.conv = tnn.Conv2d(i, o, k, stride=stride, padding=padding,
                                   bias=False)
            self.bn = tnn.BatchNorm2d(o, eps=BN_EPS)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avg3_nopad(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class IncA(tnn.Module):
        def __init__(self, i, pf):
            super().__init__()
            self.branch1x1 = BasicConv2d(i, 64, 1)
            self.branch5x5_1 = BasicConv2d(i, 48, 1)
            self.branch5x5_2 = BasicConv2d(48, 64, 5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(i, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, padding=1)
            self.branch_pool = BasicConv2d(i, pf, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b5 = self.branch5x5_2(self.branch5x5_1(x))
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = self.branch_pool(avg3_nopad(x))
            return torch.cat([b1, b5, bd, bp], 1)

    class IncB(tnn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3 = BasicConv2d(i, 384, 3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(i, 64, 1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, 3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, 3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3(x)
            bd = self.branch3x3dbl_3(self.branch3x3dbl_2(
                self.branch3x3dbl_1(x)))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, bd, bp], 1)

    class IncC(tnn.Module):
        def __init__(self, i, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(i, 192, 1)
            self.branch7x7_1 = BasicConv2d(i, c7, 1)
            self.branch7x7_2 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, (7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(i, c7, 1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, (1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, (7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, (1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(i, 192, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(
                    self.branch7x7dbl_1(x)))))
            bp = self.branch_pool(avg3_nopad(x))
            return torch.cat([b1, b7, bd, bp], 1)

    class IncD(tnn.Module):
        def __init__(self, i):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(i, 192, 1)
            self.branch3x3_2 = BasicConv2d(192, 320, 3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(i, 192, 1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, (1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, (7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, 3, stride=2)

        def forward(self, x):
            b3 = self.branch3x3_2(self.branch3x3_1(x))
            b7 = self.branch7x7x3_4(self.branch7x7x3_3(
                self.branch7x7x3_2(self.branch7x7x3_1(x))))
            bp = F.max_pool2d(x, 3, stride=2)
            return torch.cat([b3, b7, bp], 1)

    class IncE(tnn.Module):
        def __init__(self, i, pool_mode):
            super().__init__()
            self.pool_mode = pool_mode
            self.branch1x1 = BasicConv2d(i, 320, 1)
            self.branch3x3_1 = BasicConv2d(i, 384, 1)
            self.branch3x3_2a = BasicConv2d(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, (3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(i, 448, 1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, 3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, (1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, (3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(i, 192, 1)

        def forward(self, x):
            b1 = self.branch1x1(x)
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd),
                            self.branch3x3dbl_3b(bd)], 1)
            if self.pool_mode == "avg":
                bp = avg3_nopad(x)
            else:
                bp = F.max_pool2d(x, 3, stride=1, padding=1)
            bp = self.branch_pool(bp)
            return torch.cat([b1, b3, bd, bp], 1)

    class Oracle(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, 3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, 3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, 3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, 1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, 3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280, "avg")
            self.Mixed_7c = IncE(2048, "max")
            self.fc = tnn.Linear(2048, 1008)

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Mixed_5b(x)
            x = self.Mixed_5c(x)
            x = self.Mixed_5d(x)
            x = self.Mixed_6a(x)
            x = self.Mixed_6b(x)
            x = self.Mixed_6c(x)
            spatial = self.Mixed_6d(x)
            x = self.Mixed_6e(spatial)
            x = self.Mixed_7a(x)
            x = self.Mixed_7b(x)
            x = self.Mixed_7c(x)
            pool3 = x.mean(dim=(2, 3))
            return pool3, spatial, self.fc(pool3)

    m = Oracle()
    m.load_state_dict(state_dict, strict=True)
    m.eval()
    return m
