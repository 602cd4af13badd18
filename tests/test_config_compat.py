"""Drop-in compatibility with the reference's YAML configs: the alias
table must resolve every ``_target_`` (including the stale LSUN paths,
SURVEY.md §2.0) onto dxmi_tpu classes, and the shipped dxmi_tpu configs
must instantiate end-to-end."""
import pathlib

import pytest

from dxmi_tpu import config as C
from tests.conftest import REFERENCE, requires_reference

REPO = pathlib.Path(__file__).resolve().parents[1]


def _collect_targets(node, out):
    if isinstance(node, dict):
        if "_target_" in node:
            out.append(node["_target_"])
        for v in node.values():
            _collect_targets(v, out)
    elif isinstance(node, list):
        for v in node:
            _collect_targets(v, out)


@requires_reference
@pytest.mark.parametrize("rel", [
    "configs/cifar10/T10.yaml",
    "configs/cifar10/T4_ddgan.yaml",
    "configs/imagenet64/T10.yaml",
    "configs/imagenet64/T4.yaml",
    "configs/lsun/T4.yaml",
    "configs/lsun/T10.yaml",
    "configs/lsun/T4_wide.yaml",
])
def test_reference_targets_resolve(rel):
    cfg = C.load_yaml(str(REFERENCE / rel))
    targets = []
    _collect_targets(cfg, targets)
    assert targets, rel
    for t in targets:
        fn = C.resolve_target(t)
        assert callable(fn), t
        assert fn.__module__.startswith("dxmi_tpu"), (t, fn.__module__)


def test_own_cifar_config_instantiates():
    cfg = C.load_yaml(str(REPO / "configs/cifar10/T10.yaml"))
    net = C.instantiate(cfg["sampler_net"])
    sampler = C.instantiate(cfg["sampler"], net=net)
    value = C.instantiate(cfg["value"])
    trainer = C.instantiate(cfg["trainer"], batchsize=8,
                            n_timesteps=cfg["sampler"]["n_timesteps"])
    from dxmi_tpu.models.unet_small import UNetSmall
    from dxmi_tpu.samplers.var import VARSampler
    from dxmi_tpu.trainers.dxmi import DxMITrainer

    assert isinstance(net, UNetSmall) and net.ch == 128
    assert isinstance(sampler, VARSampler) and sampler.n_timesteps == 10
    assert sampler.trainable_beta == "fix_last"
    assert isinstance(trainer, DxMITrainer)
    assert trainer.use_sampler_beta and trainer.adavelreg == 0.99
    assert C.instantiate(cfg["energy"]) is None


def test_own_ddgan_config_instantiates():
    cfg = C.load_yaml(str(REPO / "configs/cifar10/T4_ddgan.yaml"))
    net = C.instantiate(cfg["sampler_net"])
    sampler = C.instantiate(cfg["sampler"], net=net)
    from dxmi_tpu.models.ncsnpp import NCSNpp
    from dxmi_tpu.samplers.ddgan import DDGANSampler

    assert isinstance(net, NCSNpp) and net.config.nf == 128
    assert isinstance(sampler, DDGANSampler)
    assert sampler.use_z and sampler.n_timesteps == 4


@requires_reference
def test_reference_cifar_config_instantiates_via_aliases():
    """The REFERENCE's own T10 YAML builds dxmi_tpu objects unchanged."""
    cfg = C.load_yaml(str(REFERENCE / "configs/cifar10/T10.yaml"))
    net = C.instantiate(cfg["sampler_net"])
    from dxmi_tpu.models.unet_small import UNetSmall

    assert isinstance(net, UNetSmall)
    assert net.ch == 128 and tuple(net.ch_mult) == (1, 2, 2, 2)
    sampler = C.instantiate(cfg["sampler"], net=net)
    from dxmi_tpu.samplers.var import VARSampler

    assert isinstance(sampler, VARSampler)
