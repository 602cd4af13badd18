"""Numerical parity of DxMITrainerCond vs the reference DxMI_Trainer_Cond
(trainer.py:412-746): forward beta ordering, y plumbing, sigma_scale
entropy, and the mixed-precision sampler-update loss.

Same deterministic-stub strategy as test_trainer_parity. The sampler
OPTIMIZER differs by design (optax.radam vs torch RAdam + loss-scaling),
so the policy update is compared at lr=0 on its LOSS metrics only; the
value path (plain Adam) is compared through parameters.
"""
import numpy as np
import pytest

from tests.conftest import requires_reference

T = 4
B = 8
D = 6
SHAPE = (2, 3, 1)

TAU1 = 0.1
TAU2 = 0.01
GAMMA = 1.0
V_LR = 1e-3
ADAVELREG = 0.99
SIGMA_SCALE = 30.0
W0 = 0.9
V_W0 = 0.05
LOG_BETAS0 = np.log(np.array([0.8, 0.5, 0.3, 0.05], dtype=np.float32))
ETA = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)


def make_traj(seed=0):
    rng = np.random.RandomState(seed)
    l_sample = rng.randn(T + 1, B, *SHAPE).astype(np.float32)
    sigma = np.exp(LOG_BETAS0)[:, None].repeat(B, 1).astype(np.float32)
    img = rng.randn(B, *SHAPE).astype(np.float32)
    y = rng.randint(0, 10, B).astype(np.int32)
    return l_sample, sigma, img, y


def run_jax():
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond
    from tests.test_trainer_parity import JaxLinValue, JaxStubSampler

    sampler = JaxStubSampler()
    value = JaxLinValue()
    trainer = DxMITrainerCond(batchsize=B, tau1=TAU1, tau2=TAU2, gamma=GAMMA,
                              n_timesteps=T, use_sampler_beta=True,
                              adavelreg=ADAVELREG, time_cost=0.0,
                              time_cost_sig=1.0, sigma_scale=SIGMA_SCALE,
                              skip_sampler_tau=1)
    trainer.set_models(sampler, value, lr=0.0, v_lr=V_LR, beta_lr=0.0)

    state = trainer.init_state(sampler.init_params(), value.init_params())

    l_sample, sigma, img, y = make_traj()
    d_sample = {
        "l_sample": jnp.asarray(l_sample),
        "sample": jnp.asarray(l_sample[-1]),
        "mean": jnp.asarray(l_sample[1:]),
        "sigma": jnp.asarray(sigma),
        "logp": jnp.zeros((T, B)),
        "entropy": jnp.log(jnp.asarray(sigma)),
        "control": jnp.zeros((T, B, *SHAPE)),
        "y": jnp.asarray(y),
    }
    traj = buflib.from_d_sample(d_sample)
    state, m1 = trainer.update_f_v(state, jnp.asarray(img), traj,
                                   jax.random.key(0), y=jnp.asarray(y))
    # single-minibatch policy sweep at lr=0: loss metrics only
    traj1 = jax.tree.map(lambda a: a[:, :1] if a is not None else None, traj)
    state, m2 = trainer.update_sampler(state, traj1, jax.random.key(1),
                                       n_generator=1)
    return state, m1, m2


def run_reference(reference_path):
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.RandomCrop = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    sys.path.insert(0, str(reference_path))
    try:
        from models.DxMI.trainer import (DxMI_Trainer_Cond, append_buffer,
                                         reset_buffer)
        from models.cm.fp16_util import MixedPrecisionTrainer
    finally:
        sys.path.pop(0)

    Sampler, Value = _torch_stubs()
    sampler = Sampler()
    v = Value()
    opt = torch.optim.RAdam(sampler.parameters(), lr=0.0)
    opt_v = torch.optim.Adam(v.parameters(), lr=V_LR)
    mp = MixedPrecisionTrainer(model=sampler, use_fp16=False)

    trainer = DxMI_Trainer_Cond(batchsize=B, tau1=TAU1, tau2=TAU2,
                                gamma=GAMMA, n_timesteps=T,
                                use_sampler_beta=True, adavelreg=ADAVELREG,
                                time_cost=0.0, time_cost_sig=1.0,
                                sigma_scale=SIGMA_SCALE, skip_sampler_tau=1)
    trainer.set_models(v=v, sampler=sampler, optimizer=opt, optimizer_v=opt_v)

    l_sample, sigma, img, y = make_traj()
    d_sample = {
        "l_sample": [torch.from_numpy(a) for a in l_sample],
        "sample": torch.from_numpy(l_sample[-1]),
        "mean": [torch.from_numpy(a) for a in l_sample[1:]],
        "sigma": [torch.from_numpy(sigma[i]).view(-1, 1, 1, 1)
                  for i in range(T)],
        "logp": [torch.zeros(B) for _ in range(T)],
        "entropy": [torch.from_numpy(np.log(sigma[i])).view(-1, 1, 1, 1)
                    for i in range(T)],
        "control": [torch.zeros(B, *SHAPE) for _ in range(T)],
        "y": torch.from_numpy(y).long(),
    }
    state_dict = reset_buffer("cpu")
    append_buffer(state_dict, d_sample)

    m1 = trainer.update_f_v(torch.from_numpy(img), d_sample, state_dict,
                            y=torch.from_numpy(y).long())
    # T=1 buffer (first step) for the policy-loss comparison
    sd1 = reset_buffer("cpu")
    d1 = {k: (v_[:1] if isinstance(v_, list) else v_)
          for k, v_ in d_sample.items()}
    d1["l_sample"] = d_sample["l_sample"][:2]
    d1["sample"] = d_sample["l_sample"][1]
    append_buffer(sd1, d1)
    m2 = trainer.update_sampler_mixed_precision(sd1, mp)
    return sampler, v, trainer, m1, m2


def _run_jax_repeat_resample():
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi_cond import DxMITrainerCond
    from tests.test_trainer_parity import JaxLinValue, JaxStubSampler

    sampler = JaxStubSampler()
    value = JaxLinValue()
    trainer = DxMITrainerCond(batchsize=B, tau1=TAU1, tau2=TAU2, gamma=GAMMA,
                              n_timesteps=T, use_sampler_beta=True,
                              adavelreg=ADAVELREG, time_cost=0.0,
                              time_cost_sig=1.0, sigma_scale=SIGMA_SCALE,
                              skip_sampler_tau=1, repeat_value_update=2,
                              value_resample=True,
                              aug=lambda x, key: 0.5 * x)
    trainer.set_models(sampler, value, lr=0.0, v_lr=V_LR, beta_lr=0.0)

    state = trainer.init_state(sampler.init_params(), value.init_params())

    l_sample, sigma, img, y = make_traj()
    d_sample = {
        "l_sample": jnp.asarray(l_sample),
        "sample": jnp.asarray(l_sample[-1]),
        "mean": jnp.asarray(l_sample[1:]),
        "sigma": jnp.asarray(sigma),
        "logp": jnp.zeros((T, B)),
        "entropy": jnp.log(jnp.asarray(sigma)),
        "control": jnp.zeros((T, B, *SHAPE)),
        "y": jnp.asarray(y),
    }
    traj = buflib.from_d_sample(d_sample)
    state, m1 = trainer.update_f_v(state, jnp.asarray(img), traj,
                                   jax.random.key(0), y=jnp.asarray(y))
    traj1 = jax.tree.map(lambda a: a[:, :1] if a is not None else None, traj)
    state, m2 = trainer.update_sampler(state, traj1, jax.random.key(1),
                                       n_generator=1)
    return state, m1, m2


def _run_reference_repeat_resample(reference_path):
    import sys
    import types

    import torch

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.RandomCrop = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    sys.path.insert(0, str(reference_path))
    try:
        from models.DxMI.trainer import (DxMI_Trainer_Cond, append_buffer,
                                         reset_buffer)
        from models.cm.fp16_util import MixedPrecisionTrainer
    finally:
        sys.path.pop(0)

    Sampler, Value = _torch_stubs()
    sampler = Sampler()
    v = Value()
    opt = torch.optim.RAdam(sampler.parameters(), lr=0.0)
    opt_v = torch.optim.Adam(v.parameters(), lr=V_LR)
    mp = MixedPrecisionTrainer(model=sampler, use_fp16=False)

    trainer = DxMI_Trainer_Cond(batchsize=B, tau1=TAU1, tau2=TAU2,
                                gamma=GAMMA, n_timesteps=T,
                                use_sampler_beta=True, adavelreg=ADAVELREG,
                                time_cost=0.0, time_cost_sig=1.0,
                                sigma_scale=SIGMA_SCALE, skip_sampler_tau=1,
                                repeat_value_update=2, value_resample=True,
                                aug=lambda x: 0.5 * x)
    trainer.set_models(v=v, sampler=sampler, optimizer=opt, optimizer_v=opt_v)

    l_sample, sigma, img, y = make_traj()
    d_sample = {
        "l_sample": [torch.from_numpy(a) for a in l_sample],
        "sample": torch.from_numpy(l_sample[-1]),
        "mean": [torch.from_numpy(a) for a in l_sample[1:]],
        "sigma": [torch.from_numpy(sigma[i]).view(-1, 1, 1, 1)
                  for i in range(T)],
        "logp": [torch.zeros(B) for _ in range(T)],
        "entropy": [torch.from_numpy(np.log(sigma[i])).view(-1, 1, 1, 1)
                    for i in range(T)],
        "control": [torch.zeros(B, *SHAPE) for _ in range(T)],
        "y": torch.from_numpy(y).long(),
    }
    state_dict = reset_buffer("cpu")
    append_buffer(state_dict, d_sample)

    m1 = trainer.update_f_v(torch.from_numpy(img), d_sample, state_dict,
                            y=torch.from_numpy(y).long())
    sd1 = reset_buffer("cpu")
    d1 = {k: (v_[:1] if isinstance(v_, list) else v_)
          for k, v_ in d_sample.items()}
    d1["l_sample"] = d_sample["l_sample"][:2]
    d1["sample"] = d_sample["l_sample"][1]
    append_buffer(sd1, d1)
    m2 = trainer.update_sampler_mixed_precision(sd1, mp)
    return sampler, v, trainer, m1, m2


def _torch_stubs():
    """Deterministic torch stub classes shared by both Cond parity tests
    (mean = w*x policy with trainable log_betas; linear value net)."""
    import torch
    import torch.nn as nn

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.tensor(W0))
            self.log_betas = nn.Parameter(torch.tensor(LOG_BETAS0))

        def forward(self, x):
            return x

    class Sampler(nn.Module):
        n_timesteps = T
        trainable_beta = True
        class_cond = True
        user_defined_eta = ETA

        def __init__(self):
            super().__init__()
            self.net = Net()

        def sample_step(self, x, t, y=None):
            from torch.distributions import Normal

            t = t.long()
            mean = self.net.w * x
            sigma = torch.exp(self.net.log_betas)[t].view(-1, 1, 1, 1)
            sample = mean
            dist = Normal(mean, sigma)
            logp = dist.log_prob(sample.detach()).mean(-1).mean(-1).mean(-1)
            return {"sample": sample, "mean": mean, "sigma": sigma,
                    "logp": logp, "logp_terminal": torch.zeros(len(x)),
                    "entropy": torch.log(sigma), "control": mean * 0}

        def train(self, mode=True):
            return self

    class Value(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.full((D,), V_W0))
            self.b = nn.Parameter(torch.tensor(0.1))

        def forward(self, x, t=None, y=None):
            return (x.reshape(x.shape[0], -1) @ self.w + self.b)[:, None]

    return Sampler, Value


@pytest.mark.slow
@requires_reference
def test_cond_repeat_resample_aug_parity(reference_path):
    """repeat_value_update=2 + value_resample + deterministic aug hook vs
    the reference (trainer.py:594-674): two sequential TD sweeps with the
    value net evolving between them, SAC-style next-state resampling from
    the current policy (RNG-free with the noise-free stub), and the aug
    applied to the energy inputs, both TD value inputs, and the policy
    update's next_state."""
    state, jm1, jm2 = _run_jax_repeat_resample()
    sampler_t, v_t, trainer_t, tm1, tm2 = \
        _run_reference_repeat_resample(reference_path)

    assert float(jm1["ebm/d_loss_"]) == pytest.approx(tm1["ebm/d_loss_"],
                                                      rel=1e-4)
    np.testing.assert_allclose(np.asarray(state.betas_for_q),
                               trainer_t.betas_for_q.numpy(), rtol=1e-5)

    from dxmi_tpu.utils.logging import expand_metrics

    jd = expand_metrics(jm1)
    for t in range(T):
        assert jd[f"running_cost/step_{t}_"] == pytest.approx(
            tm1[f"running_cost/step_{t}_"], rel=1e-3, abs=1e-5), t
        assert jd[f"value/step_{t}_"] == pytest.approx(
            tm1[f"value/step_{t}_"], rel=1e-3, abs=1e-5), t

    # value params after 1 energy + 2*T TD Adam steps
    np.testing.assert_allclose(np.asarray(state.v_params["w"]),
                               v_t.w.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(state.v_params["b"]),
                               float(v_t.b.detach()), rtol=1e-4, atol=1e-6)

    assert float(jm2["sampler/sampler_loss_"]) == pytest.approx(
        tm2["sampler/sampler_loss_"], rel=1e-3)
    assert float(jm2["sampler/causal_entropy_"]) == pytest.approx(
        tm2["sampler/causal_entropy_"], rel=1e-3)
    assert float(jm2["sampler/running_cost_"]) == pytest.approx(
        tm2["sampler/running_cost_"], rel=1e-3)


@pytest.mark.slow
@requires_reference
def test_cond_trainer_parity(reference_path):
    state, jm1, jm2 = run_jax()
    sampler_t, v_t, trainer_t, tm1, tm2 = run_reference(reference_path)

    assert float(jm1["ebm/d_loss_"]) == pytest.approx(tm1["ebm/d_loss_"],
                                                      rel=1e-4)
    # forward beta ordering: adavelreg WITHOUT flip
    np.testing.assert_allclose(np.asarray(state.betas_for_q),
                               trainer_t.betas_for_q.numpy(), rtol=1e-5)

    from dxmi_tpu.utils.logging import expand_metrics

    jd = expand_metrics(jm1)
    for t in range(T):
        assert jd[f"running_cost/step_{t}_"] == pytest.approx(
            tm1[f"running_cost/step_{t}_"], rel=1e-3, abs=1e-5), t
        assert jd[f"value/step_{t}_"] == pytest.approx(
            tm1[f"value/step_{t}_"], rel=1e-3, abs=1e-5), t

    np.testing.assert_allclose(np.asarray(state.v_params["w"]),
                               v_t.w.detach().numpy(), rtol=1e-4, atol=1e-6)

    # policy loss (lr=0 both sides): sigma_scale entropy + skip_sampler_tau
    assert float(jm2["sampler/sampler_loss_"]) == pytest.approx(
        tm2["sampler/sampler_loss_"], rel=1e-3)
    assert float(jm2["sampler/causal_entropy_"]) == pytest.approx(
        tm2["sampler/causal_entropy_"], rel=1e-3)
    assert float(jm2["sampler/running_cost_"]) == pytest.approx(
        tm2["sampler/running_cost_"], rel=1e-3)
