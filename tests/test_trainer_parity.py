"""Numerical parity of the DxMI update programs vs the reference trainer.

Strategy: drive BOTH trainers with identical deterministic stub models
(linear value net, noise-free linear policy) and an identical buffered
trajectory, then compare post-update parameters and metrics. This pins the
running-cost formula, adaptive velocity regularisation, energy loss, the
sequential TD sweep (target composition + per-step Adam), and the policy
loss + grad-clip semantics against /root/reference/models/DxMI/trainer.py.
"""
import numpy as np
import pytest

from tests.conftest import requires_reference

T = 4
B = 8
D = 6  # flattened sample dim (2, 3, 1) image
SHAPE = (2, 3, 1)  # H, W, C for jax side; torch side uses (1, 2, 3)

TAU1 = 0.1
TAU2 = 0.01
GAMMA = 1.0
LR = 1e-3
V_LR = 1e-3
BETA_LR = 1e-3
ADAVELREG = 0.99
W0 = 0.9
V_W0 = 0.05
LOG_BETAS0 = np.log(np.array([0.8, 0.5, 0.3, 0.05], dtype=np.float32))
ETA = np.array([0.1, 0.2, 0.3, 0.4], dtype=np.float32)  # betas_for_q init


def make_trajectory(seed=0):
    rng = np.random.RandomState(seed)
    l_sample = rng.randn(T + 1, B, *SHAPE).astype(np.float32)
    sigma = np.exp(LOG_BETAS0)[:, None].repeat(B, 1).astype(np.float32)
    mean = l_sample[1:]  # noise-free stub: mean == next state
    img = rng.randn(B, *SHAPE).astype(np.float32)
    return l_sample, mean, sigma, img


# ---------------------------------------------------------------------------
# jax side
# ---------------------------------------------------------------------------


class JaxStubSampler:
    """mean = w * x; sigma = exp(log_betas[t]); sample = mean (no noise)."""

    n_timesteps = T
    sample_shape = SHAPE
    trainable_beta = True
    user_defined_eta = ETA

    def __init__(self):
        import jax.numpy as jnp

        self.jnp = jnp

    def init_params(self):
        import jax.numpy as jnp

        return {"net": {"w": jnp.asarray(W0)},
                "log_betas": jnp.asarray(LOG_BETAS0)}

    def sample_step(self, params, x, t, key, y=None, train=False,
                    dropout_rng=None):
        import jax.numpy as jnp

        from dxmi_tpu.samplers.var import gaussian_logp_mean

        t = jnp.broadcast_to(jnp.asarray(t), (x.shape[0],))
        mean = params["net"]["w"] * x
        sigma = jnp.take(jnp.exp(params["log_betas"]), t)
        sample = mean  # deterministic
        return {"sample": sample, "mean": mean, "sigma": sigma,
                "logp": gaussian_logp_mean(sample, mean,
                                           sigma.reshape(-1, 1, 1, 1)),
                "logp_terminal": jnp.zeros((x.shape[0],)),
                "entropy": jnp.log(sigma), "control": mean * 0}


class JaxLinValue:
    """V(x, t) = sum(x * vw) + vb  (time-independent)."""

    def __init__(self):
        pass

    def apply(self, variables, x, t, y=None, **kw):
        import jax.numpy as jnp

        p = variables["params"]
        return (x.reshape(x.shape[0], -1) @ p["w"] + p["b"])[:, None]

    def init_params(self):
        import jax.numpy as jnp

        w = jnp.full((D,), V_W0)
        return {"w": w, "b": jnp.asarray(0.1)}


def run_jax():
    import jax
    import jax.numpy as jnp

    from dxmi_tpu.trainers import buffer as buflib
    from dxmi_tpu.trainers.dxmi import DxMITrainer

    sampler = JaxStubSampler()
    value = JaxLinValue()
    trainer = DxMITrainer(batchsize=B, tau1=TAU1, tau2=TAU2, gamma=GAMMA,
                          n_timesteps=T, use_sampler_beta=True,
                          adavelreg=ADAVELREG, time_cost=0.0,
                          time_cost_sig=1.0)
    trainer.set_models(sampler, value, lr=LR, v_lr=V_LR, beta_lr=BETA_LR)

    sp = sampler.init_params()
    vp = value.init_params()
    state = trainer.init_state(sp, vp)

    l_sample, mean, sigma, img = make_trajectory()
    d_sample = {
        "l_sample": jnp.asarray(l_sample),
        "sample": jnp.asarray(l_sample[-1]),
        "mean": jnp.asarray(mean),
        "sigma": jnp.asarray(sigma),
        "logp": jnp.zeros((T, B)),
        "entropy": jnp.log(jnp.asarray(sigma)),
        "control": jnp.zeros_like(jnp.asarray(mean)),
    }
    traj = buflib.from_d_sample(d_sample)

    state, m1 = trainer.update_f_v(state, jnp.asarray(img), traj,
                                   jax.random.key(0))
    # sampler-update parity runs on a T=1 buffer (single full minibatch ->
    # permutation invariant); use the FIRST step's transitions so the
    # implicit timestep (0) matches on both sides
    traj1 = jax.tree.map(lambda a: a[:, :1] if a is not None else None, traj)
    state, m2 = trainer.update_sampler(state, traj1, jax.random.key(1),
                                       n_generator=1)
    return state, m1, m2


# ---------------------------------------------------------------------------
# torch side (reference)
# ---------------------------------------------------------------------------


def run_reference(reference_path):
    import sys
    import types

    import torch
    import torch.nn as nn

    # the reference trainer's import chain pulls torchvision (absent in
    # this image) transitively via karras_diffusion; shim the two names it
    # imports at module scope
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.RandomCrop = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt

    sys.path.insert(0, str(reference_path))
    try:
        from models.DxMI.trainer import DxMI_Trainer, append_buffer, reset_buffer
    finally:
        sys.path.pop(0)

    class TorchStubNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.tensor(W0))
            self.log_betas = nn.Parameter(torch.tensor(LOG_BETAS0))

    class TorchStubSampler(nn.Module):
        n_timesteps = T
        trainable_beta = True
        user_defined_eta = ETA

        def __init__(self):
            super().__init__()
            self.net = TorchStubNet()

        def sample_step(self, x, t, y=None):
            from torch.distributions import Normal

            t = t.long()
            mean = self.net.w * x
            sigma = torch.exp(self.net.log_betas)[t]
            sig_b = sigma.view(-1, 1, 1, 1)
            sample = mean
            dist = Normal(mean, sig_b)
            logp = dist.log_prob(sample.detach()).mean(-1).mean(-1).mean(-1)
            return {"sample": sample, "mean": mean, "sigma": sig_b,
                    "logp": logp,
                    "logp_terminal": torch.zeros(len(x)),
                    "entropy": torch.log(sig_b), "control": mean * 0}

    class TorchLinValue(nn.Module):
        def __init__(self):
            super().__init__()
            self.w = nn.Parameter(torch.full((D,), V_W0))
            self.b = nn.Parameter(torch.tensor(0.1))

        def forward(self, x, t=None, y=None):
            return (x.reshape(x.shape[0], -1) @ self.w + self.b)[:, None]

    sampler = TorchStubSampler()
    v = TorchLinValue()
    opt = torch.optim.Adam([
        {"params": [sampler.net.log_betas], "lr": BETA_LR},
        {"params": [sampler.net.w], "lr": LR},
    ])
    opt_v = torch.optim.Adam(v.parameters(), lr=V_LR)

    trainer = DxMI_Trainer(batchsize=B, tau1=TAU1, tau2=TAU2, gamma=GAMMA,
                           n_timesteps=T, use_sampler_beta=True,
                           adavelreg=ADAVELREG, time_cost=0.0,
                           time_cost_sig=1.0)
    trainer.set_models(f=None, v=v, sampler=sampler, optimizer=opt,
                       optimizer_fstar=None, optimizer_v=opt_v)

    l_sample, mean, sigma, img = make_trajectory()
    # reference layout is NCHW; ours NHWC — the stub math is layout-
    # agnostic (elementwise + flatten), so feed the same raw arrays
    d_sample = {
        "l_sample": [torch.from_numpy(a) for a in l_sample],
        "sample": torch.from_numpy(l_sample[-1]),
        "mean": [torch.from_numpy(a) for a in mean],
        "sigma": [torch.from_numpy(sigma[i]).view(-1, 1, 1, 1)
                  for i in range(T)],
        "logp": [torch.zeros(B) for _ in range(T)],
        "entropy": [torch.from_numpy(np.log(sigma[i])).view(-1, 1, 1, 1)
                    for i in range(T)],
        "control": [torch.zeros_like(torch.from_numpy(mean[i]))
                    for i in range(T)],
    }
    state_dict = reset_buffer("cpu")
    append_buffer(state_dict, d_sample)

    m1 = trainer.update_f_v(torch.from_numpy(img), d_sample, state_dict)
    # T=1 buffer for the sampler update: only the FIRST step's rows
    # (their natural timestep 0 matches the jax side's (T=1, B) layout)
    state_dict1 = reset_buffer("cpu")
    d1 = {
        "l_sample": d_sample["l_sample"][:2],
        "sample": d_sample["l_sample"][1],
        "mean": d_sample["mean"][:1],
        "sigma": d_sample["sigma"][:1],
        "logp": d_sample["logp"][:1],
        "entropy": d_sample["entropy"][:1],
        "control": d_sample["control"][:1],
    }
    append_buffer(state_dict1, d1)
    m2 = trainer.update_sampler(state_dict1, n_generator=1)
    return sampler, v, trainer, m1, m2


@pytest.mark.slow
@requires_reference
def test_update_f_v_and_sampler_parity(reference_path):
    state, jm1, jm2 = run_jax()
    sampler_t, v_t, trainer_t, tm1, tm2 = run_reference(reference_path)

    # ---- energy metrics ----
    assert float(jm1["ebm/d_loss_"]) == pytest.approx(tm1["ebm/d_loss_"],
                                                      rel=1e-4)
    assert float(jm1["ebm/pos_e_"]) == pytest.approx(tm1["ebm/pos_e_"], rel=1e-4)
    assert float(jm1["ebm/neg_e_"]) == pytest.approx(tm1["ebm/neg_e_"], rel=1e-4)

    # ---- betas_for_q adaptive update ----
    ref_betas = trainer_t.betas_for_q.numpy()
    np.testing.assert_allclose(np.asarray(state.betas_for_q), ref_betas,
                               rtol=1e-5)

    # ---- per-step running cost and value metrics (TD sweep order) ----
    from dxmi_tpu.utils.logging import expand_metrics

    jd = expand_metrics(jm1)
    for t in range(T):
        assert jd[f"running_cost/step_{t}_"] == pytest.approx(
            tm1[f"running_cost/step_{t}_"], rel=1e-3, abs=1e-5), t
        assert jd[f"value/step_{t}_"] == pytest.approx(
            tm1[f"value/step_{t}_"], rel=1e-3, abs=1e-5), t

    # ---- value params after T+1 Adam steps ----
    np.testing.assert_allclose(np.asarray(state.v_params["w"]),
                               v_t.w.detach().numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(float(state.v_params["b"]),
                               float(v_t.b.detach()), rtol=1e-4, atol=1e-6)

    # ---- sampler update: loss metrics + params after clipped Adam step ----
    assert float(jm2["sampler/sampler_loss_"]) == pytest.approx(
        tm2["sampler/sampler_loss_"], rel=1e-3)
    assert float(jm2["sampler/running_cost_"]) == pytest.approx(
        tm2["sampler/running_cost_"], rel=1e-3)
    assert float(jm2["sampler/causal_entropy_"]) == pytest.approx(
        tm2["sampler/causal_entropy_"], rel=1e-3)
    np.testing.assert_allclose(
        float(state.sampler_params["net"]["w"]),
        float(sampler_t.net.w.detach()), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(state.sampler_params["log_betas"]),
        sampler_t.net.log_betas.detach().numpy(), rtol=1e-4, atol=1e-6)
