"""DxMI trainer with SEPARATE energy and value networks — the anomaly-
detection variant (capability parity with ``DxMI_Trainer_EV``,
/root/reference/models/DxMI/trainer.py:865-1058).

Differences from the base trainer:
  * energy step trains ``f`` (its own optimizer, grad-clip 0.1, no gamma
    regulariser),
  * TD targets ALWAYS resample the next state from the current policy and
    blend f/v at the terminal step:
        target = [v(x', t+1) * 1{t<T-1} + f(x') * 1{t=T-1}]
                 + tau2 * cost - tau1 * entropy   (trainer.py:986-989)
  * the sampler update also blends f/v at the terminal step.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from dxmi_tpu.trainers.buffer import TrajectoryBuffer
from dxmi_tpu.trainers.dxmi import DxMITrainer, mean_flat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DxMIStateEV:
    sampler_params: Any
    v_params: Any
    f_params: Any
    opt_state_sampler: Any
    opt_state_v: Any
    opt_state_f: Any
    betas_for_q: jnp.ndarray
    # optional 'sn_stats' collections (spectral-norm IGEBM energies,
    # modules.py:34-47); None when the nets carry no such collection
    v_stats: Any = None
    f_stats: Any = None


class DxMITrainerEV(DxMITrainer):
    def __init__(self, batchsize, tau1=0.0, tau2=0.0,
                 q_beta_schedule="constant", q_beta_start=1.0, q_beta_end=1.0,
                 adavelreg=None, n_timesteps=10, use_sampler_beta=False):
        super().__init__(batchsize, tau1=tau1, tau2=tau2,
                         q_beta_schedule=q_beta_schedule,
                         q_beta_start=q_beta_start, q_beta_end=q_beta_end,
                         adavelreg=adavelreg, n_timesteps=n_timesteps,
                         use_sampler_beta=use_sampler_beta)
        self.energy = None

    def init_betas_for_q(self, sampler_params=None):
        if self.use_sampler_beta:
            # reference EV: betas_for_q = exp(net.log_betas) at set_models
            # time (trainer.py:909-911) — the sampler's CURRENT per-step
            # sigmas, NOT the q-process eta the base trainer uses
            # (trainer.py:144-161). Read the live params so checkpoints
            # whose log_betas were trained away from init are honored.
            if sampler_params is not None and "log_betas" in sampler_params:
                return jnp.exp(jnp.asarray(sampler_params["log_betas"],
                                           jnp.float32))
            sch = getattr(self.sampler, "schedule", None)
            if sch is not None and hasattr(sch, "init_sigma"):
                return jnp.asarray(sch.init_sigma, jnp.float32)
            raise ValueError("use_sampler_beta EV trainer requires sampler "
                             "params with log_betas or a schedule with "
                             "init_sigma")
        return super().init_betas_for_q(sampler_params)

    def set_models(self, sampler, value, energy, lr, v_lr, f_lr,
                   beta_lr=None, donate=False):
        super().set_models(sampler, value, lr, v_lr, beta_lr, donate=donate)
        # assign AFTER super(): the base resets self.energy (its optional
        # f-mode is unused here — EV has its own update programs)
        self.energy = energy
        self.opt_f = optax.chain(optax.clip_by_global_norm(0.1),
                                 optax.adam(f_lr))
        dn = (0,) if donate else ()
        self._jit_update_f_v_ev = jax.jit(self._update_f_v_ev_impl,
                                          donate_argnums=dn)
        self._jit_update_sampler_ev = jax.jit(
            self._update_sampler_ev_impl, static_argnames=("n_generator",),
            donate_argnums=dn)

    def init_state_ev(self, sampler_params, v_params, f_params,
                      v_stats=None, f_stats=None) -> DxMIStateEV:
        return DxMIStateEV(
            sampler_params=sampler_params,
            v_params=v_params,
            f_params=f_params,
            opt_state_sampler=self.opt_sampler.init(sampler_params),
            opt_state_v=self.opt_v.init(v_params),
            opt_state_f=self.opt_f.init(f_params),
            betas_for_q=self.init_betas_for_q(sampler_params),
            v_stats=v_stats,
            f_stats=f_stats,
        )

    # ------------------------------------------------------------------

    def update_f_v(self, state: DxMIStateEV, img, buffer: TrajectoryBuffer,
                   key, y=None):
        return self._jit_update_f_v_ev(state, img, buffer, key)

    def _update_f_v_ev_impl(self, state: DxMIStateEV, img,
                            buffer: TrajectoryBuffer, key):
        T = self.n_timesteps
        traj = jax.tree.map(lambda a: a[0], buffer.last())

        betas_for_q = state.betas_for_q
        if self.adavelreg is not None:
            diff = ((traj.next_state - traj.state) ** 2).reshape(T, -1).mean(axis=1)
            diff = jnp.flip(diff, axis=0)
            betas_for_q = betas_for_q * self.adavelreg + (1 - self.adavelreg) * diff

        # ---- energy step on f (trainer.py:951-963) ----
        x0 = traj.next_state[-1]
        inputs = jnp.concatenate([img, x0], axis=0)

        f_stats = state.f_stats

        def f_loss(f_params):
            if f_stats is None:
                out = self._f_apply(f_params, inputs)
                new_stats = None
            else:
                out, new_stats = self._f_apply(f_params, inputs,
                                               stats=f_stats, update=True)
            pos = out[: img.shape[0]]
            neg = out[img.shape[0]:]
            return pos.mean() - neg.mean(), (pos.mean(), neg.mean(), new_stats)

        (d_loss, (pos_e, neg_e, new_stats)), g = jax.value_and_grad(
            f_loss, has_aux=True)(state.f_params)
        if new_stats is not None:
            f_stats = new_stats
        up, opt_state_f = self.opt_f.update(g, state.opt_state_f, state.f_params)
        f_params = optax.apply_updates(state.f_params, up)

        # ---- TD sweep with policy resampling (trainer.py:968-999) ----
        t_vals = jnp.arange(T, dtype=jnp.int32)
        xs = {"state": traj.state, "t": t_vals, "key": jax.random.split(key, T)}
        order = jnp.arange(T - 1, -1, -1)
        xs = jax.tree.map(lambda a: jnp.take(a, order, axis=0), xs)

        def td_step(carry, x):
            v_params, opt_state_v, v_stats = carry
            t = x["t"]
            tvec = jnp.full((x["state"].shape[0],), t, dtype=jnp.int32)
            d = self.sampler.sample_step(state.sampler_params, x["state"],
                                         tvec, x["key"])
            next_state = jax.lax.stop_gradient(d["sample"])
            sigma = jax.lax.stop_gradient(d["sigma"])
            cost = self._running_cost(betas_for_q, x["state"], next_state, tvec)
            entropy = jnp.log(sigma)

            non_term = (tvec < T - 1).astype(jnp.float32)
            v_next = (self._v_apply(v_params, next_state, tvec + 1,
                                    stats=v_stats) * non_term
                      + self._f_apply(f_params, next_state,
                                      stats=f_stats) * (1 - non_term))
            target = jax.lax.stop_gradient(
                v_next + cost * self.tau2 - entropy * self.tau1)

            def v_loss_fn(p):
                if v_stats is None:
                    v = self._v_apply(p, x["state"], tvec)
                    return ((v - target) ** 2).mean(), (v.mean(), None)
                v, new_stats = self._v_apply(p, x["state"], tvec,
                                             stats=v_stats, update=True)
                return ((v - target) ** 2).mean(), (v.mean(), new_stats)

            (v_loss, (v_mean, new_stats)), g = jax.value_and_grad(
                v_loss_fn, has_aux=True)(v_params)
            if new_stats is not None:
                v_stats = new_stats
            up, opt_state_v = self.opt_v.update(g, opt_state_v, v_params)
            v_params = optax.apply_updates(v_params, up)
            return (v_params, opt_state_v, v_stats), {
                "v_loss": v_loss, "running_cost": cost.mean(),
                "value": v_mean, "t": t}

        (v_params, opt_state_v, v_stats), td_out = jax.lax.scan(
            td_step, (state.v_params, state.opt_state_v, state.v_stats), xs)

        metrics = {
            "ebm/d_loss_": d_loss,
            "ebm/v_loss_": td_out["v_loss"][-1],
            "ebm/pos_e_": pos_e,
            "ebm/neg_e_": neg_e,
            "ebm/running_cost_": td_out["running_cost"][-1],
            "per_step/t": td_out["t"],
            "per_step/running_cost": td_out["running_cost"],
            "per_step/value": td_out["value"],
        }
        new_state = DxMIStateEV(
            sampler_params=state.sampler_params, v_params=v_params,
            f_params=f_params, opt_state_sampler=state.opt_state_sampler,
            opt_state_v=opt_state_v, opt_state_f=opt_state_f,
            betas_for_q=betas_for_q, v_stats=v_stats, f_stats=f_stats)
        return new_state, metrics

    # ------------------------------------------------------------------

    def update_sampler(self, state: DxMIStateEV, buffer: TrajectoryBuffer,
                       key, n_generator: Optional[int] = 1):
        flat = buffer.flat()
        N = int(flat["state"].shape[0])
        G = N // self.batchsize if n_generator is None else int(n_generator)
        return self._jit_update_sampler_ev(state, flat, key, n_generator=G)

    def _update_sampler_ev_impl(self, state: DxMIStateEV, flat, key, *,
                                n_generator: int):
        T = self.n_timesteps
        B = self.batchsize
        N = flat["state"].shape[0]
        G = min(n_generator, max(N // B, 1))

        key, pkey = jax.random.split(key)
        perm = jax.random.permutation(pkey, N)

        def g_step(carry, inputs):
            sampler_params, opt_state = carry
            i, k = inputs
            idx = jax.lax.dynamic_slice_in_dim(perm, i * B, B)
            s = jnp.take(flat["state"], idx, axis=0)
            t = jnp.take(flat["timestep"], idx, axis=0)
            k_step, k_drop = jax.random.split(k)

            def loss_fn(p):
                d = self.sampler.sample_step(p, s, t, k_step, train=True,
                                             dropout_rng=k_drop)
                cost = self._running_cost(state.betas_for_q, s, d["sample"], t).mean()
                entropy = jnp.log(d["sigma"]).mean()
                non_term = (t < T - 1).astype(jnp.float32)
                v_next = (self._v_apply(state.v_params, d["sample"], t + 1,
                                        stats=state.v_stats) * non_term
                          + self._f_apply(state.f_params, d["sample"],
                                          stats=state.f_stats) * (1 - non_term))
                loss = v_next.mean() + cost * self.tau2 - entropy * self.tau1
                return loss, (v_next.mean(), cost, entropy)

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(sampler_params)
            up, opt_state = self.opt_sampler.update(g, opt_state, sampler_params)
            sampler_params = optax.apply_updates(sampler_params, up)
            return (sampler_params, opt_state), (loss, *aux)

        keys = jax.random.split(key, G)
        (sampler_params, opt_state), outs = jax.lax.scan(
            g_step, (state.sampler_params, state.opt_state_sampler),
            (jnp.arange(G), keys))
        loss, v_term, cost, entropy = (o[-1] for o in outs)

        metrics = {
            "sampler/sampler_loss_": loss,
            "sampler/sampler_value_loss_": v_term,
            "sampler/running_cost_": cost,
            "sampler/causal_entropy_": entropy,
            "per_step/sigma": jnp.exp(sampler_params["log_betas"]),
        }
        new_state = DxMIStateEV(
            sampler_params=sampler_params, v_params=state.v_params,
            f_params=state.f_params, opt_state_sampler=opt_state,
            opt_state_v=state.opt_state_v, opt_state_f=state.opt_state_f,
            betas_for_q=state.betas_for_q, v_stats=state.v_stats,
            f_stats=state.f_stats)
        return new_state, metrics
