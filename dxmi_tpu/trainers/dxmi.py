"""DxMI trainer — single network as value+energy (2D / CIFAR-10 variant).

Algorithm parity with /root/reference/models/DxMI/trainer.py:73-408
(``DxMI_Trainer``); each phase is ONE jitted program:

  * ``update_f_v``   — contrastive energy step at the terminal timestep
    followed by a backward TD sweep with one optimizer step per timestep,
    expressed as a ``lax.scan`` carrying (v_params, v_opt_state). Matches
    the reference's sequential semantics exactly (SURVEY.md §7.2: a vmapped
    parallel update would change training dynamics).
  * ``update_sampler`` — policy-gradient step(s): re-execute one stochastic
    denoising step on buffered states with grad enabled, descend
    V(x_{t+1}) + tau2*cost - tau1*entropy, clip to global-norm 0.1.

Replicated reference quirks (documented, SURVEY.md §7.2):
  * with a separate energy ``f``, the terminal TD target is f(x_0) and the
    ``+ tau2*cost`` term is dead (trainer.py:294-300),
  * ``entropy_in_value``: None disables; any int (including 0) enables,
  * ``betas_for_q`` index is reversed in time (t_reversed = T-t-1).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from dxmi_tpu.schedules import make_beta_schedule
from dxmi_tpu.trainers.buffer import TrajectoryBuffer


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DxMIState:
    """All trainable state for one DxMI run (a single pytree).

    ``f_params``/``opt_state_f`` are populated only when a separate energy
    network is configured (the reference's optional ``f``,
    trainer.py:136-142); None otherwise (an empty pytree subtree)."""

    sampler_params: Any       # {"net": ..., "log_betas": (T,)}
    v_params: Any
    opt_state_sampler: Any
    opt_state_v: Any
    betas_for_q: jnp.ndarray  # (T,) running-cost betas (EMA-updated)
    f_params: Any = None
    opt_state_f: Any = None
    # non-param variable collections ('sn_stats' power-iteration vectors
    # for spectral-norm value/energy nets, modules.py:34-47); None when
    # the net has no such collection
    v_stats: Any = None
    f_stats: Any = None


def mean_flat(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape(x.shape[0], -1).mean(axis=1)


class DxMITrainer:
    """Static config + jitted update programs. Mirrors the reference
    constructor surface (trainer.py:74-133)."""

    def __init__(self, batchsize: int, tau1: float = 0.0, tau2: float = 0.0,
                 gamma: Optional[float] = None,
                 q_beta_schedule: str = "constant",
                 q_beta_start: float = 1.0, q_beta_end: float = 1.0,
                 adavelreg: Optional[float] = None,
                 n_timesteps: int = 10,
                 value_update_order: str = "backward",
                 entropy_in_value: Optional[int] = None,
                 velocity_in_value: Optional[int] = None,
                 use_sampler_beta: bool = False,
                 time_cost: Optional[float] = None,
                 time_cost_sig: Optional[float] = None,
                 repeat_value_update: int = 1,
                 value_resample: bool = False,
                 value_grad_clip: bool = False,
                 skip_sampler_tau: int = 0,
                 beta_ordering: str = "reversed",
                 entropy_value_scale: float = 1.0,
                 sigma_scale: Optional[float] = None,
                 time_cost_sig_center: Optional[int] = None,
                 skip_running_last: bool = False,
                 aug=None,
                 sample_chunks: int = 1):
        self.batchsize = int(batchsize)
        self.n_timesteps = int(n_timesteps)
        self.tau1 = float(tau1)
        self.tau2 = float(tau2)
        self.gamma = gamma
        self.q_beta_schedule = q_beta_schedule
        self.q_beta_start = q_beta_start
        self.q_beta_end = q_beta_end
        self.adavelreg = adavelreg
        self.value_update_order = value_update_order
        self.entropy_in_value = entropy_in_value
        self.velocity_in_value = velocity_in_value
        self.use_sampler_beta = use_sampler_beta
        self.time_cost = time_cost
        # time_cost_sig may arrive as a YAML bool (True == 1.0), matching
        # the reference's implicit bool->float promotion
        self.time_cost_sig = None if time_cost_sig is None else float(time_cost_sig)
        self.repeat_value_update = int(repeat_value_update)
        self.value_resample = bool(value_resample)
        self.value_grad_clip = bool(value_grad_clip)
        self.skip_sampler_tau = int(skip_sampler_tau)
        assert beta_ordering in {"reversed", "forward"}
        self.beta_ordering = beta_ordering
        self.entropy_value_scale = float(entropy_value_scale)
        self.sigma_scale = sigma_scale
        self.time_cost_sig_center = time_cost_sig_center
        # accepted for config parity; dead in the reference too
        # (trainer.py:478 stores it, nothing reads it)
        self.skip_running_last = skip_running_last
        self.aug = aug  # optional non-leaking augmentation hook
        # trajectory sampling in chunks of batchsize/n inside the jitted
        # step — the per-chunk batch rides the measured throughput
        # optimum (samplers.sample_chunked; +9% on the sampling phase at
        # 128 -> 2x64). 1 = off (reference-shaped single batch).
        self.sample_chunks = int(sample_chunks)
        # policy-gradient clip: DxMI_Trainer clips to 0.1 (trainer.py:388);
        # the Cond/mixed-precision path does not clip
        self.sampler_grad_clip: Optional[float] = 0.1
        self.nan_guard: bool = False
        self.sampler_optimizer: str = "adam"

        self.sampler = None
        self.value = None
        self.energy = None
        self.guidance_scale: Optional[float] = None

    # ------------------------------------------------------------------
    # setup
    # ------------------------------------------------------------------

    def set_models(self, sampler, value, lr: float, v_lr: float,
                   beta_lr: Optional[float] = None, energy=None,
                   f_lr: Optional[float] = None,
                   donate: bool = False) -> None:
        """Bind the (static) sampler/value modules and build optimizers.

        ``log_betas`` gets its own learning rate, replacing the reference's
        param-group surgery (train_cifar10.py:283-294). ``energy`` enables
        the optional separate energy net ``f`` (trainer.py:240-268,
        294-300, 371-380).

        ``donate=True`` donates the state pytree to each jitted update
        (XLA reuses the params/optimizer-state buffers in place — halves
        peak HBM for the 300-500M EDM models on a single chip). The
        caller must then treat the passed-in state as consumed; the
        entries' ``state = trainer.update(...)`` rebinding pattern does.
        """
        self.sampler = sampler
        self.value = value
        self.energy = energy
        if energy is not None:
            self.opt_f = optax.adam(f_lr if f_lr is not None else v_lr)

        if beta_lr is None:
            beta_lr = lr
        chain = []
        if self.sampler_grad_clip is not None:
            # reference trainer.py:388 clips the policy grads to 0.1
            chain.append(optax.clip_by_global_norm(self.sampler_grad_clip))
        chain.append(optax.multi_transform(
            {"net": self._make_sampler_opt(lr),
             "log_betas": self._make_sampler_opt(beta_lr)},
            param_labels=lambda params: {
                k: ("log_betas" if k == "log_betas"
                    else jax.tree.map(lambda _: "net", v))
                for k, v in params.items()
            },
        ))
        self.opt_sampler = optax.chain(*chain)
        if self.nan_guard:
            # bf16-safe replacement for the reference's dynamic-loss-scale
            # NaN skip (cm/fp16_util.py:204-223): drop non-finite updates
            self.opt_sampler = optax.apply_if_finite(self.opt_sampler, 100)
        self.opt_v = optax.adam(v_lr)

        # donate=False (default): callers may reuse a state pytree after an
        # update (tests do); the copy is cheap for CIFAR-scale models.
        dn = (0,) if donate else ()
        self._jit_update_f_v = jax.jit(self._update_f_v_impl,
                                       donate_argnums=dn)
        self._jit_update_sampler = jax.jit(
            self._update_sampler_impl, static_argnames=("n_generator",),
            donate_argnums=dn)
        self._jit_train_step = jax.jit(
            self._train_step_impl, static_argnames=("n_generator",),
            donate_argnums=dn)

    def _make_sampler_opt(self, lr: float):
        if self.sampler_optimizer == "adam":
            return optax.adam(lr)
        if self.sampler_optimizer == "radam":
            # the large-image entry uses RAdam (train_image_large.py:162-168)
            return optax.radam(lr)
        raise ValueError(self.sampler_optimizer)

    def init_betas_for_q(self, sampler_params=None) -> jnp.ndarray:
        if self.use_sampler_beta:
            if hasattr(self.sampler, "user_defined_eta"):
                return jnp.asarray(self.sampler.user_defined_eta, dtype=jnp.float32)
            if sampler_params is not None and "log_betas" in sampler_params:
                # reference fallback: exp of the sampler's CURRENT
                # log_betas at set_models time (trainer.py:151-153) —
                # matters when the sampler was loaded from a checkpoint
                # whose log_betas were trained away from the init schedule
                return jnp.exp(jnp.asarray(sampler_params["log_betas"],
                                           jnp.float32))
            raise ValueError("use_sampler_beta requires a sampler schedule "
                             "or params with log_betas")
        return jnp.asarray(make_beta_schedule(
            schedule=self.q_beta_schedule, n_timesteps=self.n_timesteps,
            start=self.q_beta_start, end=self.q_beta_end))

    def init_state(self, sampler_params, v_params, f_params=None,
                   v_stats=None, f_stats=None) -> DxMIState:
        """``v_stats``/``f_stats``: pass the 'sn_stats' collection from
        ``Module.init`` when the value/energy net uses spectral norm."""
        return DxMIState(
            sampler_params=sampler_params,
            v_params=v_params,
            opt_state_sampler=self.opt_sampler.init(sampler_params),
            opt_state_v=self.opt_v.init(v_params),
            betas_for_q=self.init_betas_for_q(sampler_params),
            f_params=f_params,
            opt_state_f=(self.opt_f.init(f_params)
                         if f_params is not None else None),
            v_stats=v_stats,
            f_stats=f_stats,
        )

    def _f_apply(self, f_params, x, stats=None, update=False):
        """Energy forward. With ``stats`` (an 'sn_stats' collection) the
        spectral-norm power iteration runs; ``update=True`` additionally
        returns the iterated collection (torch's spectral_norm updates u
        on every train-mode forward; here stats advance once per jitted
        training phase — documented deviation, same fixed point)."""
        if stats is None:
            return self.energy.apply({"params": f_params}, x).squeeze(-1)
        variables = {"params": f_params, "sn_stats": stats}
        if update:
            out, mut = self.energy.apply(
                variables, x, update_sn_stats=True, mutable=["sn_stats"])
            return out.squeeze(-1), mut["sn_stats"]
        return self.energy.apply(variables, x).squeeze(-1)

    # ------------------------------------------------------------------
    # shared pieces
    # ------------------------------------------------------------------

    def _v_apply(self, v_params, x, t, y=None, stats=None, update=False):
        # pass y only when present so bare time-dependent nets (e.g.
        # UNetSmallEncoder) work as values without a wrapper
        args = (x, t) if y is None else (x, t, y)
        if stats is None:
            return self.value.apply({"params": v_params}, *args).squeeze(-1)
        variables = {"params": v_params, "sn_stats": stats}
        if update:
            out, mut = self.value.apply(
                variables, *args, update_sn_stats=True, mutable=["sn_stats"])
            return out.squeeze(-1), mut["sn_stats"]
        return self.value.apply(variables, *args).squeeze(-1)

    def _running_cost(self, betas_for_q, state, next_state, t):
        """(Δx)^2 / (2 beta_q), mean over pixels (trainer.py:163-169).
        ``beta_ordering='reversed'`` indexes the q-process from the data
        side (t=0 is data); 'forward' uses t directly (trainer.py:527-534)."""
        if self.beta_ordering == "reversed":
            t = self.n_timesteps - t - 1
        beta = jnp.take(betas_for_q, t)
        return mean_flat((next_state - state) ** 2) / (2.0 * beta)

    def _entropy_of(self, sigma):
        """log sigma, optionally rescaled (trainer.py:625-628)."""
        if self.sigma_scale is not None:
            return jnp.log(sigma / self.sigma_scale)
        return jnp.log(sigma)

    def _time_cost_terms(self, t):
        """Extra per-step costs added to the TD target
        (trainer.py:302-308, 638-647)."""
        add = 0.0
        if self.time_cost_sig is not None:
            center = (self.n_timesteps // 2 if self.time_cost_sig_center is None
                      else self.time_cost_sig_center)
            tf = t.astype(jnp.float32)
            add = add + self.time_cost_sig * (
                jax.nn.sigmoid(-tf + center) - jax.nn.sigmoid(-tf - 1 + center))
        if self.time_cost is not None:
            add = add + self.time_cost
        return add

    # ------------------------------------------------------------------
    # fused train step (TPU-native fast path)
    # ------------------------------------------------------------------

    def train_step(self, state: DxMIState, img: jnp.ndarray, key: jax.Array,
                   n_generator: int = 1, y: Optional[jnp.ndarray] = None
                   ) -> Tuple[DxMIState, Dict[str, jnp.ndarray]]:
        """ONE jitted dispatch for a full DxMI iteration (the n_critic=1
        path of the reference loop, train_cifar10.py:179-205): sample the
        trajectory, build the buffer, run the value/energy update and the
        policy update — no intermediate host round-trips. Phase-separated
        ``update_f_v``/``update_sampler`` remain for n_critic>1."""
        return self._jit_train_step(state, img, key, y,
                                    n_generator=int(n_generator))

    def _train_step_impl(self, state: DxMIState, img, key, y=None, *,
                         n_generator: int):
        from dxmi_tpu.trainers import buffer as buflib

        from dxmi_tpu.samplers import sample_chunked

        k1, k2, k3 = jax.random.split(key, 3)
        if y is None:
            d = sample_chunked(self.sampler, state.sampler_params, k1,
                               self.batchsize, self.sample_chunks)
        else:
            d = sample_chunked(self.sampler, state.sampler_params, k1,
                               self.batchsize, self.sample_chunks, y=y)
        traj = buflib.from_d_sample(d)
        state, m1 = self._update_f_v_impl(state, img, traj, k2, y)
        state, m2 = self._update_sampler_impl(state, traj.flat(), k3,
                                              n_generator=n_generator)
        return state, {**m1, **m2}

    # ------------------------------------------------------------------
    # value / energy update
    # ------------------------------------------------------------------

    def update_f_v(self, state: DxMIState, img: jnp.ndarray,
                   buffer: TrajectoryBuffer, key: jax.Array,
                   y: Optional[jnp.ndarray] = None
                   ) -> Tuple[DxMIState, Dict[str, jnp.ndarray]]:
        return self._jit_update_f_v(state, img, buffer, key, y)

    def _update_f_v_impl(self, state: DxMIState, img, buffer: TrajectoryBuffer,
                         key, y=None):
        T = self.n_timesteps
        last = buffer.last()  # TD consumes the newest trajectory only
        # drop the K=1 axis -> (T, B, ...)
        traj = jax.tree.map(lambda a: a[0], last)

        # ---- adaptive velocity regularization (trainer.py:218-228) ----
        betas_for_q = state.betas_for_q
        if self.adavelreg is not None:
            # per-step mean of (Δx)^2 over (B, H, W, C); flipped so index 0
            # is the data side under reversed ordering (trainer.py:222-228,
            # 536-551)
            diff = ((traj.next_state - traj.state) ** 2).reshape(T, -1).mean(axis=1)
            if self.beta_ordering == "reversed":
                diff = jnp.flip(diff, axis=0)
            betas_for_q = betas_for_q * self.adavelreg + (1 - self.adavelreg) * diff
            betas_for_q = jax.lax.stop_gradient(betas_for_q)

        # ---- energy (terminal contrastive) step (trainer.py:242-264) ----
        x0 = traj.next_state[-1]
        inputs = jnp.concatenate([img, x0], axis=0)
        t_term = jnp.full((inputs.shape[0],), T, dtype=jnp.int32)
        ys = jnp.concatenate([y, y], axis=0) if y is not None else None
        if self.aug is not None:
            key, akey = jax.random.split(key)
            inputs = self.aug(inputs, akey)

        v_stats, f_stats = state.v_stats, state.f_stats

        def energy_loss(p):
            new_stats = None
            if self.energy is None:
                if v_stats is None:
                    out = self._v_apply(p, inputs, t_term, ys)
                else:
                    out, new_stats = self._v_apply(
                        p, inputs, t_term, ys, stats=v_stats, update=True)
            else:
                if f_stats is None:
                    out = self._f_apply(p, inputs)
                else:
                    out, new_stats = self._f_apply(
                        p, inputs, stats=f_stats, update=True)
            pos = out[: img.shape[0]]
            neg = out[img.shape[0]:]
            loss = pos.mean() - neg.mean()
            reg = jnp.asarray(0.0)
            if self.gamma is not None:
                reg = (pos ** 2).mean() + (neg ** 2).mean()
                loss = loss + self.gamma * reg
            return loss, (pos.mean(), neg.mean(), reg, new_stats)

        if self.energy is None:
            (d_loss, (pos_e, neg_e, reg, new_stats)), g = jax.value_and_grad(
                energy_loss, has_aux=True)(state.v_params)
            if new_stats is not None:
                v_stats = new_stats
            updates, opt_state_v = self.opt_v.update(
                g, state.opt_state_v, state.v_params)
            v_params = optax.apply_updates(state.v_params, updates)
            f_params, opt_state_f = state.f_params, state.opt_state_f
        else:
            # contrastive step trains f via optimizer_fstar
            # (trainer.py:240-268); v is untouched here
            (d_loss, (pos_e, neg_e, reg, new_stats)), g = jax.value_and_grad(
                energy_loss, has_aux=True)(state.f_params)
            if new_stats is not None:
                f_stats = new_stats
            updates, opt_state_f = self.opt_f.update(
                g, state.opt_state_f, state.f_params)
            f_params = optax.apply_updates(state.f_params, updates)
            v_params, opt_state_v = state.v_params, state.opt_state_v

        # ---- TD sweep: one optimizer step per timestep, backward ----
        # flip so scan index 0 is timestep T-1 (trainer.py:276-327)
        t_vals = jnp.arange(T, dtype=jnp.int32)
        B = traj.state.shape[1]
        base_xs = {
            "state": traj.state,
            "next_state": traj.next_state,
            "sigma": traj.sigma,
            # per-ROW timesteps: constant per sweep step for
            # backward/random order, mixed for shuffle
            "tvec": jnp.broadcast_to(t_vals[:, None], (T, B)),
        }
        if traj.y is not None:
            # trajectory labels ride the sweep so value_resample can
            # condition the re-run policy step (the reference omits y at
            # trainer.py:612 and would assert inside a class-conditional
            # UNet — an unreachable-in-its-configs bug we fix)
            base_xs["traj_y"] = traj.y
        key, k_steps, k_order = jax.random.split(key, 3)

        def sweep_xs(rep: int):
            # fresh per-step keys AND (random mode) a fresh order per
            # repeat — the reference consumes fresh torch RNG and redraws
            # update_order inside its repeat loop (trainer.py:594-600).
            # The shuffle permutation is drawn ONCE per update and shared
            # across repeats (trainer.py:589-591).
            xs = dict(base_xs)
            if self.value_update_order == "shuffle":
                # reference shuffle: minibatches of a global randperm over
                # the newest T*B rows — each sweep step sees B rows of
                # MIXED timesteps (trainer.py:602-608)
                perm = jax.random.permutation(k_order, T * B)

                def shuf(a):
                    flat = a.reshape((T * B,) + a.shape[2:])
                    return jnp.take(flat, perm, axis=0).reshape(a.shape)

                xs = jax.tree.map(shuf, xs)
                # the reference still labels metrics with the backward
                # update_t even though rows are mixed (trainer.py:598-600)
                label = jnp.arange(T - 1, -1, -1)
            elif self.value_update_order == "backward":
                order = jnp.arange(T - 1, -1, -1)
                xs = jax.tree.map(lambda a: jnp.take(a, order, axis=0), xs)
                label = order
            elif self.value_update_order == "random":
                order = jax.random.permutation(
                    jax.random.fold_in(k_order, rep), T)
                xs = jax.tree.map(lambda a: jnp.take(a, order, axis=0), xs)
                label = order
            else:
                raise ValueError(self.value_update_order)
            xs["key"] = jax.random.split(jax.random.fold_in(k_steps, rep), T)
            xs["label"] = label
            return xs

        def td_step(carry, x):
            v_params, opt_state_v, v_stats = carry
            tvec = x["tvec"]
            ks, kd, ka1, ka2 = jax.random.split(x["key"], 4)
            if self.value_resample:
                # resample with dropout active: the reference leaves the
                # sampler in train mode through the TD sweep
                # (trainer.py:352 sampler.train(); never eval'd before
                # update_f_v), so its resampled next_state sees dropout
                d_step = self.sampler.sample_step(
                    state.sampler_params, x["state"], tvec, ks,
                    y=x.get("traj_y"), train=True, dropout_rng=kd)
                next_state = jax.lax.stop_gradient(d_step["sample"])
                sigma = jax.lax.stop_gradient(d_step["sigma"])
            else:
                next_state = x["next_state"]
                sigma = x["sigma"]
            cost = self._running_cost(betas_for_q, x["state"], next_state, tvec)
            entropy = self._entropy_of(sigma)
            # Cond trainer augments BOTH v inputs inside the TD loop
            # (trainer.py:630-633), after the running cost is computed
            v_state_in, v_next_in = x["state"], next_state
            if self.aug is not None:
                v_state_in = self.aug(v_state_in, ka1)
                v_next_in = self.aug(v_next_in, ka2)

            # NOTE: conditioning on the DATA batch's labels, replicating
            # the reference (trainer.py:635,661 passes the img batch's y
            # for sampled states; harmless for class-free value nets)
            v_next = self._v_apply(v_params, v_next_in, tvec + 1, y,
                                   stats=v_stats)
            if self.energy is not None:
                # terminal target uses the separate energy, applied at the
                # TERMINAL timestep t==T-1 (f sees final images). This is
                # the stated intent of the reference ("use energy for the
                # last step") — its own condition `i == n_steps-1` lands on
                # update_t==0, the NOISIEST rows (trainer.py:277,294), a
                # documented reference bug we fix rather than replicate.
                # Its "+ tau2*cost" at :297 is dead code (overwritten at
                # :300) — that quirk IS replicated.
                f_next = self._f_apply(f_params, v_next_in, stats=f_stats)
                term = (tvec == T - 1).astype(jnp.float32)
                v_next = v_next * (1 - term) + f_next * term
            target = v_next + self._time_cost_terms(tvec)
            if self.velocity_in_value is not None:
                nt = (tvec < T - self.velocity_in_value).astype(jnp.float32)
                target = target + cost * self.tau2 * nt
            if self.entropy_in_value is not None:
                nt = (tvec < T - int(self.entropy_in_value)).astype(jnp.float32)
                target = target - entropy * self.tau1 * nt * self.entropy_value_scale
            target = jax.lax.stop_gradient(target)

            def v_loss_fn(p):
                if v_stats is None:
                    v = self._v_apply(p, v_state_in, tvec, y)
                    return ((v - target) ** 2).mean(), (v.mean(), None)
                v, new_stats = self._v_apply(p, v_state_in, tvec, y,
                                             stats=v_stats, update=True)
                return ((v - target) ** 2).mean(), (v.mean(), new_stats)

            (v_loss, (v_mean, new_stats)), g = jax.value_and_grad(
                v_loss_fn, has_aux=True)(v_params)
            if new_stats is not None:
                v_stats = new_stats
            if self.value_grad_clip:
                gnorm = optax.global_norm(g)
                scale = jnp.minimum(1.0, 0.1 / (gnorm + 1e-12))
                g = jax.tree.map(lambda a: a * scale, g)
            updates, opt_state_v = self.opt_v.update(g, opt_state_v, v_params)
            v_params = optax.apply_updates(v_params, updates)
            return (v_params, opt_state_v, v_stats), {
                "v_loss": v_loss, "running_cost": cost.mean(),
                "value": v_mean, "t": x["label"]}

        carry = (v_params, opt_state_v, v_stats)
        for rep in range(self.repeat_value_update):
            carry, td_out = jax.lax.scan(td_step, carry, sweep_xs(rep))
        v_params, opt_state_v, v_stats = carry

        metrics = {
            "ebm/d_loss_": d_loss,
            "ebm/v_loss_": td_out["v_loss"][-1],
            "ebm/pos_e_": pos_e,
            "ebm/neg_e_": neg_e,
            "ebm/running_cost_": td_out["running_cost"][-1],
            "ebm/reg_": reg,
            # per-step vectors, in update order; host logging expands these
            "per_step/t": td_out["t"],
            "per_step/running_cost": td_out["running_cost"],
            "per_step/value": td_out["value"],
            # not logged (the reference logs only the last v_loss);
            # consumed by order-invariance tests
            "per_step/v_loss": td_out["v_loss"],
        }
        if self.adavelreg is not None:
            metrics["per_step/betas_for_q"] = betas_for_q

        new_state = DxMIState(
            sampler_params=state.sampler_params,
            v_params=v_params,
            opt_state_sampler=state.opt_state_sampler,
            opt_state_v=opt_state_v,
            betas_for_q=betas_for_q,
            f_params=f_params,
            opt_state_f=opt_state_f,
            v_stats=v_stats,
            f_stats=f_stats,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    # sampler (policy) update
    # ------------------------------------------------------------------

    def update_sampler(self, state: DxMIState, buffer: TrajectoryBuffer,
                       key: jax.Array, n_generator: Optional[int] = 1
                       ) -> Tuple[DxMIState, Dict[str, jnp.ndarray]]:
        """``n_generator=None`` sweeps every buffered minibatch (the
        Cond/mixed-precision path, trainer.py:700); an int caps the number
        of minibatches (trainer.py:355)."""
        flat = buffer.flat()
        N = int(flat["state"].shape[0])
        G = N // self.batchsize if n_generator is None else int(n_generator)
        return self._jit_update_sampler(state, flat, key, n_generator=G)

    def _update_sampler_impl(self, state: DxMIState, flat, key, *, n_generator: int):
        T = self.n_timesteps
        B = self.batchsize
        N = flat["state"].shape[0]
        G = min(n_generator, max(N // B, 1))
        has_y = "y" in flat

        key, pkey = jax.random.split(key)
        perm = jax.random.permutation(pkey, N)

        def g_step(carry, inputs):
            sampler_params, opt_state = carry
            i, k = inputs
            idx = jax.lax.dynamic_slice_in_dim(perm, i * B, B)
            s = jnp.take(flat["state"], idx, axis=0)
            t = jnp.take(flat["timestep"], idx, axis=0)
            yb = jnp.take(flat["y"], idx, axis=0) if has_y else None
            k_step, k_drop = jax.random.split(k)

            def loss_fn(p):
                d = self.sampler.sample_step(p, s, t, k_step, y=yb, train=True,
                                             dropout_rng=k_drop)
                cost = self._running_cost(state.betas_for_q, s, d["sample"], t)
                causal_entropy = jnp.log(d["sigma"])
                next_state = d["sample"]
                if self.aug is not None:
                    next_state = self.aug(next_state, k_drop)
                v_term = self._v_apply(state.v_params, next_state, t + 1, yb,
                                       stats=state.v_stats)
                if self.energy is not None:
                    f_term_v = self._f_apply(state.f_params, next_state,
                                             stats=state.f_stats)
                    term = (t == T - 1).astype(jnp.float32)
                    v_term = v_term * (1 - term) + f_term_v * term
                nt = (t < T - self.skip_sampler_tau).astype(jnp.float32)
                loss = (v_term + (cost * self.tau2
                                  - causal_entropy * self.tau1) * nt).mean()
                return loss, (v_term.mean(), cost.mean(), causal_entropy.mean())

            (loss, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(sampler_params)
            updates, opt_state = self.opt_sampler.update(g, opt_state, sampler_params)
            sampler_params = optax.apply_updates(sampler_params, updates)
            return (sampler_params, opt_state), (loss, *aux)

        keys = jax.random.split(key, G)
        (sampler_params, opt_state), outs = jax.lax.scan(
            g_step, (state.sampler_params, state.opt_state_sampler),
            (jnp.arange(G), keys))
        loss, v_term, cost, causal_entropy = (o[-1] for o in outs)

        metrics = {
            "sampler/sampler_loss_": loss,
            "sampler/sampler_value_loss_": v_term,
            "sampler/running_cost_": cost,
            "sampler/causal_entropy_": causal_entropy,
            "per_step/sigma": jnp.exp(sampler_params["log_betas"]),
        }
        new_state = DxMIState(
            sampler_params=sampler_params,
            v_params=state.v_params,
            opt_state_sampler=opt_state,
            opt_state_v=state.opt_state_v,
            betas_for_q=state.betas_for_q,
            f_params=state.f_params,
            opt_state_f=state.opt_state_f,
            v_stats=state.v_stats,
            f_stats=state.f_stats,
        )
        return new_state, metrics

    # ------------------------------------------------------------------
    # value-guided sampling (trainer.py:171-216)
    # ------------------------------------------------------------------

    def sample_guidance(self, state: DxMIState, key: jax.Array, n_sample: int,
                        guidance_scale: Optional[float] = None,
                        x0: Optional[jnp.ndarray] = None,
                        t_select: Optional[Tuple[int, ...]] = None,
                        y: Optional[jnp.ndarray] = None) -> Dict[str, Any]:
        """Sample with value-gradient guidance: after each policy step, move
        along grad_x V(x, t+1) scaled by guidance_scale * sigma. The prior
        is scaled by the policy's sigma_max when it has one (1.0 for the
        DDPM/VAR policies); ``y`` threads class labels into each
        ``sample_step`` (the Cond subclass draws them when None)."""
        if guidance_scale is None:
            guidance_scale = self.guidance_scale
        T = self.n_timesteps

        if x0 is None:
            key, k0 = jax.random.split(key)
            x0 = jax.random.normal(
                k0, (n_sample, *self.sampler.sample_shape)) \
                * float(getattr(self.sampler, "sigma_max", 1.0))

        def v_sum(x, t):
            return self._v_apply(state.v_params, x, t,
                                 stats=state.v_stats).sum()

        grad_v = jax.grad(v_sum)

        def step(x, inputs):
            t, k = inputs
            tvec = jnp.full((x.shape[0],), t, dtype=jnp.int32)
            d = self.sampler.sample_step(state.sampler_params, x, tvec, k,
                                         y=y)
            next_x = jax.lax.stop_gradient(d["sample"])
            g = grad_v(next_x, tvec + 1)
            sigma = d["sigma"].reshape(-1, *([1] * (x.ndim - 1)))
            guidance = g * guidance_scale * sigma
            if t_select is not None:
                use = jnp.isin(t, jnp.asarray(t_select))
                next_x = jnp.where(use, next_x + guidance, next_x)
            else:
                next_x = next_x + guidance
            logp_orig = _normal_logp_mean(next_x, d["mean"], sigma)
            return next_x, {"x": next_x, "guidance": guidance,
                            "logp": d["logp"], "logp_on": logp_orig}

        keys = jax.random.split(key, T)
        x_final, traj = jax.lax.scan(step, x0, (jnp.arange(T), keys))
        return {
            "sample": x_final,
            "l_sample": jnp.concatenate([x0[None], traj["x"]], axis=0),
            "logp": traj["logp"],
            "logp_on": traj["logp_on"],
            "logp_traj": traj["logp"].sum(axis=0),
            "logp_on_traj": traj["logp_on"].sum(axis=0),
            "guidance": traj["guidance"],
            "y": y,
        }


def _normal_logp_mean(x, mean, sigma):
    import math

    z = (x - mean) / sigma
    logp = -0.5 * z * z - jnp.log(sigma) - 0.5 * math.log(2 * math.pi)
    return logp.reshape(x.shape[0], -1).mean(axis=1)
