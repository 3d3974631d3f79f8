"""BaseGANSystem — conditional-GAN training as one fused XLA program.

TPU-native rework of the reference trainer (models/base_gan.py:194-231).
The torch version mutates module attributes across three backward calls;
here one pure ``train_step(state, batch) -> (state, metrics)`` does, in a
single jitted program with donated state:

  1. one generator forward, captured with ``jax.vjp`` so its activations
     are reused for the generator backward (torch keeps the same graph),
  2. discriminator update on (stop-gradient fakes, targets) — including
     optional gradient penalty via grad-of-grad,
  3. generator update whose adversarial term uses the *updated*
     discriminator (matching the reference's optimize_parameters order:
     D.step() happens before backward_G).

Randomness (dropout masks, smooth labels, GP interpolation) is threaded
through explicit PRNG keys carried in the state.  Subclasses provide the
model-specific hooks: generator forward, D conditioning, and extra G
losses (CE / L1 / perceptual).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from swapnet_tpu.losses import GANLossConfig, gan_loss, gradient_penalty
from swapnet_tpu.training.optimizers import OptimizerConfig, define_optimizer
from swapnet_tpu.training.state import GANTrainState


class BaseGANSystem:
    """Holds static config (modules, loss weights); all methods are pure."""

    def __init__(
        self,
        generator,
        discriminator=None,
        gan_cfg: GANLossConfig = GANLossConfig(),
        g_opt: OptimizerConfig = OptimizerConfig(lr=1e-4),
        d_opt: OptimizerConfig = OptimizerConfig(lr=4e-4, weight_decay=0.01),
        lambda_gan: float = 1.0,
        lambda_discriminator: float = 1.0,
        lambda_gp: float = 10.0,
        wgan_clamp: bool = True,
    ):
        self.G = generator
        self.D = discriminator
        self.gan_cfg = gan_cfg
        self.g_tx = define_optimizer(g_opt)
        self.d_tx = define_optimizer(d_opt) if discriminator is not None else None
        self.lambda_gan = lambda_gan
        self.lambda_discriminator = lambda_discriminator
        self.lambda_gp = lambda_gp
        self.gan_mode = gan_cfg.gan_mode
        # plain "dragan" is penalty-defined too (losses/gan.py maps it to gp)
        self.has_gp = (
            any(m in self.gan_mode for m in ("gp", "lp")) or self.gan_mode == "dragan"
        )
        # NOTE the reference's wgan weight clamp is a silent no-op (it calls
        # non-inplace `.clamp`, models/base_gan.py:210-213), so reference
        # wgan training never constrains D.  We clamp for real by default;
        # pass wgan_clamp=False (--compat_no_wgan_clamp) to reproduce the
        # reference behavior for parity runs.
        self.wgan_clamp = wgan_clamp

    # ---- model-specific hooks -------------------------------------------

    def generator_forward(
        self, g_params, g_extra, batch, rng, train: bool
    ) -> Tuple[jax.Array, Any]:
        """Return (fakes, new_g_extra)."""
        raise NotImplementedError

    def d_condition(self, batch, img) -> jax.Array:
        """Concatenate the conditioning input with a real/fake image."""
        raise NotImplementedError

    def targets(self, batch) -> jax.Array:
        raise NotImplementedError

    def extra_g_losses(self, fakes, batch, rng, frozen=None) -> Dict[str, jax.Array]:
        """Weighted non-adversarial generator losses, keyed by metric name.
        ``frozen`` carries non-trained aux params (e.g. VGG weights)."""
        return {}

    def frozen_variables(self):
        """Frozen aux params to carry in the state (traced, not closure)."""
        return None

    # ---- shared machinery ------------------------------------------------

    def _apply_d(self, d_params, d_extra, x, train):
        variables = {"params": d_params, **(d_extra or {})}
        if d_extra:
            pred, new_extra = self.D.apply(
                variables, x, train, mutable=list(d_extra.keys())
            )
            return pred, new_extra
        return self.D.apply(variables, x, train), d_extra

    def init_state(self, rng: jax.Array, batch) -> GANTrainState:
        r_gp, r_gd, r_dp, r_state = jax.random.split(rng, 4)
        g_vars = self.init_generator({"params": r_gp, "dropout": r_gd}, batch)
        g_params = g_vars.pop("params")
        g_extra = dict(g_vars)
        g_opt_state = self.g_tx.init(g_params)

        d_params = d_opt_state = d_extra = None
        if self.D is not None:
            fakes = jnp.zeros_like(self.targets(batch))
            d_vars = self.D.init(
                {"params": r_dp}, self.d_condition(batch, fakes), True
            )
            d_vars = dict(d_vars)
            d_params = d_vars.pop("params")
            d_extra = d_vars
            d_opt_state = self.d_tx.init(d_params)

        # copy frozen aux buffers: states are donated into train_step, so
        # handing out the system instance's only copy would delete it the
        # first time ANY state from this system is stepped (then a second
        # init_state -> "Array has been deleted")
        frozen = self.frozen_variables()
        if frozen is not None:
            frozen = jax.tree.map(lambda x: jnp.array(x, copy=True), frozen)
        return GANTrainState.create(
            r_state, g_params, g_opt_state, g_extra, d_params, d_opt_state,
            d_extra, frozen=frozen,
        )

    def init_generator(self, rngs, batch):
        raise NotImplementedError

    def param_counts(self, state: GANTrainState) -> Dict[str, int]:
        import numpy as np

        counts = {
            "generator": sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.g_params))
        }
        if state.d_params is not None:
            counts["discriminator"] = sum(
                int(np.prod(p.shape)) for p in jax.tree.leaves(state.d_params)
            )
        return counts

    # ---- the fused train step -------------------------------------------

    def train_step(self, state: GANTrainState, batch):
        """Pure: (state, batch) -> (new_state, metrics). Jit with donate_argnums=0."""
        rng_next, r_drop, r_dfake, r_dreal, r_gp, r_glabel, r_extra = jax.random.split(
            state.rng, 7
        )
        metrics = {}

        # -- single generator forward, VJP captured for the G backward ----
        def g_forward(g_params):
            return self.generator_forward(g_params, state.g_extra, batch, r_drop, True)

        (fakes, new_g_extra), g_vjp = jax.vjp(g_forward, state.g_params, has_aux=False)
        # vjp over tuple output: we only pull back through fakes
        d_params, d_opt_state, d_extra = state.d_params, state.d_opt_state, state.d_extra

        if self.D is not None:
            # wgan clamps D weights to a cube before the update (see
            # __init__ note: the reference's version of this is a no-op bug)
            if self.gan_mode == "wgan" and self.wgan_clamp:
                d_params = jax.tree.map(lambda p: jnp.clip(p, -0.01, 0.01), d_params)

            targets = self.targets(batch)
            cond_fake = self.d_condition(batch, jax.lax.stop_gradient(fakes))
            cond_real = self.d_condition(batch, targets)

            def d_loss_fn(d_params_):
                pred_fake, extra1 = self._apply_d(d_params_, d_extra, cond_fake, True)
                loss_fake = gan_loss(pred_fake, False, self.gan_cfg, r_dfake)
                pred_real, extra2 = self._apply_d(d_params_, extra1, cond_real, True)
                loss_real = gan_loss(pred_real, True, self.gan_cfg, r_dreal)
                loss = 0.5 * (loss_fake + loss_real) * self.lambda_discriminator
                aux = {"loss_D_fake": loss_fake, "loss_D_real": loss_real}
                if self.has_gp:
                    d_fn = lambda x: self._apply_d(d_params_, extra2, x, True)[0]
                    gp = gradient_penalty(d_fn, cond_real, cond_fake, self.gan_mode, r_gp)
                    loss = loss + self.lambda_gp * gp
                    aux["loss_D_gp"] = gp
                aux["loss_D"] = loss
                return loss, (aux, extra2)

            d_grads, (d_aux, d_extra) = jax.grad(d_loss_fn, has_aux=True)(d_params)
            d_updates, d_opt_state = self.d_tx.update(d_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            metrics.update(d_aux)

        # -- generator update (uses the UPDATED discriminator) ------------
        def g_loss_from_fakes(fakes_):
            extra = self.extra_g_losses(fakes_, batch, r_extra, state.frozen)
            loss = sum(extra.values(), jnp.float32(0.0))
            aux = dict(extra)
            new_d_extra = d_extra
            if self.D is not None and self.lambda_gan:
                # keep this pass's batch-stats update too: torch train-mode
                # BN updates running stats on all three D forwards per step
                pred, new_d_extra = self._apply_d(
                    d_params, d_extra, self.d_condition(batch, fakes_), True
                )
                loss_gan = gan_loss(pred, True, self.gan_cfg, r_glabel) * self.lambda_gan
                loss = loss + loss_gan
                aux["loss_G_gan"] = loss_gan
            aux["loss_G"] = loss
            return loss, (aux, new_d_extra)

        (g_loss, (g_aux, d_extra)), fakes_grad = jax.value_and_grad(
            g_loss_from_fakes, has_aux=True
        )(fakes)
        (g_grads,) = g_vjp((fakes_grad, jax.tree.map(jnp.zeros_like, new_g_extra)))
        g_updates, g_opt_state = self.g_tx.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics.update(g_aux)

        new_state = state.replace(
            step=state.step + 1,
            rng=rng_next,
            g_params=g_params,
            g_opt_state=g_opt_state,
            g_extra=new_g_extra,
            d_params=d_params,
            d_opt_state=d_opt_state,
            d_extra=d_extra,
        )
        return new_state, {k: v.astype(jnp.float32) for k, v in metrics.items()}

    def train_step_accum(self, state: GANTrainState, batch):
        """Gradient-accumulated train step: ``batch`` leaves carry a
        leading (K, B_micro) micro-batch axis; K micro-batch gradients are
        averaged into ONE optimizer update per network (effective batch
        K*B_micro with one micro-batch of activations live — the lax.scan
        recomputes the generator forward per phase instead of holding K
        vjp residuals).  Update order matches train_step: D on all micro
        batches first, then G against the UPDATED discriminator.  For
        mean-reduced losses (all of ours) the averaged micro-gradients
        equal the full-batch gradient; per-micro-batch dropout/label draws
        are folded from the step rng.  TPU-native memory lever for 512px+
        texture training; no reference counterpart (single-GPU torch)."""
        K = jax.tree.leaves(batch)[0].shape[0]
        rng_next, r_base = jax.random.split(state.rng)
        metrics = {}

        d_params, d_opt_state, d_extra = (
            state.d_params, state.d_opt_state, state.d_extra,
        )
        g_extra = state.g_extra
        idx = jnp.arange(K)

        def mb_rngs(i):
            r = jax.random.fold_in(r_base, i)
            return jax.random.split(r, 5)  # drop, dfake, dreal, gp/label, extra

        if self.D is not None:
            if self.gan_mode == "wgan" and self.wgan_clamp:
                d_params = jax.tree.map(lambda p: jnp.clip(p, -0.01, 0.01), d_params)

            def d_phase(carry, xs):
                acc, d_extra_c = carry
                mb, i = xs
                r_drop, r_dfake, r_dreal, r_gp, _ = mb_rngs(i)
                fakes, _ = self.generator_forward(
                    state.g_params, g_extra, mb, r_drop, True
                )
                cond_fake = self.d_condition(mb, jax.lax.stop_gradient(fakes))
                cond_real = self.d_condition(mb, self.targets(mb))

                def d_loss_fn(dp):
                    pred_fake, e1 = self._apply_d(dp, d_extra_c, cond_fake, True)
                    loss_fake = gan_loss(pred_fake, False, self.gan_cfg, r_dfake)
                    pred_real, e2 = self._apply_d(dp, e1, cond_real, True)
                    loss_real = gan_loss(pred_real, True, self.gan_cfg, r_dreal)
                    loss = 0.5 * (loss_fake + loss_real) * self.lambda_discriminator
                    aux = {"loss_D_fake": loss_fake, "loss_D_real": loss_real}
                    if self.has_gp:
                        d_fn = lambda x: self._apply_d(dp, e2, x, True)[0]
                        gp = gradient_penalty(
                            d_fn, cond_real, cond_fake, self.gan_mode, r_gp
                        )
                        loss = loss + self.lambda_gp * gp
                        aux["loss_D_gp"] = gp
                    aux["loss_D"] = loss
                    return loss, (aux, e2)

                grads, (aux, d_extra_c) = jax.grad(d_loss_fn, has_aux=True)(d_params)
                return (jax.tree.map(jnp.add, acc, grads), d_extra_c), aux

            zero_d = jax.tree.map(jnp.zeros_like, d_params)
            (d_acc, d_extra), d_auxs = jax.lax.scan(
                d_phase, (zero_d, d_extra), (batch, idx)
            )
            d_grads = jax.tree.map(lambda g: g / K, d_acc)
            d_updates, d_opt_state = self.d_tx.update(d_grads, d_opt_state, d_params)
            d_params = optax.apply_updates(d_params, d_updates)
            metrics.update({k: jnp.mean(v) for k, v in d_auxs.items()})

        def g_phase(carry, xs):
            acc, g_extra_c, d_extra_c = carry
            mb, i = xs
            r_drop, _, _, r_glabel, r_extra = mb_rngs(i)

            def g_loss_fn(gp_):
                fakes, new_gx = self.generator_forward(gp_, g_extra_c, mb, r_drop, True)
                extra = self.extra_g_losses(fakes, mb, r_extra, state.frozen)
                loss = sum(extra.values(), jnp.float32(0.0))
                aux = dict(extra)
                new_dx = d_extra_c
                if self.D is not None and self.lambda_gan:
                    pred, new_dx = self._apply_d(
                        d_params, d_extra_c, self.d_condition(mb, fakes), True
                    )
                    loss_gan = gan_loss(pred, True, self.gan_cfg, r_glabel) * self.lambda_gan
                    loss = loss + loss_gan
                    aux["loss_G_gan"] = loss_gan
                aux["loss_G"] = loss
                return loss, (aux, new_gx, new_dx)

            grads, (aux, g_extra_c, d_extra_c) = jax.grad(
                g_loss_fn, has_aux=True
            )(state.g_params)
            return (jax.tree.map(jnp.add, acc, grads), g_extra_c, d_extra_c), aux

        zero_g = jax.tree.map(jnp.zeros_like, state.g_params)
        (g_acc, g_extra, d_extra), g_auxs = jax.lax.scan(
            g_phase, (zero_g, g_extra, d_extra), (batch, idx)
        )
        g_grads = jax.tree.map(lambda g: g / K, g_acc)
        g_updates, g_opt_state = self.g_tx.update(
            g_grads, state.g_opt_state, state.g_params
        )
        g_params = optax.apply_updates(state.g_params, g_updates)
        metrics.update({k: jnp.mean(v) for k, v in g_auxs.items()})

        new_state = state.replace(
            step=state.step + 1,
            rng=rng_next,
            g_params=g_params,
            g_opt_state=g_opt_state,
            g_extra=g_extra,
            d_params=d_params,
            d_opt_state=d_opt_state,
            d_extra=d_extra,
        )
        return new_state, {k: v.astype(jnp.float32) for k, v in metrics.items()}

    def eval_step(self, state: GANTrainState, batch) -> jax.Array:
        """Deterministic generator forward (reference BaseModel.test)."""
        fakes, _ = self.generator_forward(
            state.g_params, state.g_extra, batch, jax.random.key(0), False
        )
        return fakes
