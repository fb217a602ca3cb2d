"""WGAN fused train step with the n_critic cadence compiled in-graph.

Reference semantics being reproduced (wasserstein_gan/WGAN.py:279-326):
per real batch —
  1. critic RMSprop update on the real batch, labels -1
     (train_on_batch :298 — BN in train mode, kernels clipped to ±0.01 after
     the apply, exactly where Keras kernel_constraint runs);
  2. a fresh fake batch from the generator in *inference* mode
     (`generator_model.predict` :224 — G BatchNorm uses moving averages;
     faithful quirk);
  3. critic RMSprop update on the fake batch, labels +1 (:303);
  4. every `n_critic`-th batch (counter carried ACROSS epochs, :281,305-307):
     one combined-model update, labels -1, training the generator THROUGH the
     frozen critic — where "frozen" excludes the critic's BatchNorm
     scale/bias, which keep training (WGAN.py:140-142), and critic BN moving
     stats keep updating (training=True in train_on_batch).

Wasserstein loss: mean(y_true * y_pred) (WGAN.py:48-49); latent ~ N(0,1)
(WGAN.py:212-217 — Gaussian, unlike SNDCGAN's uniform).

TPU-native shape: everything above, including the every-5th-batch generator
update, is ONE jitted program. The gan update sits behind a `lax.cond` on the
in-state critic counter, so the hot 4/5 of steps skip its cost; both branches
are compiled once. The combined-model optimizer is a separate RMSprop whose
state spans (G params + critic BN params), matching Keras's per-model
optimizer slots.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.core.data import normalize_on_device
from imagegeneration_tpu.models import wgan as modellib
from imagegeneration_tpu.train import common


class WGANState(struct.PyTreeNode):
    step: jax.Array
    critic_count: jax.Array  # batches since last gan update (carried cross-epoch)
    g_params: Any
    g_batch_stats: Any
    c_params: Any
    c_batch_stats: Any
    c_opt: Any
    gan_opt: Any  # RMSprop over (g_params, critic BN params)


@dataclasses.dataclass(frozen=True)
class WGANTrainConfig:
    model: modellib.WGANConfig = modellib.WGANConfig()
    batch_size: int = 32
    n_critic: int = 5  # wasserstein_gan/Trainer.py:49
    learning_rate: float = 5e-5  # WGAN.py:99,150
    # Optional gradient penalty (WGAN-GP, arXiv:1704.00028) replacing the
    # reference's +-0.01 weight clipping (which stays the faithful default).
    # When > 0: the real-batch critic update adds gp_lambda * E[(||grad_x
    # D(x_hat)|| - 1)^2] on interpolates and kernels are NOT clipped. The
    # double-backward fuses into the same jitted step.
    gp_lambda: float = 0.0
    seed: int = rnglib.DEFAULT_MODEL_SEED


def build(cfg: WGANTrainConfig):
    gen, critic = modellib.make_models(cfg.model)
    c_tx = common.rmsprop(cfg.learning_rate)
    gan_tx = common.rmsprop(cfg.learning_rate)
    return gen, critic, c_tx, gan_tx


def init_state(cfg: WGANTrainConfig) -> WGANState:
    gen, critic, c_tx, gan_tx = build(cfg)
    chain = rnglib.KeyChain(cfg.seed)
    k_g, k_c = jax.random.split(chain.stream("params"))
    h, w, c = cfg.model.image_size

    g_vars = gen.init({"params": k_g}, jnp.zeros((1, cfg.model.z_size)), train=False)
    c_vars = critic.init({"params": k_c}, jnp.zeros((1, h, w, c)), train=False)

    g_params, g_bs = g_vars["params"], g_vars.get("batch_stats", {})
    c_params, c_bs = c_vars["params"], c_vars.get("batch_stats", {})
    return WGANState(
        step=jnp.zeros((), jnp.int32),
        critic_count=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_batch_stats=g_bs,
        c_params=c_params,
        c_batch_stats=c_bs,
        c_opt=c_tx.init(c_params),
        gan_opt=gan_tx.init((g_params, c_params)),
    )


def make_train_step(cfg: WGANTrainConfig, mesh=None):
    gen, critic, c_tx, gan_tx = build(cfg)
    replicate = common.make_replicator(mesh)
    chain = rnglib.KeyChain(cfg.seed)
    z_stream = chain.stream("z")
    use_gp = cfg.gp_lambda > 0.0

    def gradient_penalty(c_params, c_bs, x_real, x_fake, key):
        """WGAN-GP penalty on interpolates (eval-mode critic, as standard)."""
        eps = jax.random.uniform(key, (x_real.shape[0], 1, 1, 1))
        x_hat = eps * x_real + (1.0 - eps) * jax.lax.stop_gradient(x_fake)

        def score_sum(xh):
            s = critic.apply(
                {"params": c_params, "batch_stats": c_bs}, xh, train=False
            )
            return jnp.sum(s)

        g = jax.grad(score_sum)(x_hat).astype(jnp.float32)
        norms = jnp.sqrt(jnp.sum(g * g, axis=(1, 2, 3)) + 1e-12)
        return jnp.mean((norms - 1.0) ** 2)

    def critic_update(c_params, c_bs, c_opt, x, label, gp_args=None):
        """One critic RMSprop step on (x, label); kernel clip (reference)
        or gradient penalty (gp_lambda > 0)."""

        def loss_fn(params):
            scores, mut = critic.apply(
                {"params": params, "batch_stats": c_bs},
                x, train=True, mutable=["batch_stats"],
            )
            loss = common.wasserstein_loss(jnp.full_like(scores, label), scores)
            if gp_args is not None:
                x_fake, key = gp_args
                loss = loss + cfg.gp_lambda * gradient_penalty(
                    params, c_bs, x, x_fake, key
                )
            return loss, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(c_params)
        # GSPMD workaround: without this, sharding propagation through the
        # grad->RMSprop->clip->second-forward chain resolves the batch-mean
        # reduction as a SUM over the data axis — grads (and hence the nu
        # accumulators) come out data_axis_size x too large.  Measured: exact
        # 16x nu inflation on a 4x2 data x spatial mesh in f64 while the
        # isolated value_and_grad of the same loss is bit-exact (see
        # tests/test_parallel.py f64 trajectory tests).  Same bug family as
        # the replicate(new_params) workaround in sndcgan_step.py.
        grads = replicate(grads)
        new_bs = common.tree_cast_like(new_bs, c_bs)  # stats keep stored dtype
        updates, new_opt = c_tx.update(grads, c_opt, c_params)
        new_params = optax.apply_updates(c_params, updates)
        if not use_gp:
            new_params = modellib.clip_critic_kernels(new_params)
        new_params = replicate(new_params)
        return new_params, new_bs, new_opt, loss

    def train_step(
        state: WGANState,
        batch_u8: jax.Array,
        z_fake: jax.Array | None = None,
        z_gan: jax.Array | None = None,
    ):
        """Explicit z_fake/z_gan replay the reference's latent draws exactly
        (cross-framework parity tests); None (training) draws from the
        step-folded stream."""
        x_real = normalize_on_device(batch_u8, cfg.model.dtype)
        k_fake, k_gan, k_gp = jax.random.split(
            jax.random.fold_in(z_stream, state.step), 3
        )
        bsz = batch_u8.shape[0]

        # fake batch from G in inference mode (predict quirk, WGAN.py:224);
        # depends only on pre-step G state, so computing it up front is
        # order-equivalent to the reference's sequence
        if z_fake is None:
            z_fake = rnglib.normal_z(k_fake, bsz, cfg.model.z_size)
        x_fake = gen.apply(
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
            z_fake, train=False,
        )
        x_fake = jax.lax.stop_gradient(x_fake)

        # 1. critic on real, labels -1 (WGAN.py:298); +GP when enabled
        c_params, c_bs, c_opt, c_loss1 = critic_update(
            state.c_params, state.c_batch_stats, state.c_opt, x_real, -1.0,
            gp_args=(x_fake, k_gp) if use_gp else None,
        )

        # 2. critic on fake, labels +1 (WGAN.py:303)
        c_params, c_bs, c_opt, c_loss2 = critic_update(
            c_params, c_bs, c_opt, x_fake, +1.0
        )

        critic_count = state.critic_count + 1
        do_gan = critic_count >= cfg.n_critic

        # 4. combined-model update every n_critic batches (WGAN.py:306-318)
        def gan_branch(operand):
            g_params, g_bs, cp, cbs, gan_opt = operand
            z_g = (
                rnglib.normal_z(k_gan, bsz, cfg.model.z_size)
                if z_gan is None else z_gan
            )

            def loss_fn(both):
                gp, cp_inner = both
                fake, g_mut = gen.apply(
                    {"params": gp, "batch_stats": g_bs},
                    z_g, train=True, mutable=["batch_stats"],
                )
                scores, c_mut = critic.apply(
                    {"params": cp_inner, "batch_stats": cbs},
                    fake, train=True, mutable=["batch_stats"],
                )
                loss = common.wasserstein_loss(
                    jnp.full_like(scores, -1.0), scores
                )
                return loss, (g_mut["batch_stats"], c_mut["batch_stats"])

            (g_loss, (new_g_bs, new_c_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )((g_params, cp))
            grads = replicate(grads)  # same GSPMD workaround as critic_update
            # stats keep their stored dtype (lax.cond branch-type equality
            # under f64 compute — see common.tree_cast_like)
            new_g_bs = common.tree_cast_like(new_g_bs, g_bs)
            new_c_bs = common.tree_cast_like(new_c_bs, cbs)
            g_grads, c_grads = grads
            # Freeze everything in the critic except BatchNorm scale/bias
            # (WGAN.py:140-142).
            bn_mask = modellib.critic_bn_mask(cp)
            c_grads = jax.tree.map(
                lambda g, m: jnp.where(m, g, jnp.zeros_like(g)), c_grads, bn_mask
            )
            updates, new_gan_opt = gan_tx.update(
                (g_grads, c_grads), gan_opt, (g_params, cp)
            )
            new_g_params, new_cp = replicate(
                optax.apply_updates((g_params, cp), updates)
            )
            return (
                new_g_params, new_g_bs, new_cp, new_c_bs, new_gan_opt,
                # f32 to match skip_branch's zeros under any compute dtype
                # (lax.cond requires identical branch signatures; the loss
                # is f64 when cfg.model.dtype is f64 — mesh-equivalence test)
                g_loss.astype(jnp.float32),
            )

        def skip_branch(operand):
            g_params, g_bs, cp, cbs, gan_opt = operand
            return (g_params, g_bs, cp, cbs, gan_opt, jnp.zeros((), jnp.float32))

        g_params, g_bs, c_params, c_bs, gan_opt, g_loss = jax.lax.cond(
            do_gan,
            gan_branch,
            skip_branch,
            (state.g_params, state.g_batch_stats, c_params, c_bs, state.gan_opt),
        )
        critic_count = jnp.where(do_gan, 0, critic_count)

        metrics = {
            "c_loss_real": c_loss1,
            "c_loss_fake": c_loss2,
            "g_loss": g_loss,
            "did_gan_update": do_gan.astype(jnp.float32),
        }
        new_state = state.replace(
            step=state.step + 1,
            critic_count=critic_count,
            g_params=g_params,
            g_batch_stats=g_bs,
            c_params=c_params,
            c_batch_stats=c_bs,
            c_opt=c_opt,
            gan_opt=gan_opt,
        )
        return new_state, metrics

    return train_step


def make_sampler(cfg: WGANTrainConfig):
    """(state, z) -> images in [0,1] (predict + (x+1)/2, WGAN.py:232-234)."""
    gen, _, _, _ = build(cfg)

    def sample(state: WGANState, z: jax.Array) -> jax.Array:
        imgs = gen.apply(
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
            z, train=False,
        )
        return (imgs.astype(jnp.float32) + 1.0) / 2.0

    return sample


def make_epoch_runner(cfg: WGANTrainConfig, mesh=None, spatial: bool = False):
    """Device-resident epoch scan (see sndcgan_step.make_epoch_runner).
    Under a mesh: replicated HBM dataset, per-iteration batch resharding."""
    step_fn = make_train_step(cfg, mesh=mesh)
    if mesh is not None:
        from imagegeneration_tpu.core import mesh as meshlib

        batch_sh = meshlib.batch_sharding(mesh, spatial)

    def run_epoch(state: WGANState, images_u8: jax.Array, perm: jax.Array):
        def body(carry, idx):
            batch = jnp.take(images_u8, idx, axis=0)
            if mesh is not None:
                batch = jax.lax.with_sharding_constraint(batch, batch_sh)
            new_carry, metrics = step_fn(carry, batch)
            return new_carry, metrics

        return jax.lax.scan(body, state, perm)

    return run_epoch
