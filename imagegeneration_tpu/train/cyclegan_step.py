"""CycleGAN fused train step — one forward graph, four simultaneous updates.

Reference semantics (cyclegan/CycleGAN.py:325-382, the repo's only
@tf.function): ONE persistent tape computes fake_y=G_g(x), cycled_x=G_f(fake_y),
fake_x=G_f(y), cycled_y=G_g(fake_x), identity images same_x=G_f(x),
same_y=G_g(y), four discriminator passes, six losses —
  gen_g = BCE(1, D_y(fake_y));  gen_f = BCE(1, D_x(fake_x))
  total_cycle = 10*L1(x, cycled_x) + 10*L1(y, cycled_y)   [BOTH dirs in BOTH
                                                           generator totals]
  identity_g = 5*L1(y, same_y);  identity_f = 5*L1(x, same_x)
  total_gen_g = gen_g + total_cycle + identity_g
  total_gen_f = gen_f + total_cycle + identity_f
  disc_x = 0.5*(BCE(1, D_x(x)) + BCE(0, D_x(fake_x)))      (likewise disc_y)
— then FOUR tape.gradient calls and FOUR Adam(2e-4, beta1=0.5) applies, all
against the same pre-update graph (simultaneous updates; discriminators see
non-detached fakes but their gradients only flow to their own parameters).

TPU-native shape: the shared forward runs ONCE under `jax.vjp`; the four
gradient sets come from THREE cotangent pulls —
  pull (1,0,0,0) -> d total_gen_g / d theta_gg
  pull (0,1,0,0) -> d total_gen_f / d theta_gf
  pull (0,0,1,1) -> (d disc_x/d theta_dx, d disc_y/d theta_dy) in one pass,
      valid because disc_x doesn't depend on theta_dy and vice versa.
(A single summed pull would be wrong: the cycle term appears in BOTH
generator totals and generator losses depend on discriminator parameters, so
per-loss gradients must be extracted separately, exactly as tape.gradient
does.) The whole thing — both batches' normalization, 6 generator passes,
4 discriminator passes, 3 backward sweeps, 4 optimizer applies, metrics —
is ONE jitted, donated XLA program.
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
from imagegeneration_tpu.models import cyclegan as modellib
from imagegeneration_tpu.train import common

LAMBDA = 10.0  # cyclegan/CycleGAN.py:186


class CycleGANState(struct.PyTreeNode):
    step: jax.Array
    gg_params: Any  # generator G: X -> Y
    gf_params: Any  # generator F: Y -> X
    dx_params: Any
    dy_params: Any
    gg_opt: Any
    gf_opt: Any
    dx_opt: Any
    dy_opt: Any


@dataclasses.dataclass(frozen=True)
class CycleGANTrainConfig:
    model: modellib.CycleGANConfig = modellib.CycleGANConfig()
    batch_size: int = 1
    learning_rate: float = 2e-4  # CycleGAN.py:229-233
    beta1: float = 0.5
    seed: int = rnglib.DEFAULT_MODEL_SEED


def build(cfg: CycleGANTrainConfig):
    gen_g, gen_f, disc_x, disc_y = modellib.make_models(cfg.model)
    tx = lambda: common.adam(cfg.learning_rate, b1=cfg.beta1)  # noqa: E731
    return gen_g, gen_f, disc_x, disc_y, tx(), tx(), tx(), tx()


def init_state(cfg: CycleGANTrainConfig) -> CycleGANState:
    gen_g, gen_f, disc_x, disc_y, gg_tx, gf_tx, dx_tx, dy_tx = build(cfg)
    chain = rnglib.KeyChain(cfg.seed)
    k1, k2, k3, k4 = jax.random.split(chain.stream("params"), 4)
    h, w, c = cfg.model.image_size
    x0 = jnp.zeros((1, h, w, c), jnp.float32)

    gg = gen_g.init({"params": k1}, x0)["params"]
    gf = gen_f.init({"params": k2}, x0)["params"]
    dx = disc_x.init({"params": k3}, x0)["params"]
    dy = disc_y.init({"params": k4}, x0)["params"]
    return CycleGANState(
        step=jnp.zeros((), jnp.int32),
        gg_params=gg, gf_params=gf, dx_params=dx, dy_params=dy,
        gg_opt=gg_tx.init(gg), gf_opt=gf_tx.init(gf),
        dx_opt=dx_tx.init(dx), dy_opt=dy_tx.init(dy),
    )


def _acc_dtype(*xs: jax.Array):
    # Upcast bf16 inputs to f32 for the L1 reduction, but do NOT downcast
    # f64 (the f64 mesh-equivalence tests rely on full-precision reductions).
    return jnp.promote_types(jnp.result_type(*xs), jnp.float32)


def cycle_loss(real: jax.Array, cycled: jax.Array) -> jax.Array:
    """10 * mean|real - cycled| (CycleGAN.py:201-203)."""
    dt = _acc_dtype(real, cycled)
    return LAMBDA * jnp.mean(jnp.abs(real.astype(dt) - cycled.astype(dt)))


def identity_loss(real: jax.Array, same: jax.Array) -> jax.Array:
    """5 * mean|real - same| (CycleGAN.py:206-208)."""
    dt = _acc_dtype(real, same)
    return LAMBDA * 0.5 * jnp.mean(jnp.abs(real.astype(dt) - same.astype(dt)))


def discriminator_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """0.5*(BCE(1,real)+BCE(0,fake)) over patch logits (CycleGAN.py:190-194)."""
    return 0.5 * (
        common.bce_logits_mean(jnp.ones_like(logits_real), logits_real)
        + common.bce_logits_mean(jnp.zeros_like(logits_fake), logits_fake)
    )


def generator_adv_loss(logits_fake: jax.Array) -> jax.Array:
    """BCE(1, fake) (CycleGAN.py:197-198)."""
    return common.bce_logits_mean(jnp.ones_like(logits_fake), logits_fake)


def make_train_step(cfg: CycleGANTrainConfig, mesh=None):
    gen_g, gen_f, disc_x, disc_y, gg_tx, gf_tx, dx_tx, dy_tx = build(cfg)
    replicate = common.make_replicator(mesh)

    def losses_fn(gg, gf, dx, dy, real_x, real_y):
        g_g = lambda v, x: gen_g.apply({"params": v}, x)  # noqa: E731
        g_f = lambda v, x: gen_f.apply({"params": v}, x)  # noqa: E731
        d_x = lambda v, x: disc_x.apply({"params": v}, x)  # noqa: E731
        d_y = lambda v, x: disc_y.apply({"params": v}, x)  # noqa: E731

        fake_y = g_g(gg, real_x)
        cycled_x = g_f(gf, fake_y)
        fake_x = g_f(gf, real_y)
        cycled_y = g_g(gg, fake_x)
        same_x = g_f(gf, real_x)
        same_y = g_g(gg, real_y)

        disc_real_x = d_x(dx, real_x)
        disc_real_y = d_y(dy, real_y)
        disc_fake_x = d_x(dx, fake_x)
        disc_fake_y = d_y(dy, fake_y)

        gen_g_loss = generator_adv_loss(disc_fake_y)
        gen_f_loss = generator_adv_loss(disc_fake_x)
        total_cycle = cycle_loss(real_x, cycled_x) + cycle_loss(real_y, cycled_y)
        id_g = identity_loss(real_y, same_y)
        id_f = identity_loss(real_x, same_x)

        total_gen_g = gen_g_loss + total_cycle + id_g
        total_gen_f = gen_f_loss + total_cycle + id_f
        disc_x_loss = discriminator_loss(disc_real_x, disc_fake_x)
        disc_y_loss = discriminator_loss(disc_real_y, disc_fake_y)

        aux = {
            "gen_g_loss": gen_g_loss,
            "gen_f_loss": gen_f_loss,
            "identity_loss_g": id_g,
            "identity_loss_f": id_f,
            "total_gen_g_loss": total_gen_g,
            "total_gen_f_loss": total_gen_f,
            "total_cycle_loss": total_cycle,
            "disc_x_loss": disc_x_loss,
            "disc_y_loss": disc_y_loss,
        }
        return (total_gen_g, total_gen_f, disc_x_loss, disc_y_loss), aux

    def train_step(state: CycleGANState, batch_x_u8, batch_y_u8):
        real_x = normalize_on_device(batch_x_u8, cfg.model.dtype)
        real_y = normalize_on_device(batch_y_u8, cfg.model.dtype)

        losses, vjp_fn, aux = jax.vjp(
            lambda gg, gf, dx, dy: losses_fn(
                gg, gf, dx, dy, real_x, real_y
            ),
            state.gg_params, state.gf_params, state.dx_params, state.dy_params,
            has_aux=True,
        )
        # Cotangent dtypes must match the primal loss dtypes (f32 normally;
        # f64 under the f64 mesh-equivalence configs).
        def cot(*flags):
            return tuple(
                jnp.asarray(f, l.dtype) for f, l in zip(flags, losses)
            )

        # pull 1: d total_gen_g / d params -> keep the gg block
        gg_grads = vjp_fn(cot(1, 0, 0, 0))[0]
        # pull 2: d total_gen_f / d params -> keep the gf block
        gf_grads = vjp_fn(cot(0, 1, 0, 0))[1]
        # pull 3: disc losses are parameter-disjoint -> both blocks in one pull
        _, _, dx_grads, dy_grads = vjp_fn(cot(0, 0, 1, 1))

        # grad replication constraints: GSPMD sum-for-mean miscompile
        # workaround — see common.make_replicator.
        gg_grads, gf_grads, dx_grads, dy_grads = replicate(
            (gg_grads, gf_grads, dx_grads, dy_grads)
        )
        gg_updates, gg_opt = gg_tx.update(gg_grads, state.gg_opt, state.gg_params)
        gf_updates, gf_opt = gf_tx.update(gf_grads, state.gf_opt, state.gf_params)
        dx_updates, dx_opt = dx_tx.update(dx_grads, state.dx_opt, state.dx_params)
        dy_updates, dy_opt = dy_tx.update(dy_grads, state.dy_opt, state.dy_params)

        new_state = state.replace(
            step=state.step + 1,
            gg_params=replicate(optax.apply_updates(state.gg_params, gg_updates)),
            gf_params=replicate(optax.apply_updates(state.gf_params, gf_updates)),
            dx_params=replicate(optax.apply_updates(state.dx_params, dx_updates)),
            dy_params=replicate(optax.apply_updates(state.dy_params, dy_updates)),
            gg_opt=gg_opt, gf_opt=gf_opt, dx_opt=dx_opt, dy_opt=dy_opt,
        )
        metrics = {k: aux[k] for k in (
            "gen_g_loss", "gen_f_loss", "identity_loss_g", "identity_loss_f",
            "total_gen_g_loss", "total_gen_f_loss", "total_cycle_loss",
            "disc_x_loss", "disc_y_loss",
        )}
        return new_state, metrics

    return train_step


def make_translators(cfg: CycleGANTrainConfig):
    """Jittable (state, images in [-1,1]) -> translated images, both dirs."""
    gen_g, gen_f, *_ = build(cfg)

    def translate_g(state: CycleGANState, x: jax.Array) -> jax.Array:
        return gen_g.apply({"params": state.gg_params}, x)

    def translate_f(state: CycleGANState, x: jax.Array) -> jax.Array:
        return gen_f.apply({"params": state.gf_params}, x)

    return translate_g, translate_f


def make_epoch_runner(cfg: CycleGANTrainConfig, mesh=None, spatial: bool = False):
    """Device-resident epoch scan over paired batch indices.
    Under a mesh: replicated HBM datasets, per-iteration batch resharding."""
    step_fn = make_train_step(cfg, mesh=mesh)
    if mesh is not None:
        from imagegeneration_tpu.core import mesh as meshlib

        batch_sh = meshlib.batch_sharding(mesh, spatial)

    def run_epoch(
        state: CycleGANState, images_x_u8, images_y_u8, perm_x, perm_y
    ):
        def body(carry, idx):
            ix, iy = idx
            bx = jnp.take(images_x_u8, ix, axis=0)
            by = jnp.take(images_y_u8, iy, axis=0)
            if mesh is not None:
                bx = jax.lax.with_sharding_constraint(bx, batch_sh)
                by = jax.lax.with_sharding_constraint(by, batch_sh)
            new_carry, metrics = step_fn(carry, bx, by)
            return new_carry, metrics

        return jax.lax.scan(body, state, (perm_x, perm_y))

    return run_epoch
