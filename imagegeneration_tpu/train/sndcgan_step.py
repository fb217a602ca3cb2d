"""SNDCGAN fused train step — one XLA program per batch.

The reference's hottest loop is an *eager* `train_step`
(sndcgan/SNDCGAN.py:241-269): a G tape (G fwd, D fwd on fake, BCE(1, fake),
Adam apply), then TWO discriminator tapes with TWO Adam applies — one on the
real batch (labels 1), one on the *stale* fake batch produced by the
pre-update generator (labels 0), where the second D pass runs on the
already-real-updated discriminator. Every op dispatches eagerly and losses are
synced to host per batch.

Here the entire thing — normalization of the uint8 batch, latent draw, three
forward passes, three backward passes, three optimizer applies, metric
reduction — is ONE jitted, buffer-donated XLA program. The per-step PRNG is
folded from named streams (core/rng.py) so results are bitwise-stable for a
fixed seed regardless of host timing.

Loss modes:
- "bce": reference behavior (BCE-from-logits, split D updates).
- "hinge": SN-GAN hinge loss (BASELINE config 2, pairs with spectral_norm=True);
  uses the same three-apply structure so throughput is comparable.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.core.data import normalize_on_device
from imagegeneration_tpu.models import sndcgan
from imagegeneration_tpu.train import common


class SNDCGANState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    g_batch_stats: Any
    g_opt: Any
    d_params: Any
    d_spectral: Any  # empty dict when spectral_norm=False
    d_opt: Any


@dataclasses.dataclass(frozen=True)
class SNDCGANTrainConfig:
    model: sndcgan.SNDCGANConfig = sndcgan.SNDCGANConfig()
    batch_size: int = 32
    lr_gen: float = 2e-4  # sndcgan/Trainer.py:26-27
    lr_disc: float = 2e-4
    loss: str = "bce"  # "bce" (reference) | "hinge" (SN-GAN, config 2)
    # D optimizer applies per batch. 2 = faithful: the reference applies Adam
    # twice (real batch, then the stale fake batch on the real-updated D —
    # SNDCGAN.py:251-267), a cadence our real-scale validation showed
    # mode-collapsing (docs/STATUS.md). 1 = standard DCGAN: one combined
    # real+fake loss, one apply — the stability knob (pair with TTUR via
    # lr_disc != lr_gen if desired).
    d_updates: int = 2
    # Rematerialize discriminator activations in the backward passes of the
    # G-update and D-fake-update (jax.checkpoint): recompute the trunk
    # instead of saving per-layer residuals. Perf experiment knob
    # (benchmarks/exp_dropout_residual.py).
    remat_d: bool = False
    # PRNG impl for the dropout stream: "rbg" (default) uses the on-chip
    # hardware RNG — threefry mask generation for the 21 dropout sites per
    # step was measured at 56% of the whole train step (94 -> 55 ms/step at
    # 256x144 bs32). "threefry" restores the default-jax stream.
    dropout_impl: str = "rbg"
    # Adam m/v storage dtype: "f32" (faithful; exact Keras trajectory) or
    # "bf16" (halves optimizer HBM traffic; the applies fuse into the dW
    # fusions whose cost is p/m/v read+write — see common.adam). Update
    # arithmetic is f32 either way.
    opt_moments: str = "f32"
    # Fused Pallas Adam apply for large f32 leaves (ops/pallas/adam.py):
    # "off" (default), "auto"/"pallas" (on for TPU), "interpret".
    # MEASURED SLOWER on chip and therefore off: 49.17 vs 42.02 ms/step at
    # the headline config (benchmarks/ab_fused_adam.py, 2026-08-20). XLA
    # already fuses each Adam apply into the producing dW fusion — the
    # round-2 trace's stem divide_add_fusion ran at 1.35 ms ~= the 7-pass
    # HBM bound — so the custom call only severs that fusion and adds a
    # full gradient HBM round-trip. Kept as a documented experiment knob
    # (exactness-tested, tests/test_pallas_adam.py), same policy as the
    # measured-slower ConvT lowerings in nn/layers.py.
    fused_adam: str = "off"
    seed: int = rnglib.DEFAULT_MODEL_SEED


def build(cfg: SNDCGANTrainConfig):
    """Returns (generator, discriminator, g_tx, d_tx)."""
    gen, disc = sndcgan.make_models(cfg.model)
    if cfg.opt_moments not in ("f32", "bf16"):
        raise ValueError(f"opt_moments must be 'f32' or 'bf16', got {cfg.opt_moments!r}")
    mdt = jnp.bfloat16 if cfg.opt_moments == "bf16" else None
    return (
        gen,
        disc,
        common.adam(cfg.lr_gen, moment_dtype=mdt),
        common.adam(cfg.lr_disc, moment_dtype=mdt),
    )


def init_state(cfg: SNDCGANTrainConfig) -> SNDCGANState:
    gen, disc, g_tx, d_tx = build(cfg)
    chain = rnglib.KeyChain(cfg.seed)
    k_g, k_d = jax.random.split(chain.stream("params"))
    h, w, c = cfg.model.image_size

    z0 = jnp.zeros((1, cfg.model.z_size), jnp.float32)
    g_vars = gen.init({"params": k_g}, z0, train=False)
    x0 = jnp.zeros((1, h, w, c), jnp.float32)
    d_vars = disc.init({"params": k_d}, x0, train=False)

    g_params = g_vars["params"]
    g_bs = g_vars.get("batch_stats", {})
    d_params = d_vars["params"]
    d_sp = d_vars.get("spectral", {})
    return SNDCGANState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_batch_stats=g_bs,
        g_opt=g_tx.init(g_params),
        d_params=d_params,
        d_spectral=d_sp,
        d_opt=d_tx.init(d_params),
    )


def _g_apply(gen, params, batch_stats, z, train: bool):
    """Generator forward; returns (images, new_batch_stats)."""
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, mut = gen.apply(variables, z, train=True, mutable=["batch_stats"])
        return out, mut["batch_stats"]
    return gen.apply(variables, z, train=False), batch_stats


def _d_apply(disc, params, spectral, x, key, train=True, update_sn=False):
    """Discriminator forward; returns (logits, new_spectral)."""
    variables = {"params": params, "spectral": spectral}
    rngs = {"dropout": key} if train else {}
    if update_sn:
        logits, mut = disc.apply(
            variables, x, train=train, update_sn=True,
            mutable=["spectral"], rngs=rngs,
        )
        return logits, mut["spectral"]
    logits = disc.apply(
        variables, x, train=train, update_sn=False, rngs=rngs
    )
    return logits, spectral


def make_train_step(cfg: SNDCGANTrainConfig, mesh=None):
    """Build the fused (state, uint8 batch) -> (state, metrics) step.

    Call via `jax.jit(step, donate_argnums=0)` (train engine does this) or
    shard it over a mesh with parallel/dp.py — in the mesh case pass the mesh
    here too so in-step updated parameters are constrained to replication
    (layout intent + partitioner-bug workaround; see common.make_replicator).
    """
    gen, disc, g_tx, d_tx = build(cfg)
    mdt = jnp.bfloat16 if cfg.opt_moments == "bf16" else None
    common.resolve_fused_adam(cfg.fused_adam)  # validate eagerly
    # "auto" stays conservative under a mesh: the fused kernel is the
    # single-chip headline lever (replicated-operand pallas_call under the
    # GSPMD partitioner is unmeasured here); pass fused_adam="pallas"
    # explicitly to force it in sharded programs.
    fused = "off" if (cfg.fused_adam == "auto" and mesh is not None) else cfg.fused_adam

    def g_opt_apply(params, grads, opt):
        return common.adam_apply(
            params, grads, opt, learning_rate=cfg.lr_gen,
            moment_dtype=mdt, fused=fused,
        )

    def d_opt_apply(params, grads, opt):
        return common.adam_apply(
            params, grads, opt, learning_rate=cfg.lr_disc,
            moment_dtype=mdt, fused=fused,
        )

    replicate = common.make_replicator(mesh)
    chain = rnglib.KeyChain(cfg.seed)
    z_stream = chain.stream("z")
    drop_stream = chain.stream(
        "dropout", impl=None if cfg.dropout_impl == "threefry" else cfg.dropout_impl
    )
    use_hinge = cfg.loss == "hinge"
    if cfg.loss not in ("bce", "hinge"):
        raise ValueError(f"unknown loss {cfg.loss!r}")
    if cfg.d_updates not in (1, 2):
        raise ValueError(f"d_updates must be 1 or 2, got {cfg.d_updates}")

    def train_step(state: SNDCGANState, batch_u8: jax.Array, z: jax.Array | None = None):
        """`z=None` (training) draws the latent from the step-folded stream;
        an explicit `z` (cross-framework parity tests vs the reference's
        train_step, which receives input_z — SNDCGAN.py:241) bypasses it."""
        x_real = normalize_on_device(batch_u8, cfg.model.dtype)
        dk_g, dk_real, dk_fake = jax.random.split(
            jax.random.fold_in(drop_stream, state.step), 3
        )
        if z is None:
            z_key = jax.random.fold_in(z_stream, state.step)
            z = rnglib.uniform_z(z_key, batch_u8.shape[0], cfg.model.z_size)

        # ---- Generator update (D held fixed; reference SNDCGAN.py:242-249).
        def g_loss_fn(g_params):
            fake, new_bs = _g_apply(gen, g_params, state.g_batch_stats, z, True)

            def d_on_fake(f):
                logits, _ = _d_apply(
                    disc, state.d_params, state.d_spectral, f, dk_g
                )
                return logits

            logits_fake = (
                jax.checkpoint(d_on_fake) if cfg.remat_d else d_on_fake
            )(fake)
            if use_hinge:
                loss = common.hinge_g_loss(logits_fake)
            else:
                loss = common.bce_logits_mean(jnp.ones_like(logits_fake), logits_fake)
            return loss, (fake, new_bs)

        (g_loss, (fake_images, new_g_bs)), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(state.g_params)
        # grad replication constraints: GSPMD sum-for-mean miscompile
        # workaround — see common.make_replicator.
        g_grads = replicate(g_grads)
        new_g_params, new_g_opt = g_opt_apply(
            state.g_params, g_grads, state.g_opt
        )
        new_g_params = replicate(new_g_params)
        # The fake batch used below is from the PRE-update generator — the
        # reference reuses `g_output` across tapes (SNDCGAN.py:243,260).
        fake_images = jax.lax.stop_gradient(fake_images)

        if cfg.d_updates == 1:
            # Stability mode: one combined D loss, one Adam apply.
            def d_loss_fn(d_params):
                logits_real, new_sp = _d_apply(
                    disc, d_params, state.d_spectral, x_real, dk_real,
                    update_sn=True,
                )
                logits_fake, _ = _d_apply(
                    disc, d_params, new_sp, fake_images, dk_fake
                )
                if use_hinge:
                    loss_real = jnp.mean(
                        jax.nn.relu(1.0 - logits_real.astype(jnp.float32))
                    )
                    loss_fake = jnp.mean(
                        jax.nn.relu(1.0 + logits_fake.astype(jnp.float32))
                    )
                else:
                    loss_real = common.bce_logits_mean(
                        jnp.ones_like(logits_real), logits_real
                    )
                    loss_fake = common.bce_logits_mean(
                        jnp.zeros_like(logits_fake), logits_fake
                    )
                return loss_real + loss_fake, (
                    loss_real, loss_fake, logits_real, logits_fake, new_sp
                )

            (_, (d_loss_real, d_loss_fake, logits_real, logits_fake, new_sp)
             ), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(
                state.d_params
            )
            d_grads = replicate(d_grads)
            new_d_params, new_d_opt = d_opt_apply(
                state.d_params, d_grads, state.d_opt
            )
            new_d_params = replicate(new_d_params)
            return _finish(
                state, new_g_params, new_g_bs, new_g_opt, new_d_params,
                new_sp, new_d_opt, g_loss, d_loss_real, d_loss_fake,
                logits_real, logits_fake,
            )

        # ---- D update #1: real batch (SNDCGAN.py:251-257).
        def d_real_loss_fn(d_params):
            logits_real, new_sp = _d_apply(
                disc, d_params, state.d_spectral, x_real, dk_real, update_sn=True
            )
            if use_hinge:
                loss = jnp.mean(jax.nn.relu(1.0 - logits_real.astype(jnp.float32)))
            else:
                loss = common.bce_logits_mean(
                    jnp.ones_like(logits_real), logits_real
                )
            return loss, (logits_real, new_sp)

        (d_loss_real, (logits_real, new_sp)), d_grads1 = jax.value_and_grad(
            d_real_loss_fn, has_aux=True
        )(state.d_params)
        d_grads1 = replicate(d_grads1)
        d_params_mid, d_opt_mid = d_opt_apply(
            state.d_params, d_grads1, state.d_opt
        )
        d_params_mid = replicate(d_params_mid)

        # ---- D update #2: stale fake batch on the real-updated D
        # (SNDCGAN.py:259-267; two Adam applies per batch is faithful).
        def d_fake_loss_fn(d_params):
            def d_on_fake2(p):
                logits, _ = _d_apply(disc, p, new_sp, fake_images, dk_fake)
                return logits

            logits_fake = (
                jax.checkpoint(d_on_fake2) if cfg.remat_d else d_on_fake2
            )(d_params)
            if use_hinge:
                loss = jnp.mean(jax.nn.relu(1.0 + logits_fake.astype(jnp.float32)))
            else:
                loss = common.bce_logits_mean(
                    jnp.zeros_like(logits_fake), logits_fake
                )
            return loss, logits_fake

        (d_loss_fake, logits_fake), d_grads2 = jax.value_and_grad(
            d_fake_loss_fn, has_aux=True
        )(d_params_mid)
        d_grads2 = replicate(d_grads2)
        new_d_params, new_d_opt = d_opt_apply(
            d_params_mid, d_grads2, d_opt_mid
        )
        new_d_params = replicate(new_d_params)

        return _finish(
            state, new_g_params, new_g_bs, new_g_opt, new_d_params, new_sp,
            new_d_opt, g_loss, d_loss_real, d_loss_fake, logits_real,
            logits_fake,
        )

    def _finish(state, new_g_params, new_g_bs, new_g_opt, new_d_params,
                new_sp, new_d_opt, g_loss, d_loss_real, d_loss_fake,
                logits_real, logits_fake):
        metrics = {
            "g_loss": g_loss,
            "d_loss": d_loss_real + d_loss_fake,  # SNDCGAN.py:264
            "d_loss_real": d_loss_real,
            "d_loss_fake": d_loss_fake,
            "d_prob_real": jnp.mean(jax.nn.sigmoid(logits_real.astype(jnp.float32))),
            "d_prob_fake": jnp.mean(jax.nn.sigmoid(logits_fake.astype(jnp.float32))),
        }
        new_state = state.replace(
            step=state.step + 1,
            g_params=new_g_params,
            g_batch_stats=new_g_bs,
            g_opt=new_g_opt,
            d_params=new_d_params,
            d_spectral=new_sp,
            d_opt=new_d_opt,
        )
        return new_state, metrics

    return train_step


def make_sampler(cfg: SNDCGANTrainConfig):
    """Jittable fixed-z sampler: (state, z) -> images in [0, 1].

    Mirrors generator_output.create_samples (generator_output.py:25-28):
    G(z, training=False), denormalized to [0, 1].
    """
    gen, _, _, _ = build(cfg)

    def sample(state: SNDCGANState, z: jax.Array) -> jax.Array:
        imgs, _ = _g_apply(gen, state.g_params, state.g_batch_stats, z, False)
        return (imgs.astype(jnp.float32) + 1.0) / 2.0

    return sample


def make_epoch_runner(cfg: SNDCGANTrainConfig, mesh=None, spatial: bool = False):
    """Device-resident whole-epoch runner: scans the fused step over batches.

    TPU-native fast path with zero per-batch host involvement: the (uint8)
    dataset lives in HBM; each scan iteration gathers its shuffled batch by
    index and runs the fused step. Metrics come back stacked per batch.

    Under a mesh the dataset is kept replicated in HBM and each gathered
    batch is constrained to the data(/spatial) sharding, so every scan
    iteration runs the same SPMD program as the streaming-mesh path — the
    resident fast path and multi-device scaling compose instead of being
    either/or.
    """
    step_fn = make_train_step(cfg, mesh=mesh)
    if mesh is not None:
        from imagegeneration_tpu.core import mesh as meshlib

        batch_sh = meshlib.batch_sharding(mesh, spatial)

    def run_epoch(state: SNDCGANState, images_u8: jax.Array, perm: jax.Array):
        """images_u8: (N,H,W,C) resident dataset; perm: (nb, B) batch indices."""

        def body(carry, idx):
            batch = jnp.take(images_u8, idx, axis=0)
            if mesh is not None:
                batch = jax.lax.with_sharding_constraint(batch, batch_sh)
            new_carry, metrics = step_fn(carry, batch)
            return new_carry, metrics

        return jax.lax.scan(body, state, perm)

    return run_epoch
