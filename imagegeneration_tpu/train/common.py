"""Shared pieces for the fused GAN train steps."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax

from imagegeneration_tpu.ops.pallas import adam as pallas_adam

# Keras optimizer epsilons differ from optax defaults; these match
# tf.keras.optimizers.Adam/RMSprop (epsilon=1e-7).
KERAS_EPS = 1e-7


def adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    moment_dtype: Any | None = None,
) -> optax.GradientTransformation:
    """Adam matching tf.keras EXACTLY (sndcgan/SNDCGAN.py:165,168;
    cyclegan/CycleGAN.py:229-233 uses b1=0.5).

    Keras applies the update  lr * sqrt(1-b2^t)/(1-b1^t) * m / (sqrt(v) + eps)
    — epsilon OUTSIDE the sqrt and NOT scaled by the bias correction — whereas
    optax.adam computes m_hat/(sqrt(v_hat)+eps), an effectively
    sqrt(1-b2^t)-times-smaller epsilon early in training. The difference is
    real: with eps=1e-7 it shifts small-|grad| coordinates enough to move
    3-step losses by ~1% (caught by tests/test_reference_parity.py, which
    pins our trajectory against the reference's own executed train_step).

    `moment_dtype` stores m/v in a reduced dtype (e.g. bfloat16) to cut the
    optimizer's HBM traffic; all arithmetic stays f32 (moments are upcast,
    updated, and rounded back each step). Default None keeps moments in the
    params' dtype (f32 everywhere in this repo — the faithful path). The
    trace-measured motivation: the Adam applies fuse into the dW fusions,
    whose cost is the f32 read+write of p/m/v (e.g. the 37.7M-param stem
    Dense's divide_add_fusion at 1.35 ms/step, benchmarks/README.md)."""

    def _moment_zeros(p):
        dt = moment_dtype if moment_dtype is not None else p.dtype
        return jnp.zeros(p.shape, dt)

    def init(params):
        return optax.ScaleByAdamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree.map(_moment_zeros, params),
            nu=jax.tree.map(_moment_zeros, params),
        )

    def update(grads, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            state.mu, grads,
        )
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g),
            state.nu, grads,
        )
        t = count.astype(jnp.float32)
        alpha = learning_rate * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)
        updates = jax.tree.map(
            lambda m, v: -alpha * m / (jnp.sqrt(v) + KERAS_EPS), mu32, nu32
        )
        if moment_dtype is not None:
            mu32 = jax.tree.map(lambda m: m.astype(moment_dtype), mu32)
            nu32 = jax.tree.map(lambda v: v.astype(moment_dtype), nu32)
        return updates, optax.ScaleByAdamState(count=count, mu=mu32, nu=nu32)

    return optax.GradientTransformation(init, update)


def resolve_fused_adam(fused: str) -> str:
    """'auto' -> 'pallas' on TPU, 'off' elsewhere (XLA:CPU has no Mosaic
    lowering; interpret mode is a test vehicle, not a perf path)."""
    if fused == "auto":
        return "pallas" if jax.default_backend() == "tpu" else "off"
    if fused not in ("off", "pallas", "interpret"):
        raise ValueError(f"fused_adam must be auto/off/pallas/interpret, got {fused!r}")
    return fused


def adam_apply(
    params: Any,
    grads: Any,
    state: optax.ScaleByAdamState,
    *,
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    moment_dtype: Any | None = None,
    fused: str = "auto",
) -> tuple[Any, optax.ScaleByAdamState]:
    """Combined Keras-form Adam apply: returns (new_params, new_state).

    Same math as `adam(...).update` followed by `optax.apply_updates`, in
    one call so the params write can fuse with the moment updates. With
    `fused` resolved to "pallas"/"interpret", large lane-aligned f32 leaves
    ride the fused Pallas kernel (ops/pallas/adam.py — p/g/m/v read and
    p'/m'/v' written in ONE pass over HBM instead of XLA's
    updates-intermediate chain). The kernel evaluates the identical
    elementwise expressions in the identical dtype, so the result is
    BIT-IDENTICAL to the XLA path (tests/test_pallas_adam.py) and the
    Keras-exact trajectory (tests/test_reference_parity.py) is preserved —
    this is the trajectory-preserving optimizer-traffic lever, unlike the
    trajectory-changing `moment_dtype=bf16` knob.

    Ineligible leaves (small, unaligned, or reduced-dtype moments) take the
    inline XLA formula, bitwise-matching `adam()`'s update (p + (-x) == p - x
    in IEEE semantics, all intermediates f32).
    """
    mode = resolve_fused_adam(fused)
    count = optax.safe_increment(state.count)
    t = count.astype(jnp.float32)
    alpha = learning_rate * jnp.sqrt(1.0 - b2**t) / (1.0 - b1**t)

    def one_leaf(p, g, m, v):
        if (
            mode != "off"
            and moment_dtype is None
            and pallas_adam.leaf_eligible(p, m)
        ):
            return pallas_adam.fused_adam_leaf(
                p, g, m, v, alpha, b1=b1, b2=b2, eps=KERAS_EPS,
                interpret=(mode == "interpret"),
            )
        m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g
        v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * jnp.square(g)
        p_new = p + (-alpha * m32 / (jnp.sqrt(v32) + KERAS_EPS))
        if moment_dtype is not None:
            m32 = m32.astype(moment_dtype)
            v32 = v32.astype(moment_dtype)
        return p_new, m32, v32

    flat_p, treedef = jax.tree.flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_m = treedef.flatten_up_to(state.mu)
    flat_v = treedef.flatten_up_to(state.nu)
    new = [one_leaf(p, g, m, v)
           for p, g, m, v in zip(flat_p, flat_g, flat_m, flat_v)]
    new_params = jax.tree.unflatten(treedef, [x[0] for x in new])
    new_state = optax.ScaleByAdamState(
        count=count,
        mu=jax.tree.unflatten(treedef, [x[1] for x in new]),
        nu=jax.tree.unflatten(treedef, [x[2] for x in new]),
    )
    return new_params, new_state


def rmsprop(learning_rate: float) -> optax.GradientTransformation:
    """RMSprop with Keras defaults (rho=0.9, eps=1e-7, no momentum).
    wasserstein_gan/WGAN.py:99,150. optax's eps_in_sqrt=True default matches
    tf.keras exactly (g / sqrt(v + eps); verified numerically vs TF 2.21)."""
    return optax.rmsprop(learning_rate, decay=0.9, eps=KERAS_EPS)


def _loss_dtype(*xs: jax.Array):
    # bf16 inputs upcast to f32 for the reduction; f64 stays f64 (the f64
    # mesh-equivalence tests depend on full-precision loss reductions).
    return jnp.promote_types(jnp.result_type(*xs), jnp.float32)


def bce_logits_mean(labels: jax.Array, logits: jax.Array) -> jax.Array:
    """Keras BinaryCrossentropy(from_logits=True) with mean reduction
    (sndcgan/SNDCGAN.py:170, cyclegan/CycleGAN.py:187). Computed in >=f32."""
    dt = _loss_dtype(labels, logits)
    return jnp.mean(
        optax.sigmoid_binary_cross_entropy(logits.astype(dt), labels.astype(dt))
    )


def wasserstein_loss(labels: jax.Array, preds: jax.Array) -> jax.Array:
    """mean(y_true * y_pred) — wasserstein_gan/WGAN.py:48-49."""
    dt = _loss_dtype(labels, preds)
    return jnp.mean(labels.astype(dt) * preds.astype(dt))


def hinge_d_loss(logits_real: jax.Array, logits_fake: jax.Array) -> jax.Array:
    """SN-GAN hinge discriminator loss (new; BASELINE config 2)."""
    dt = _loss_dtype(logits_real, logits_fake)
    lr = logits_real.astype(dt)
    lf = logits_fake.astype(dt)
    return jnp.mean(jax.nn.relu(1.0 - lr)) + jnp.mean(jax.nn.relu(1.0 + lf))


def hinge_g_loss(logits_fake: jax.Array) -> jax.Array:
    return -jnp.mean(logits_fake.astype(_loss_dtype(logits_fake)))


def tree_cast(tree: Any, dtype) -> Any:
    return jax.tree.map(lambda x: x.astype(dtype), tree)


def tree_cast_like(tree: Any, ref: Any) -> Any:
    """Cast every leaf of `tree` to the dtype of the matching leaf in `ref`.

    Used to pin mutated flax `batch_stats` back to their STORED dtype: flax
    computes batch statistics in the promoted compute dtype, so under an f64
    model config (the mesh-equivalence tests) the mutated running stats come
    back f64 while the state holds f32 — which changes the state pytree's
    type across steps and breaks lax.cond branch-signature equality
    (tests/test_parallel.py::test_wgan_multistep_mesh_equivalence_f64)."""
    return jax.tree.map(lambda x, r: x.astype(r.dtype), tree, ref)


def make_replicator(mesh):
    """Returns tree -> tree constraining every leaf to full replication.

    Used on parameter/optimizer trees after each in-step optimizer apply when
    running under a mesh, AND on every gradient tree before it enters the
    optimizer update. Besides being the intended layout (state replicated,
    batch sharded), this works around two XLA SPMD partitioner miscompiles
    in fused grad -> optimizer -> second-forward programs:

    1. Without the post-apply constraint the partitioner propagates a
       spatial sharding into the updated weights of the follow-up forward
       pass and produces wrong numerics (>2x loss divergence;
       tests/test_parallel.py spatial tests).
    2. Without the gradient constraint the partitioner resolves the batch-
       mean's cross-device reduction as a SUM over the data axis — gradients
       come out data_axis_size x too large. Adam/RMSprop are scale-invariant
       in the gradient, so losses and params look right while the second-
       moment accumulators are axis_size^2 x too large (measured: exact 16x
       nu on a 4x2 mesh, all three families, while the same value_and_grad
       isolated in its own jit is bit-exact). Caught by the f64 final-state
       comparisons in tests/test_parallel.py."""
    if mesh is None:
        return lambda tree: tree
    from jax.sharding import NamedSharding, PartitionSpec

    sharding = NamedSharding(mesh, PartitionSpec())

    def _constrain(tree: Any) -> Any:
        return jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, sharding), tree
        )

    return _constrain


def global_norm(tree: Any) -> jax.Array:
    return optax.global_norm(tree)
