"""Discriminator-feature FID evaluation (the reference's FID variant).

Parity with sndcgan/generator_evaluation.py:
- the feature extractor is the GAN's *own trained discriminator* with the
  Flatten/Dense head removed and AvgPool(8x8)+Flatten appended (:134-138) —
  NOT InceptionV3 (faithful to the reference; an Inception-FID can be layered
  on later without changing this API);
- evaluation state (fixed real batches + matching z, <=16 batches, the epoch
  list) is pinned ONCE and pickled so runs are resumable and apples-to-apples
  across epochs (`init_fid_evaluation`, :58-102);
- per-epoch FIDs accumulate incrementally into fids.pickle so an interrupted
  evaluation resumes where it stopped (:143-155,178-184);
- FID math: per-batch mu/cov + tr sqrtm(cov_f cov_r) cross term (:36-55);
  the cross term is computed exactly via the low-rank nuclear-norm identity
  by default (ops/sqrtm.trace_sqrtm_product_lowrank) — the d x d sqrtm the
  reference does on host is never formed.

Corrected quirk (documented delta): the reference feeds the discriminator
fake images denormalized to [0,1] (create_samples) but real images in [-1,1]
(generator_evaluation.py:163-176) — a range mismatch that biases its FID.
Here both fake and real are evaluated in [-1,1] by default; pass
`quirk_range_mismatch=True` to reproduce the reference's behavior exactly
(required for comparing FID values against reference-produced checkpoints).

TPU-native: feature extraction and image synthesis run as one jitted program
per batch; only mu/cov/sqrtm-trace run where configured.
"""

from __future__ import annotations

import pickle
from os import path
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.core.checkpoint import find_epoch_files, load_params
from imagegeneration_tpu.models.sndcgan import (
    Discriminator,
    Generator,
    SNDCGANConfig,
)
from imagegeneration_tpu.ops.sqrtm import (
    trace_sqrtm_product,
    trace_sqrtm_product_lowrank,
)

MAX_BATCHES = 16  # generator_evaluation.py:29


def calculate_fid_from_features(
    feats_fake: np.ndarray, feats_real: np.ndarray, method: str = "lowrank"
) -> float:
    """Frechet distance between feature Gaussians (generator_evaluation.py:36-55).

    method "lowrank" (default): exact cross term via the nuclear norm of the
    tiny cross matrix (ops/sqrtm.trace_sqrtm_product_lowrank) — equal to the
    reference's sqrtm formulation but stable in the samples<<dims regime the
    discriminator-feature FID always operates in. "scipy": the reference's
    full d x d host sqrtm. "newton_schulz": device iteration (only for
    well-conditioned covariances).
    """
    feats_fake = np.asarray(feats_fake, np.float64)
    feats_real = np.asarray(feats_real, np.float64)
    mu_f, mu_r = feats_fake.mean(axis=0), feats_real.mean(axis=0)
    ssdiff = float(np.sum((mu_f - mu_r) ** 2))
    # tr(cov) without materializing it: mean squared centered norm.
    def _trace_cov(f, mu):
        n = max(f.shape[0] - 1, 1)
        return float(np.sum((f - mu) ** 2) / n)

    if method == "lowrank":
        tr_cross = trace_sqrtm_product_lowrank(feats_fake, feats_real)
        return (
            ssdiff
            + _trace_cov(feats_fake, mu_f)
            + _trace_cov(feats_real, mu_r)
            - 2.0 * tr_cross
        )
    cov_f = np.cov(feats_fake, rowvar=False)
    cov_r = np.cov(feats_real, rowvar=False)
    tr_cross = trace_sqrtm_product(
        cov_f.astype(np.float32), cov_r.astype(np.float32), method
    )
    return ssdiff + float(np.trace(cov_f + cov_r)) - 2.0 * tr_cross


class FIDEvaluator:
    """Pinned-batch, resumable FID evaluation over epoch-stamped exports."""

    def __init__(
        self,
        dir_path: str,
        output_dir: str,
        image_size=(144, 256, 3),
        z_size: int = 128,
        dropout: float = 0.5,
        seed: int = rnglib.DEFAULT_MODEL_SEED,
        sqrtm_method: str = "lowrank",
        spectral_norm: bool = False,  # must match the trained discriminator
        quirk_range_mismatch: bool = False,
        feature_source: str = "disc",  # "disc" (faithful) | "inception"
        inception_weights: str | None = None,
    ) -> None:
        self.dir_path = dir_path
        self.output_dir = output_dir
        self.cfg = SNDCGANConfig(
            image_size=image_size, z_size=z_size, dropout_rate=dropout,
            spectral_norm=spectral_norm,
        )
        self.gen = Generator(self.cfg)
        self.disc = Discriminator(self.cfg)
        self.seed = seed
        self.sqrtm_method = sqrtm_method
        # Reference bug-compat: evaluate fakes in [0,1] (create_samples
        # output, generator_output.py:25-28) against reals in [-1,1]
        # (generator_evaluation.py:163-176). Needed to reproduce FID values
        # computed by the reference's own evaluation pipeline.
        self.quirk_range_mismatch = quirk_range_mismatch
        if feature_source not in ("disc", "inception"):
            raise ValueError(f"unknown feature_source {feature_source!r}")
        if quirk_range_mismatch and feature_source == "inception":
            # The range quirk exists only to reproduce the reference's
            # discriminator-feature pipeline; the Inception extractor's
            # contract is [-1,1] input, so composing the two silently skews
            # the standard FID (ADVICE r2).
            raise ValueError(
                "quirk_range_mismatch=True is reference bug-compat for the "
                "disc-feature pipeline and is meaningless with "
                "feature_source='inception'"
            )
        self.feature_source = feature_source
        self.inception_weights = inception_weights
        self._jit_features = jax.jit(
            lambda v, x: self.disc.apply(
                v, x, train=False, update_sn=False, features=True
            )
        )
        self._jit_gen = jax.jit(lambda v, z: self.gen.apply(v, z, train=False))

        def _gen_feats(gv, dv, z):
            # Fused synthesis->features: the fake image NEVER leaves the
            # device. Besides being the right TPU shape (no host roundtrip
            # of 14 MB images per batch), this sidesteps a measured leak in
            # the tunneled-TPU client: every device<->host transfer buffer
            # is retained (~16 MB leaked per 28 MB image roundtrip,
            # docs/STATUS.md round 4) — the unfused path leaked ~3 GB per
            # evaluated epoch and OOM-killed 100-epoch sweeps.
            fake = self.gen.apply(gv, z, train=False)
            if self.quirk_range_mismatch:
                fake = (fake + 1.0) / 2.0  # create_samples' [0,1] output
            return self.disc.apply(
                dv, fake, train=False, update_sn=False, features=True
            )

        self._jit_gen_features = jax.jit(_gen_feats)

    # ------------------------------------------------------------ pinning
    def init_fid_evaluation(
        self, dataset, batch_size: int, step_size: int, start_epoch: int,
        disc_epoch: int,
    ) -> dict:
        """Pin <=16 real batches + matching z and the epoch list; pickle them
        (generator_evaluation.py:58-102)."""
        model_path_gen = path.join(self.dir_path, "models", "generator")
        found = find_epoch_files(model_path_gen, "gen_model-{epoch}.msgpack")
        epochs_used = [e for e, _ in found if e >= start_epoch][::step_size]

        chain = rnglib.KeyChain(self.seed)
        batches_used = min(MAX_BATCHES, dataset.num_batches(batch_size))
        img_real_used, random_z_used = [], []
        it = dataset.epoch_batches(batch_size, epoch=0)
        for i in range(batches_used):
            batch_u8 = next(it)
            img_real_used.append(
                (batch_u8.astype(np.float32) / 127.5 - 1.0)
            )
            z = rnglib.uniform_z(
                chain.at_step("eval", i), batch_u8.shape[0], self.cfg.z_size
            )
            random_z_used.append(np.asarray(z))

        init_dict = {
            "epochs_used": epochs_used,
            "img_real_used": img_real_used,
            "random_z_used": random_z_used,
            "batches_used": batches_used,
            "disc_epoch": disc_epoch,
        }
        Path(self.output_dir).mkdir(parents=True, exist_ok=True)
        with open(path.join(self.output_dir, "fid_tmp_init.pickle"), "wb") as f:
            pickle.dump(init_dict, f)
        return init_dict

    def load_init(self) -> dict:
        with open(path.join(self.output_dir, "fid_tmp_init.pickle"), "rb") as f:
            return pickle.load(f)

    # --------------------------------------------------------- evaluation
    def _load_disc_features_fn(self, disc_epoch: int):
        if self.feature_source == "inception":
            # Standard Inception-pool3 FID (modern comparability option);
            # the disc_epoch is irrelevant to this extractor.
            from imagegeneration_tpu.evalx.inception import (
                load_inception_params,
                make_feature_fn,
            )

            feat = make_feature_fn(load_inception_params(self.inception_weights))
            return lambda x: np.asarray(feat(jnp.asarray(x)))
        disc_path = path.join(
            self.dir_path, "models", "discriminator",
            f"disc_model-{disc_epoch}.msgpack",
        )
        d_vars = load_params(disc_path)  # raw restore, no eager init
        return lambda x: np.asarray(self._jit_features(d_vars, jnp.asarray(x)))

    def _load_gen(self, epoch: int):
        gen_path = path.join(
            self.dir_path, "models", "generator", f"gen_model-{epoch}.msgpack"
        )
        g_vars = load_params(gen_path)
        return lambda z: np.asarray(self._jit_gen(g_vars, jnp.asarray(z)))

    def evaluate(
        self, dataset=None, batch_size: int = 32, step_size: int = 1,
        start_epoch: int = 0, disc_epoch: int | None = None,
        continue_: bool = False,
    ) -> dict[int, list[float]]:
        """Per-epoch FID lists (one value per pinned batch), resumable."""
        out = Path(self.output_dir)
        if not continue_:
            if dataset is None:
                raise ValueError("dataset required unless continuing")
            if disc_epoch is None:
                found = find_epoch_files(
                    path.join(self.dir_path, "models", "discriminator"),
                    "disc_model-{epoch}.msgpack",
                )
                disc_epoch = found[-1][0]
            init = self.init_fid_evaluation(
                dataset, batch_size, step_size, start_epoch, disc_epoch
            )
        else:
            init = self.load_init()

        results_file = out / "fids.pickle"
        if results_file.exists():
            with open(results_file, "rb") as f:
                results: dict[int, list[float]] = pickle.load(f)
        else:
            results = {}

        feat_fn = self._load_disc_features_fn(init["disc_epoch"])
        real_feats = [feat_fn(x) for x in init["img_real_used"]]

        if self.feature_source == "disc":
            # Fused device-resident path: stage disc params + pinned z ONCE,
            # then per epoch only the generator params go up and the tiny
            # feature matrices come down (see _gen_feats for why).
            disc_path = path.join(
                self.dir_path, "models", "discriminator",
                f"disc_model-{init['disc_epoch']}.msgpack",
            )
            d_vars = jax.device_put(load_params(disc_path))
            zs_dev = [jax.device_put(z) for z in init["random_z_used"]]

            def epoch_feats(epoch):
                gen_path = path.join(
                    self.dir_path, "models", "generator",
                    f"gen_model-{epoch}.msgpack",
                )
                g_vars = jax.device_put(load_params(gen_path))
                return [
                    np.asarray(self._jit_gen_features(g_vars, d_vars, z))
                    for z in zs_dev
                ]
        else:  # inception: keep the generic two-step path
            def epoch_feats(epoch):
                gen_fn = self._load_gen(epoch)
                return [feat_fn(gen_fn(z)) for z in init["random_z_used"]]

        for epoch in init["epochs_used"]:
            if epoch in results:
                continue  # resumability (generator_evaluation.py:155-157)
            fids = [
                calculate_fid_from_features(ff, rf, self.sqrtm_method)
                for ff, rf in zip(epoch_feats(epoch), real_feats)
            ]
            results[epoch] = fids
            with open(results_file, "wb") as f:
                pickle.dump(results, f)
            print(f"epoch {epoch}: FID mean {np.mean(fids):.4f}")
        return results

    # --------------------------------------------------------------- plots
    def plot(self, results: dict[int, list[float]]) -> None:
        """Boxplot + mean-line plot (generator_evaluation.py:202-245)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = sorted(results)
        data = [results[e] for e in epochs]
        plt.clf()
        plt.boxplot(data, labels=[str(e) for e in epochs])
        plt.xlabel("Epoch")
        plt.ylabel("FID")
        plt.savefig(path.join(self.output_dir, "fids_boxplot.png"))
        plt.close()
        plt.clf()
        plt.plot(epochs, [float(np.mean(d)) for d in data])
        plt.xlabel("Epoch")
        plt.ylabel("FID")
        plt.savefig(path.join(self.output_dir, "fids_line.png"))
        plt.close()
