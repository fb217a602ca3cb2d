"""WGAN training engine: epoch loop, n_critic history windows, artifacts.

Engine parity with the reference class WGAN (wasserstein_gan/WGAN.py:155-326):
- directory scaffold g_models/c_models/samples, wiped unless resuming
  (:161-167);
- resume (`load=True`) restores the latest state and stats.pickle (:177-190;
  the reference reloads Keras .h5 pairs — here the same capability rides one
  Orbax checkpoint of the full state, plus per-epoch params-only exports
  `model_%04d.msgpack` in g_models/c_models filling the .h5 role);
- loss history exactly as the reference accumulates it (:284-318): c1/c2 are
  averaged over each n_critic window and appended once per generator update,
  g per generator update; stats.pickle keys {c1_hist, c2_hist, g_hist};
- per-epoch `summarize_performance` (:230-267): 100-sample 10x10 grid
  `generated_plot_%04d.jpg`, stats.pickle dump, save g+c exports, delete the
  previous epoch's exports when off the save interval;
- final loss plot `plot_line_plot_loss_<epoch>.png` (:270-277).

The per-batch hot path is the fused jitted step (train/wgan_step.py) with the
every-5th-batch generator update inside the program.
"""

from __future__ import annotations

import os
import shutil
from os import path
from time import gmtime, strftime, time

import jax
import jax.numpy as jnp
import numpy as np

from imagegeneration_tpu.core import checkpoint as ckptlib
from imagegeneration_tpu.core import data as datalib
from imagegeneration_tpu.core import mesh as meshlib
from imagegeneration_tpu.core import platform as platformlib
from imagegeneration_tpu.core import metrics as metricslib
from imagegeneration_tpu.core import preview as previewlib
from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.models import wgan as modellib
from imagegeneration_tpu.parallel import dp
from imagegeneration_tpu.train import wgan_step as steplib


class WGANEngine:
    def __init__(
        self,
        dataset,  # folder path or dataset object (label-free)
        image_size: tuple[int, int, int],
        batch_size: int,
        critic_learn_iterations: int = 5,
        path_like: str = "training",
        load: bool = False,
        save_interval: int = 20,
        *,
        learning_rate: float = 5e-5,
        gp_lambda: float = 0.0,
        base_width: int = 512,
        dtype=jnp.float32,
        seed: int = rnglib.DEFAULT_MODEL_SEED,
        mesh=None,
        spatial: bool = False,
        resident: bool | None = None,
        profile: bool = False,
        host_sharded_data: bool = False,
    ) -> None:
        self.profile = profile
        self.save_interval = save_interval
        self.path = path_like
        # Multi-host: process 0 owns artifacts/stdout (see sndcgan_engine).
        self.is_main = meshlib.is_main_process()
        if not load and self.is_main and path.exists(path_like):
            shutil.rmtree(path_like)
        for sub in ("g_models", "c_models", "samples"):
            os.makedirs(path.join(path_like, sub), exist_ok=True)

        # Per-host input feeding (core/mesh.py "multi-host").
        n_proc = jax.process_count()
        self._feed_rows = None
        if mesh is not None and n_proc > 1:
            self._feed_rows = meshlib.process_row_range(mesh, batch_size)
        if isinstance(dataset, (str, os.PathLike)):
            shard = None
            if host_sharded_data and n_proc > 1:
                shard = (jax.process_index(), n_proc)
            dataset = datalib.ImageFolderDataset(
                dataset, image_size[:2], labeled=False, follow_links=True,
                shard=shard,
            )
        self.dataset = dataset
        self.host_sharded = getattr(dataset, "shard", None) is not None
        self.batch_size = batch_size
        self.mesh = mesh
        self.spatial = bool(spatial) and mesh is not None  # H-axis partitioning

        if self.spatial:
            meshlib.check_spatial_partition(
                image_size[0] // 8, int(mesh.shape[meshlib.SPATIAL_AXIS]),
                "wgan", image_size[0],
            )
        self.cfg = steplib.WGANTrainConfig(
            model=modellib.WGANConfig(
                image_size=image_size, base_width=base_width, dtype=dtype
            ),
            batch_size=batch_size,
            n_critic=critic_learn_iterations,
            learning_rate=learning_rate,
            gp_lambda=gp_lambda,
            seed=seed,
        )
        self.chain = rnglib.KeyChain(seed)
        self.state = steplib.init_state(self.cfg)
        self.latent_dim = self.cfg.model.z_size

        step_fn = steplib.make_train_step(self.cfg, mesh=mesh)
        if mesh is not None:
            self._step = dp.shard_train_step(
                step_fn, mesh, spatial=self.spatial, workload="wgan"
            )
            self.state = dp.replicate_state(self.state, mesh)
        else:
            self._step = jax.jit(
                step_fn,
                donate_argnums=0,
                compiler_options=platformlib.tpu_compiler_options("wgan"),
            )
        if resident is None:
            resident = self.dataset.images.nbytes < 2 * 1024**3
        if self.host_sharded:
            resident = False  # no host holds the full dataset to replicate
        self.resident = resident
        self._epoch_runner = (
            dp.jit_epoch_runner(
                steplib.make_epoch_runner(self.cfg, mesh=mesh, spatial=self.spatial),
                mesh, n_data=2, workload="wgan"
            )
            if resident
            else None
        )
        self._resident_images = None
        self._sample = jax.jit(steplib.make_sampler(self.cfg))

        self.loss_hist = metricslib.LossHistory(
            path.join(path_like, "stats.pickle"), ("c1_hist", "c2_hist", "g_hist")
        )
        self.ckpt_manager = ckptlib.CheckpointManager(
            path.join(path_like, "checkpoints"), max_to_keep=2
        )
        if load and self.ckpt_manager.latest_epoch() is not None:
            restored = self.ckpt_manager.restore(self.state)
            self.state = jax.tree.map(jnp.asarray, restored)
            if mesh is not None:
                self.state = dp.replicate_state(self.state, mesh)
            self.epoch = self.ckpt_manager.latest_epoch()
            if self.is_main:
                print("Restored WGAN state at epoch", self.epoch)
        else:
            self.epoch = 0

        if self.is_main:
            print("Initialized WGAN SUCCESS!")

    # ------------------------------------------------------------- sampling
    def _local_state(self):
        """Host-local state for sampling/saving outside the mesh programs
        (see SNDCGANEngine._local_state for the multi-process rationale)."""
        if jax.process_count() > 1:
            return jax.device_get(self.state)
        return self.state

    def generate_fake_samples(self, n_samples: int) -> np.ndarray:
        """n fake images in [0,1] via the 'preview' stream (WGAN.py:220-227)."""
        z = rnglib.normal_z(
            self.chain.at_step("preview", self.epoch), n_samples, self.latent_dim
        )
        return np.asarray(self._sample(self._local_state(), z))

    def summarize_performance(self, step: int, n_samples: int = 100) -> None:
        # Orbax saves are collective in multi-process mode: every process
        # calls save; the host-side artifacts stay on process 0.
        self.ckpt_manager.save(step, self.state)
        if not self.is_main:
            return
        state = self._local_state()
        x = self.generate_fake_samples(n_samples)
        previewlib.sample_grid(
            x, 10, 10, path.join(self.path, "samples", f"generated_plot_{step:04d}.jpg")
        )
        self.loss_hist.save()

        # remove previous exports off the save interval (WGAN.py:255-261)
        if (step - 1) % self.save_interval != 0:
            prev = f"model_{step - 1:04d}.msgpack"
            for folder in ("g_models", "c_models"):
                try:
                    os.remove(path.join(self.path, folder, prev))
                except OSError:
                    pass

        fname = f"model_{step:04d}.msgpack"
        ckptlib.export_params(
            path.join(self.path, "g_models", fname),
            {"params": state.g_params, "batch_stats": state.g_batch_stats},
        )
        ckptlib.export_params(
            path.join(self.path, "c_models", fname),
            {"params": state.c_params, "batch_stats": state.c_batch_stats},
        )
        print(f">Saved: generated_plot_{step:04d}.jpg and {fname}")

    def plot_history(self) -> None:
        """Final loss plot with the reference's series labels
        (wasserstein_gan/WGAN.py:270-277)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        plt.clf()
        plt.plot(self.loss_hist.data["c1_hist"], label="crit_real loss")
        plt.plot(self.loss_hist.data["c2_hist"], label="crit_fake loss")
        plt.plot(self.loss_hist.data["g_hist"], label="gen loss")
        plt.legend()
        plt.savefig(path.join(self.path, f"plot_line_plot_loss_{self.epoch}.png"))
        plt.close()

    # ---------------------------------------------------------------- train
    def _fold_metrics(self, c1, c2, g, did):
        """Reproduce the reference's history bookkeeping (WGAN.py:284-318):
        c1/c2 accumulate into a window; on each generator update the window
        means + the g loss are appended."""
        c1_tmp, c2_tmp = list(self._c1_tmp), list(self._c2_tmp)
        for i in range(len(c1)):
            c1_tmp.append(float(c1[i]))
            c2_tmp.append(float(c2[i]))
            if did[i] > 0.5:
                self.loss_hist.append(
                    c1_hist=float(np.mean(c1_tmp)),
                    c2_hist=float(np.mean(c2_tmp)),
                    g_hist=float(g[i]),
                )
                c1_tmp, c2_tmp = [], []
        self._c1_tmp, self._c2_tmp = c1_tmp, c2_tmp

    def train(self, epochs: int) -> None:
        self._c1_tmp, self._c2_tmp = [], []
        start_time = time()
        watch = metricslib.Stopwatch()
        profiler = metricslib.ProfilerHook(self.path, self.profile)
        first_real_epoch = self.epoch + 2
        remaining = epochs - self.epoch
        for _ in range(remaining):
            self.epoch += 1
            watch.epoch_start()
            profiler.maybe_start(self.epoch, first_real_epoch)
            if self.is_main:
                print(
                    f"####### Epoch {self.epoch} "
                    f"Time: {strftime('%H:%M:%S', gmtime(time() - start_time))} #######"
                )
            if self.resident:
                if self._resident_images is None:
                    self._resident_images = (
                        meshlib.make_replicated_global(
                            self.mesh, self.dataset.images
                        )
                        if self.mesh is not None
                        else jax.device_put(self.dataset.images)
                    )
                rng = self.chain.numpy_rng("data", self.epoch)
                perm = rng.permutation(len(self.dataset))
                nb = self.dataset.num_batches(self.batch_size)
                perm = perm[: nb * self.batch_size].reshape(nb, self.batch_size)
                if self.mesh is not None:
                    perm = meshlib.make_replicated_global(
                        self.mesh, perm.astype(np.int32)
                    )
                else:
                    perm = jnp.asarray(perm)
                self.state, metrics = self._epoch_runner(
                    self.state, self._resident_images, perm
                )
                metrics = jax.device_get(metrics)
                self._fold_metrics(
                    metrics["c_loss_real"], metrics["c_loss_fake"],
                    metrics["g_loss"], metrics["did_gan_update"],
                )
                n_steps = nb
            else:
                device_metrics = []
                if self.host_sharded:
                    local_bs = self._feed_rows[1] - self._feed_rows[0]
                    it = self.dataset.local_epoch_batches(local_bs, self.epoch)
                else:
                    it = self.dataset.epoch_batches(
                        self.batch_size, self.epoch, rows=self._feed_rows
                    )
                batches = datalib.prefetch(it, depth=2)
                n_steps = 0
                for j, batch in enumerate(batches):
                    if self.mesh is not None:
                        batch = meshlib.make_global_batch(
                            self.mesh, batch, spatial=self.spatial
                        )
                    self.state, m = self._step(self.state, batch)
                    device_metrics.append(m)
                    n_steps += 1
                got = jax.device_get(device_metrics)
                self._fold_metrics(
                    [m["c_loss_real"] for m in got],
                    [m["c_loss_fake"] for m in got],
                    [m["g_loss"] for m in got],
                    [m["did_gan_update"] for m in got],
                )
            profiler.maybe_stop()
            perf = watch.epoch_report(n_steps, n_steps * self.batch_size)
            if self.is_main:
                metricslib.write_metrics_jsonl(
                    path.join(self.path, "perf.jsonl"), {"epoch": self.epoch, **perf}
                )
            if self.is_main and self.loss_hist.data["c1_hist"]:
                print(
                    ">RealLoss=%.3f, FakeLoss=%.3f GeneratorLoss=%.3f | %.2f steps/s"
                    % (
                        self.loss_hist.data["c1_hist"][-1],
                        self.loss_hist.data["c2_hist"][-1],
                        self.loss_hist.data["g_hist"][-1],
                        perf["steps_per_sec"],
                    )
                )
            self.summarize_performance(self.epoch)
        if self.is_main:
            self.plot_history()
