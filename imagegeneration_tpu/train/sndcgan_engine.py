"""SNDCGAN training engine: epoch loop, checkpoint/resume, previews, history.

Engine-level parity with the reference class `SNDCGAN`
(sndcgan/SNDCGAN.py:148-335):
- constructor wipes the output dir unless continuing (:152-156), loads
  losses.pickle (:174-179), builds a max_to_keep=2 checkpoint manager and
  restores the latest checkpoint when `continue_` (:181-199);
- `train(num_epochs, checkpoint_frequency)` runs epochs [start, num_epochs),
  draws fresh uniform z per step, emits a 3-image live-preview PDF per epoch
  (:311-314), and every `checkpoint_frequency` epochs saves a checkpoint,
  appends+pickles the loss history, exports params-only generator/
  discriminator artifacts (the .h5 role) and re-renders the loss plot
  (:317-333).

TPU-native differences: the per-batch work is ONE jitted donated XLA program
(train/sndcgan_step.py); when the dataset fits in HBM the whole epoch runs as
a single `lax.scan` program with zero host round-trips ("resident" mode);
metrics stay on device until the epoch aggregate; multi-device runs shard the
batch over the mesh data axis via parallel/dp.py.
"""

from __future__ import annotations

import os
import shutil
from os import path
from time import gmtime, strftime, time

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec

from imagegeneration_tpu.core import checkpoint as ckptlib
from imagegeneration_tpu.core import data as datalib
from imagegeneration_tpu.core import mesh as meshlib
from imagegeneration_tpu.core import platform as platformlib
from imagegeneration_tpu.core import metrics as metricslib
from imagegeneration_tpu.core import preview as previewlib
from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.models import sndcgan as modellib
from imagegeneration_tpu.parallel import dp
from imagegeneration_tpu.train import sndcgan_step as steplib

LOSS_KEYS = ("epoch", "avg_g_loss", "avg_d_loss", "d_real", "d_fake")


class SNDCGANEngine:
    """Drop-in capability match for the reference SNDCGAN trainer class."""

    def __init__(
        self,
        dir_path: str,
        dataset,  # path to an image folder, or any dataset with epoch_batches()
        batch_size: int,
        dropout: float = 0.5,
        learning_rate_disc: float = 2e-4,
        learning_rate_gen: float = 2e-4,
        live_output: str = "live",
        continue_: bool = False,
        image_size: tuple[int, int, int] = (144, 256, 3),
        z_size: int = 128,
        *,
        spectral_norm: bool = False,
        loss: str = "bce",
        d_updates: int = 2,
        quirk_eval_bn: bool = False,
        base_width: int = 512,
        dtype=jnp.float32,
        seed: int = rnglib.DEFAULT_MODEL_SEED,
        mesh=None,
        spatial: bool = False,
        resident: bool | None = None,
        profile: bool = False,
        preview_frequency: int = 1,
        host_sharded_data: bool = False,
    ) -> None:
        self.profile = profile
        self.preview_frequency = max(1, preview_frequency)
        # Multi-host: process 0 owns every artifact (dir scaffold, previews,
        # checkpoints, history, stdout); the state is replicated so its host
        # copy is complete. Other processes only feed and compute.
        self.is_main = meshlib.is_main_process()
        if self.is_main and not continue_ and os.path.exists(dir_path):
            shutil.rmtree(dir_path)
        os.makedirs(dir_path, exist_ok=True)
        self.dir_path = dir_path

        # Per-host input feeding (see core/mesh.py "multi-host"): with >1
        # process each host supplies only its process_row_range rows of each
        # global batch. host_sharded_data additionally shards the DECODE
        # (each host caches only its slice of the folder; local shuffle).
        n_proc = jax.process_count()
        self._feed_rows = None
        if mesh is not None and n_proc > 1:
            self._feed_rows = meshlib.process_row_range(mesh, batch_size)
        if isinstance(dataset, (str, os.PathLike)):
            shard = None
            if host_sharded_data and n_proc > 1:
                shard = (jax.process_index(), n_proc)
            dataset = datalib.ImageFolderDataset(
                dataset, image_size[:2], labeled=True, shard=shard
            )
        self.dataset = dataset
        self.host_sharded = getattr(dataset, "shard", None) is not None
        self.batch_size = batch_size
        self.z_size = z_size
        self.mesh = mesh
        # Spatial (H-axis) partitioning on top of DP — the config-5 scaling
        # story (512x288), now reachable from the engine/CLI, not just the
        # step API. Only meaningful under a mesh with a spatial axis > 1.
        self.spatial = bool(spatial) and mesh is not None

        if self.spatial:
            meshlib.check_spatial_partition(
                image_size[0] // 8, int(mesh.shape[meshlib.SPATIAL_AXIS]),
                "sndcgan", image_size[0],
            )
        mcfg = modellib.SNDCGANConfig(
            image_size=image_size,
            z_size=z_size,
            dropout_rate=dropout,
            base_width=base_width,
            spectral_norm=spectral_norm,
            quirk_eval_bn=quirk_eval_bn,
            dtype=dtype,
        )
        self.cfg = steplib.SNDCGANTrainConfig(
            model=mcfg,
            batch_size=batch_size,
            lr_gen=learning_rate_gen,
            lr_disc=learning_rate_disc,
            loss=loss,
            d_updates=d_updates,
            seed=seed,
        )
        self.chain = rnglib.KeyChain(seed)
        self.state = steplib.init_state(self.cfg)

        step_fn = steplib.make_train_step(self.cfg, mesh=mesh)
        if mesh is not None:
            self._step = dp.shard_train_step(
                step_fn, mesh, spatial=self.spatial, workload="sndcgan"
            )
            self.state = dp.replicate_state(self.state, mesh)
        else:
            self._step = jax.jit(
                step_fn,
                donate_argnums=0,
                compiler_options=platformlib.tpu_compiler_options("sndcgan"),
            )
        if resident is None:
            resident = self.dataset.images.nbytes < 2 * 1024**3
        if self.host_sharded:
            resident = False  # no host holds the full dataset to replicate
        self.resident = resident
        # state replicated+donated, dataset replicated in HBM, perm
        # replicated; each scanned batch is resharded in-program.
        self._epoch_runner = (
            dp.jit_epoch_runner(
                steplib.make_epoch_runner(self.cfg, mesh=mesh, spatial=self.spatial),
                mesh, n_data=2, workload="sndcgan"
            )
            if resident
            else None
        )
        self._resident_images = None
        self._sample = jax.jit(steplib.make_sampler(self.cfg))

        self.live_preview_file = live_output + ".pdf"
        self.losses = metricslib.LossHistory(
            path.join(dir_path, "losses.pickle"), LOSS_KEYS
        )
        self.ckpt_manager = ckptlib.CheckpointManager(
            path.join(dir_path, "checkpoints"), max_to_keep=2
        )

        if continue_ and self.ckpt_manager.latest_epoch() is not None:
            restored = self.ckpt_manager.restore(self.state)
            self.state = jax.tree.map(jnp.asarray, restored)
            if mesh is not None:
                self.state = dp.replicate_state(self.state, mesh)
            self.start_epoch = self.ckpt_manager.latest_epoch() + 1
            if self.is_main:
                print("Latest checkpoint restored!!")
        else:
            self.start_epoch = 0
            if self.is_main:
                print("No checkpoints were restored!!")

        n_g = sum(x.size for x in jax.tree.leaves(self.state.g_params))
        n_d = sum(x.size for x in jax.tree.leaves(self.state.d_params))
        if self.is_main:
            print(f"Generator params: {n_g:,} | Discriminator params: {n_d:,}")
            print("\nInitialized SNDCGAN successfully!\n")

    # ------------------------------------------------------------------ io
    def plot_history(self) -> None:
        self.losses.plot(path.join(self.dir_path, "plot_line_plot_loss.png"))

    def _save_artifacts(self, epoch: int) -> None:
        # Orbax saves are collective in multi-process mode (the manager runs
        # its own cross-process barriers), so EVERY process calls save; the
        # host-side artifacts (history, exports, plots) stay on process 0.
        self.ckpt_manager.save(epoch, self.state)
        if not self.is_main:
            return
        state = self._local_state()
        self.losses.save()
        ckptlib.export_params(
            path.join(
                self.dir_path, "models", "generator", f"gen_model-{epoch}.msgpack"
            ),
            {
                "params": state.g_params,
                "batch_stats": state.g_batch_stats,
            },
        )
        ckptlib.export_params(
            path.join(
                self.dir_path,
                "models",
                "discriminator",
                f"disc_model-{epoch}.msgpack",
            ),
            {"params": state.d_params, "spectral": state.d_spectral},
        )
        self.plot_history()

    def _local_state(self):
        """State usable OUTSIDE the mesh-global programs (sampling, saving).

        Multi-process: the replicated global state is pulled to host once
        (device_get is defined for fully-replicated arrays) so process 0 can
        sample/save on its own devices without entering a cross-process
        program that the other processes never join (deadlock)."""
        if jax.process_count() > 1:
            return jax.device_get(self.state)
        return self.state

    def sample(self, z: jax.Array) -> np.ndarray:
        """G(z) in [0,1] (generator_output.create_samples semantics)."""
        return np.asarray(self._sample(self._local_state(), z))

    # --------------------------------------------------------------- train
    def _run_epoch_streaming(self, epoch: int):
        device_metrics = []
        if self.host_sharded:
            local_bs = self._feed_rows[1] - self._feed_rows[0]
            it = self.dataset.local_epoch_batches(local_bs, epoch)
        else:
            it = self.dataset.epoch_batches(
                self.batch_size, epoch, rows=self._feed_rows
            )
        batches = datalib.prefetch(it, depth=2)
        batch_start_time = time()
        n = 0
        for i, batch in enumerate(batches):
            if self.mesh is not None:
                batch = meshlib.make_global_batch(
                    self.mesh, batch, spatial=self.spatial
                )
            self.state, m = self._step(self.state, batch)
            device_metrics.append(m)  # stays on device; no per-batch sync
            n += 1
            if self.is_main:
                print(
                    f"\r>Batch {i:03d}, passed time: "
                    f"{strftime('%M:%S', gmtime(time() - batch_start_time))}",
                    end="",
                    flush=True,
                )
        stacked = jax.device_get(device_metrics)
        agg = {
            k: float(np.mean([d[k] for d in stacked]))
            for k in stacked[0]
        }
        return agg, n

    def _run_epoch_resident(self, epoch: int):
        if self._resident_images is None:
            if self.mesh is not None:
                # Replicated HBM dataset; multi-process-safe (every host
                # feeds its own devices from its own full decode cache).
                self._resident_images = meshlib.make_replicated_global(
                    self.mesh, self.dataset.images
                )
            else:
                self._resident_images = jax.device_put(self.dataset.images)
        rng = self.chain.numpy_rng("data", epoch)
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
        agg = {k: float(np.mean(v)) for k, v in metrics.items()}
        return agg, nb

    def train(self, num_epochs: int, checkpoint_frequency: int = 5) -> None:
        start_time = time()
        watch = metricslib.Stopwatch()
        profiler = metricslib.ProfilerHook(self.dir_path, self.profile)
        local = {k: [] for k in LOSS_KEYS}

        for epoch in range(self.start_epoch, num_epochs):
            watch.epoch_start()
            profiler.maybe_start(epoch, self.start_epoch + 1)
            if self.resident:
                agg, n_steps = self._run_epoch_resident(epoch)
            else:
                agg, n_steps = self._run_epoch_streaming(epoch)

            profiler.maybe_stop()
            perf = watch.epoch_report(n_steps, n_steps * self.batch_size)
            if self.is_main:
                metricslib.write_metrics_jsonl(
                    path.join(self.dir_path, "perf.jsonl"),
                    {"epoch": epoch, **perf},
                )

            local["epoch"].append(epoch)
            local["avg_g_loss"].append(agg["g_loss"])
            local["avg_d_loss"].append(agg["d_loss"])
            local["d_real"].append(agg["d_loss_real"])
            local["d_fake"].append(agg["d_loss_fake"])

            epoch_duration = strftime("%H:%M:%S", gmtime(time() - start_time))
            info_text = (
                "Epoch {:04d} | ET {} min | Avg Losses G/D {:.4f}/{:.4f} "
                "[D-Real: {:.4f} D-Fake {:.4f}] | {:.2f} steps/s".format(
                    epoch,
                    epoch_duration,
                    agg["g_loss"],
                    agg["d_loss"],
                    agg["d_loss_real"],
                    agg["d_loss_fake"],
                    perf["steps_per_sec"],
                )
            )
            if self.is_main:
                print("\r" + info_text)

            # Per-epoch preview like the reference (SNDCGAN.py:311-314); on
            # slow hosts matplotlib rendering can exceed the epoch's TPU time,
            # so the cadence is configurable (preview_frequency=1 == faithful).
            if self.is_main and epoch % self.preview_frequency == 0:
                n_preview = 3
                fixed_z = rnglib.uniform_z(
                    self.chain.at_step("preview", epoch), n_preview, self.z_size
                )
                samples = self.sample(fixed_z)
                previewlib.live_preview(samples, info_text, self.live_preview_file)

            if epoch % checkpoint_frequency == 0:
                self.losses.extend(local)
                local = {k: [] for k in LOSS_KEYS}
                self._save_artifacts(epoch)
