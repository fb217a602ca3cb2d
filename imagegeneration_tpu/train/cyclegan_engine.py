"""CycleGAN training engine: paired loader, auto-resume, previews, history.

Engine parity with the reference class CycleGAN (cyclegan/CycleGAN.py:211-425):
- directory scaffold (path, checkpoints/, models/generator_{f,g}/) created but
  never wiped (:214-222);
- UNCONDITIONAL auto-restore of the latest checkpoint (:263-269 — the
  Trainer's -ct flag is parsed but never forwarded, a faithful quirk);
- paired label-free loader zipping two domains, full batches only
  (data_loader.py:27-41 -> core/data.PairedDataset);
- per-epoch mean of the 7 tracked losses appended to losses.pickle
  (:241-248,406-423);
- per-epoch preview sheet: the reference feeds batch1 to BOTH generators
  (:408-409) — faithfully kept;
- checkpoint saved EVERY epoch with max_to_keep=5 (:260,412); generator
  weight exports every `checkpoint_frequency` epochs (:414-420).

Hot path: the fused 4-update jitted step (train/cyclegan_step.py); resident
mode scans whole epochs on device.
"""

from __future__ import annotations

import os
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
from imagegeneration_tpu.models import cyclegan as modellib
from imagegeneration_tpu.parallel import dp
from imagegeneration_tpu.train import cyclegan_step as steplib

LOSS_KEYS = (
    "gen_g_loss", "gen_f_loss", "identity_loss_g", "identity_loss_f",
    "total_gen_g_loss", "total_gen_f_loss", "total_cycle_loss",
)


class CycleGANEngine:
    def __init__(
        self,
        dataset1_path,
        dataset2_path,
        path_like: str,
        batch_size: int,
        image_size: tuple[int, int],
        *,
        quirk_axis1: bool = False,
        base_width: int = 64,
        n_res_blocks: int = 9,
        dtype=jnp.float32,
        seed: int = rnglib.DEFAULT_MODEL_SEED,
        mesh=None,
        spatial: bool = False,
        resident: bool | None = None,
        profile: bool = False,
        host_sharded_data: bool = False,
    ) -> None:
        self.profile = profile
        # Multi-host: process 0 owns artifacts/stdout (see sndcgan_engine).
        self.is_main = meshlib.is_main_process()
        os.makedirs(path_like, exist_ok=True)
        os.makedirs(path.join(path_like, "models", "generator_f"), exist_ok=True)
        os.makedirs(path.join(path_like, "models", "generator_g"), exist_ok=True)
        self.preview_output = path.join(path_like, "preview")
        self.path = path_like

        # Per-host input feeding (core/mesh.py "multi-host").
        n_proc = jax.process_count()
        self._feed_rows = None
        if mesh is not None and n_proc > 1:
            self._feed_rows = meshlib.process_row_range(mesh, batch_size)
        shard = None
        if host_sharded_data and n_proc > 1:
            shard = (jax.process_index(), n_proc)
        w, h = image_size  # reference passes (img_width, img_height)
        if isinstance(dataset1_path, (str, os.PathLike)):
            ds_x = datalib.ImageFolderDataset(
                dataset1_path, (h, w), labeled=False, shard=shard
            )
            ds_y = datalib.ImageFolderDataset(
                dataset2_path, (h, w), labeled=False, shard=shard
            )
            self.loader = datalib.PairedDataset(ds_x, ds_y)
        else:
            self.loader = datalib.PairedDataset(dataset1_path, dataset2_path)
        self.host_sharded = getattr(self.loader.ds_x, "shard", None) is not None
        self.batch_size = batch_size
        self.mesh = mesh
        self.spatial = bool(spatial) and mesh is not None  # H-axis partitioning

        if self.spatial:
            meshlib.check_spatial_partition(
                h // 4, int(mesh.shape[meshlib.SPATIAL_AXIS]),
                "cyclegan", h,
            )
        self.cfg = steplib.CycleGANTrainConfig(
            model=modellib.CycleGANConfig(
                image_size=(h, w, 3), base_width=base_width,
                n_res_blocks=n_res_blocks, quirk_axis1=quirk_axis1, dtype=dtype,
            ),
            batch_size=batch_size,
            seed=seed,
        )
        self.chain = rnglib.KeyChain(seed)
        self.state = steplib.init_state(self.cfg)

        step_fn = steplib.make_train_step(self.cfg, mesh=mesh)
        if mesh is not None:
            self._step = dp.shard_paired_train_step(
                step_fn, mesh, spatial=self.spatial, workload="cyclegan"
            )
            self.state = dp.replicate_state(self.state, mesh)
        else:
            self._step = jax.jit(
                step_fn,
                donate_argnums=0,
                compiler_options=platformlib.tpu_compiler_options("cyclegan"),
            )
        if resident is None:
            resident = (
                self.loader.ds_x.images.nbytes + self.loader.ds_y.images.nbytes
                < 2 * 1024**3
            )
        if self.host_sharded:
            resident = False  # no host holds the full dataset to replicate
        self.resident = resident
        self._epoch_runner = (
            dp.jit_epoch_runner(
                steplib.make_epoch_runner(self.cfg, mesh=mesh, spatial=self.spatial),
                mesh, n_data=4, workload="cyclegan"
            )
            if resident
            else None
        )
        self._resident = None
        t_g, t_f = steplib.make_translators(self.cfg)
        self._translate_g = jax.jit(t_g)
        self._translate_f = jax.jit(t_f)

        self.losses = metricslib.LossHistory(
            path.join(path_like, "losses.pickle"), LOSS_KEYS
        )
        self.ckpt_manager = ckptlib.CheckpointManager(
            path.join(path_like, "checkpoints"), max_to_keep=5
        )
        # Unconditional auto-resume (CycleGAN.py:263-269).
        if self.ckpt_manager.latest_epoch() is not None:
            restored = self.ckpt_manager.restore(self.state)
            self.state = jax.tree.map(jnp.asarray, restored)
            if mesh is not None:
                self.state = dp.replicate_state(self.state, mesh)
            self.epoch = self.ckpt_manager.latest_epoch()
            if self.is_main:
                print("Latest checkpoint restored!!")
        else:
            self.epoch = 0
            if self.is_main:
                print("No checkpoints were restored!!")
        if self.is_main:
            print("Initialized CycleGAN SUCCESS!")

    # ------------------------------------------------------------- preview
    def summarize_performance(self, input_g, input_f, output_g, output_f, label):
        previewlib.translation_sheet(
            np.asarray(input_g), np.asarray(input_f),
            np.asarray(output_g), np.asarray(output_f),
            label, self.preview_output + ".pdf",
        )

    def plot_history(self) -> None:
        self.losses.plot(path.join(self.path, "plot_line_plot_loss.png"))

    def _local_state(self):
        """Host-local state for preview/translation/saving outside the mesh
        programs (see SNDCGANEngine._local_state for the rationale)."""
        if jax.process_count() > 1:
            return jax.device_get(self.state)
        return self.state

    # ---------------------------------------------------------------- train
    def train(self, epochs: int, checkpoint_frequency: int = 5) -> None:
        start_time = time()
        watch = metricslib.Stopwatch()
        profiler = metricslib.ProfilerHook(self.path, self.profile)
        last_batch_x = None
        for i in range(epochs):
            watch.epoch_start()
            profiler.maybe_start(i, 1)
            epoch_label = i + self.epoch
            if self.is_main:
                print("####### Epoch", epoch_label, "#######")

            if self.resident:
                if self._resident is None:
                    put = (
                        (lambda x: meshlib.make_replicated_global(self.mesh, x))
                        if self.mesh is not None else jax.device_put
                    )
                    self._resident = (
                        put(self.loader.ds_x.images),
                        put(self.loader.ds_y.images),
                    )
                nb = self.loader.num_batches(self.batch_size)
                rng_x = self.loader.ds_x._chain.numpy_rng("data", epoch_label)
                rng_y = self.loader.ds_y._chain.numpy_rng("data", epoch_label)
                perm_x = rng_x.permutation(len(self.loader.ds_x))[
                    : nb * self.batch_size
                ].reshape(nb, self.batch_size)
                perm_y = rng_y.permutation(len(self.loader.ds_y))[
                    : nb * self.batch_size
                ].reshape(nb, self.batch_size)
                if self.mesh is not None:
                    perm_x_dev = meshlib.make_replicated_global(
                        self.mesh, perm_x.astype(np.int32)
                    )
                    perm_y_dev = meshlib.make_replicated_global(
                        self.mesh, perm_y.astype(np.int32)
                    )
                else:
                    perm_x_dev = jnp.asarray(perm_x)
                    perm_y_dev = jnp.asarray(perm_y)
                self.state, metrics = self._epoch_runner(
                    self.state, *self._resident, perm_x_dev, perm_y_dev,
                )
                metrics = jax.device_get(metrics)
                agg = {k: float(np.mean(v)) for k, v in metrics.items()}
                last_batch_x = self.loader.ds_x.images[perm_x[-1]]
                last_batch_y = self.loader.ds_y.images[perm_y[-1]]
                n_steps = nb
            else:
                device_metrics = []
                n_steps = 0
                if self.host_sharded:
                    local_bs = self._feed_rows[1] - self._feed_rows[0]
                    it_x = self.loader.ds_x.local_epoch_batches(
                        local_bs, epoch_label
                    )
                    it_y = self.loader.ds_y.local_epoch_batches(
                        local_bs, epoch_label
                    )
                    nb_local = min(
                        self.loader.ds_x.num_local_batches(local_bs),
                        self.loader.ds_y.num_local_batches(local_bs),
                    )
                    it = ((next(it_x), next(it_y)) for _ in range(nb_local))
                else:
                    it = self.loader.epoch_batches(
                        self.batch_size, epoch_label, rows=self._feed_rows
                    )
                for batch_x, batch_y in datalib.prefetch(it, depth=2):
                    bx, by = batch_x, batch_y
                    if self.mesh is not None:
                        bx = meshlib.make_global_batch(
                            self.mesh, bx, spatial=self.spatial
                        )
                        by = meshlib.make_global_batch(
                            self.mesh, by, spatial=self.spatial
                        )
                    self.state, m = self._step(self.state, bx, by)
                    device_metrics.append(m)
                    n_steps += 1
                got = jax.device_get(device_metrics)
                agg = {k: float(np.mean([d[k] for d in got])) for k in got[0]}
                last_batch_x, last_batch_y = batch_x, batch_y

            for k in LOSS_KEYS:
                self.losses.append(**{k: agg[k]})

            profiler.maybe_stop()
            perf = watch.epoch_report(n_steps, n_steps * self.batch_size)
            if self.is_main:
                metricslib.write_metrics_jsonl(
                    path.join(self.path, "perf.jsonl"),
                    {"epoch": epoch_label, **perf},
                )
            if self.is_main:
                print(
                f">Gen losses (g/f): {agg['gen_g_loss']:.4f}/{agg['gen_f_loss']:.4f},"
                f" identity: {agg['identity_loss_g']:.4f}/{agg['identity_loss_f']:.4f},"
                f" cycle: {agg['total_cycle_loss']:.4f},"
                f" total: {agg['total_gen_g_loss']:.4f}/{agg['total_gen_f_loss']:.4f},"
                f" {perf['steps_per_sec']:.2f} steps/s,"
                f" passed time: {strftime('%H:%M:%S', gmtime(time() - start_time))}"
            )

            # Orbax saves are collective in multi-process mode: every
            # process calls save; host-side artifacts stay on process 0.
            self.ckpt_manager.save(epoch_label + 1, self.state)
            if self.is_main:
                state = self._local_state()
                # Preview: batch1 fed to BOTH generators (reference :408-409).
                bx01 = (last_batch_x[0:2].astype(np.float32) / 127.5) - 1.0
                by01 = (last_batch_y[0:2].astype(np.float32) / 127.5) - 1.0
                out_g = self._translate_g(state, jnp.asarray(bx01))
                out_f = self._translate_f(state, jnp.asarray(bx01))
                self.summarize_performance(bx01, by01, out_g, out_f, epoch_label)

                if epoch_label % checkpoint_frequency == 0:
                    ckptlib.export_params(
                        path.join(
                            self.path, "models", "generator_f",
                            f"gen_weights_f-{epoch_label}.msgpack",
                        ),
                        {"params": state.gf_params},
                    )
                    ckptlib.export_params(
                        path.join(
                            self.path, "models", "generator_g",
                            f"gen_weights_g-{epoch_label}.msgpack",
                        ),
                        {"params": state.gg_params},
                    )
                self.losses.save()
        if self.is_main:
            self.plot_history()
