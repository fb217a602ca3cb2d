"""Loss-history store, loss plots and step timing/throughput metrics.

Pickle-compatible with the reference's artifacts: SNDCGAN losses.pickle keys
{"epoch","avg_g_loss","avg_d_loss","d_real","d_fake"} (sndcgan/SNDCGAN.py:179),
WGAN stats.pickle {"c1_hist","c2_hist","g_hist"} (WGAN.py:284-286), CycleGAN
losses.pickle with 7 keys (CycleGAN.py:246-248). Loss curves are rendered the
same way (matplotlib line plot of every key, "plot_line_plot_loss.png").

Adds what the reference lacks (SURVEY.md §5 tracing): per-epoch wall-clock,
steps/sec and images/sec, emitted from host 0, plus optional jax.profiler
trace capture around a step window.
"""

from __future__ import annotations

import json
import pickle
import time
from pathlib import Path
from typing import Any

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt


class LossHistory:
    """Append-mostly dict-of-lists with pickle load/save (reference format)."""

    def __init__(self, path: str | Path, keys: tuple[str, ...]):
        self.path = Path(path)
        self.keys = keys
        if self.path.exists():
            with open(self.path, "rb") as f:
                data = pickle.load(f)
            self.data = data if isinstance(data, dict) else {}
        else:
            self.data = {}
        for k in keys:
            self.data.setdefault(k, [])

    def append(self, **values: Any) -> None:
        for k, v in values.items():
            self.data.setdefault(k, []).append(v)

    def extend(self, other: dict[str, list]) -> None:
        for k, v in other.items():
            self.data.setdefault(k, []).extend(v)

    def save(self) -> None:
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with open(self.path, "wb") as f:
            pickle.dump(self.data, f)

    def plot(self, out_path: str | Path, skip_keys: tuple[str, ...] = ("epoch",)):
        """Line plot of every tracked series (sndcgan/SNDCGAN.py:216-225)."""
        plt.clf()
        for key, val in self.data.items():
            if key in skip_keys or not len(val):
                continue
            plt.plot(val, label=key)
        plt.legend()
        Path(out_path).parent.mkdir(parents=True, exist_ok=True)
        plt.savefig(out_path)
        plt.close()


class Stopwatch:
    """Per-epoch timing + throughput; the tracing the reference never had."""

    def __init__(self) -> None:
        self.start = time.time()
        self._epoch_start = self.start

    def epoch_start(self) -> None:
        self._epoch_start = time.time()

    def epoch_report(self, steps: int, images: int) -> dict[str, float]:
        dt = max(time.time() - self._epoch_start, 1e-9)
        return {
            "epoch_seconds": dt,
            "steps_per_sec": steps / dt,
            "images_per_sec": images / dt,
            "total_seconds": time.time() - self.start,
        }


class ProfilerHook:
    """jax.profiler trace capture around a step window (SURVEY.md §5: the
    reference has no tracing at all). Captures epoch `start_epoch + 1` — the
    first post-compile epoch — into <outdir>/traces for xprof/tensorboard."""

    def __init__(self, out_dir: str | Path, enabled: bool = False):
        self.out_dir = str(Path(out_dir) / "traces")
        self.enabled = enabled
        self._active = False

    def maybe_start(self, epoch: int, first_real_epoch: int) -> None:
        if self.enabled and not self._active and epoch == first_real_epoch:
            import jax

            Path(self.out_dir).mkdir(parents=True, exist_ok=True)
            jax.profiler.start_trace(self.out_dir)
            self._active = True

    def maybe_stop(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self.enabled = False
            print(f"profiler trace written to {self.out_dir}")


def write_metrics_jsonl(path: str | Path, record: dict) -> None:
    p = Path(path)
    p.parent.mkdir(parents=True, exist_ok=True)
    with open(p, "a") as f:
        f.write(json.dumps(record) + "\n")
