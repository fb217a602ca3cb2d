"""Generate a structured synthetic landscape dataset for training-health
validation runs (the reference's Open Images landscape subset is not
fetchable from this zero-egress environment).

Each image: vertical sky gradient (randomized hue/brightness), a horizon
line at a random height, textured ground below it, and an optional sun
disk — enough low-frequency structure that a working GAN visibly learns
composition (sky band / ground / sun) and FID trends are meaningful, while
remaining fully reproducible from a seed.

Usage:
  python benchmarks/synth_landscapes.py --out /tmp/synth_data --n 2000 \
      --height 144 --width 256 [--seed 9]
Writes <out>/landscape/img_00000.png ... (labeled-subdir layout for the
SNDCGAN pipeline's labeled image_dataset_from_directory semantics).
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def make_landscape(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    horizon = int(h * rng.uniform(0.35, 0.7))
    img = np.zeros((h, w, 3), np.float32)

    # sky: vertical gradient between two random sky-ish colors
    top = np.array([rng.uniform(0.3, 0.7), rng.uniform(0.5, 0.8),
                    rng.uniform(0.8, 1.0)])
    bot = np.array([rng.uniform(0.6, 1.0), rng.uniform(0.7, 1.0),
                    rng.uniform(0.8, 1.0)])
    t = np.linspace(0, 1, horizon)[:, None, None]
    img[:horizon] = (1 - t) * top + t * bot

    # ground: darker base color + value-noise texture
    base = np.array([rng.uniform(0.1, 0.4), rng.uniform(0.3, 0.6),
                     rng.uniform(0.05, 0.3)])
    # ceil-divide the coarse grid so kron always covers the full ground band
    # (floor rounded (h - horizon)=50 down to 48 rows and broke broadcast)
    coarse = rng.normal(0, 1, (max(2, -((h - horizon) // -8)), max(2, -(w // -8))))
    reps = (8, 8)
    tex = np.kron(coarse, np.ones(reps))[: h - horizon, :w]
    img[horizon:] = base + 0.08 * tex[..., None]

    # optional sun disk in the sky
    if rng.uniform() < 0.7 and horizon > 10:
        cy = rng.integers(2, max(3, horizon - 5))
        cx = rng.integers(5, w - 5)
        r = rng.integers(3, max(4, h // 12))
        yy, xx = np.mgrid[:h, :w]
        disk = ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r
        img[disk] = np.array([1.0, 0.95, rng.uniform(0.5, 0.85)])

    # slight global noise
    img += rng.normal(0, 0.01, img.shape)
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", required=True)
    p.add_argument("--n", type=int, default=2000)
    p.add_argument("--height", type=int, default=144)
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--seed", type=int, default=9)
    args = p.parse_args()

    from PIL import Image

    out = Path(args.out) / "landscape"
    out.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        Image.fromarray(
            make_landscape(rng, args.height, args.width)
        ).save(out / f"img_{i:05d}.png")
    print(f"wrote {args.n} images to {out}")


if __name__ == "__main__":
    main()
