"""BASELINE config 5 at its REAL shape: data-parallel(+spatial) SNDCGAN at
512x288 on the virtual 8-device CPU mesh, exactness-checked against the
single-device step at the same resolution.

This is heavy on a 1-core CPU host (two full-size compiles + full-size conv
math; conftest lowers the XLA:CPU backend optimization level to 1 for this
session — the default level needs >95 min PER compile at 512x288, level 1
~14 min, and the test checks exactness, not speed). Gated behind
IMAGEGEN_CONFIG5=1 and excluded from the default suite. Run it with:

    IMAGEGEN_CONFIG5=1 python -m pytest tests/test_config5.py -q

The per-round evidence artifact is docs/STATUS.md's config-5 section plus the
real-chip 512x288 bench entry (benchmarks/sweep.py --config5).
"""

import os

import jax
import numpy as np
import pytest

from imagegeneration_tpu.core.mesh import MeshConfig, batch_sharding, make_mesh
from imagegeneration_tpu.models.sndcgan import SNDCGANConfig
from imagegeneration_tpu.parallel.dp import replicate_state, shard_train_step
from imagegeneration_tpu.train.sndcgan_step import (
    SNDCGANTrainConfig,
    init_state,
    make_train_step,
)

pytestmark = [
    pytest.mark.skipif(
        not os.environ.get("IMAGEGEN_CONFIG5"),
        reason="config-5 full-resolution run is heavy; set IMAGEGEN_CONFIG5=1",
    ),
    pytest.mark.skipif(
        jax.device_count() < 8, reason="needs 8 virtual devices"
    ),
]

# bs4: the full-resolution f32 activations at bs8 exhausted memory in the
# XLA:CPU virtual-mesh compile on this host; 4 images (1 per data shard)
# exercises identical program structure at the real spatial shape.
H, W, B = 288, 512, 4


def test_config5_full_resolution_matches_single_device():
    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(H, W, 3), dropout_rate=0.0),
        batch_size=B,
        seed=7,
    )
    batch = np.random.default_rng(0).integers(0, 256, (B, H, W, 3), np.uint8)

    s_single = init_state(cfg)
    step_single = jax.jit(make_train_step(cfg))
    s_single, m_single = step_single(s_single, batch)

    mesh = make_mesh(MeshConfig(data=4, spatial=2))
    step_mesh = shard_train_step(
        make_train_step(cfg, mesh=mesh), mesh, spatial=True, donate_state=False
    )
    s_mesh = replicate_state(init_state(cfg), mesh)
    sharded = jax.device_put(batch, batch_sharding(mesh, spatial=True))
    s_mesh, m_mesh = step_mesh(s_mesh, sharded)

    # Step-1 exactness (same rationale as tests/test_parallel.py: the
    # partitioner-bug workaround must hold at the stretch resolution too).
    for k in m_single:
        assert float(m_single[k]) == pytest.approx(
            float(m_mesh[k]), rel=2e-4, abs=2e-5
        ), k
    a = np.asarray(s_single.g_params["stem"]["Dense_0"]["kernel"])
    b = np.asarray(s_mesh.g_params["stem"]["Dense_0"]["kernel"])
    assert np.max(np.abs(a - b)) < 1e-5
    assert s_mesh.d_params["conv0"]["Conv_0"][
        "kernel"
    ].sharding.is_fully_replicated
