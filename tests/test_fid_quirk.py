"""FID range-mismatch bug-compat flag (quirk_range_mismatch).

The reference's FID pipeline feeds the discriminator FAKE images in [0,1]
(create_samples denormalizes, sndcgan/generator_output.py:25-28) but REAL
images in [-1,1] (sndcgan/generator_evaluation.py:163-176). Our evaluator
corrects this by default; `quirk_range_mismatch=True` must reproduce the
reference's pipeline exactly — asserted here against an independent
reimplementation of the reference's formula (generator_evaluation.py:36-55)
on the same pinned batches/z."""

import numpy as np
import pytest

import jax.numpy as jnp

from imagegeneration_tpu.core.checkpoint import export_params
from imagegeneration_tpu.core.data import ImageFolderDataset
from imagegeneration_tpu.core import rng as rnglib
from imagegeneration_tpu.evalx.fid import FIDEvaluator
from imagegeneration_tpu.models.sndcgan import SNDCGANConfig, make_models
from imagegeneration_tpu.train.sndcgan_step import SNDCGANTrainConfig, init_state

H, W = 64, 80  # smallest shape with an 8x8 avg-pool window after 3 stride-2s


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    """Scaffold a training dir: epoch exports + a tiny labeled dataset."""
    root = tmp_path_factory.mktemp("fidquirk")
    data = root / "data" / "landscape"
    data.mkdir(parents=True)
    rng = np.random.default_rng(5)
    from PIL import Image

    for i in range(8):
        Image.fromarray(
            rng.integers(0, 256, (H, W, 3), dtype=np.uint8)
        ).save(data / f"i{i}.png")

    cfg = SNDCGANTrainConfig(
        model=SNDCGANConfig(image_size=(H, W, 3), dropout_rate=0.0),
        batch_size=4,
    )
    state = init_state(cfg)
    gdir = root / "train" / "models" / "generator"
    ddir = root / "train" / "models" / "discriminator"
    gdir.mkdir(parents=True)
    ddir.mkdir(parents=True)
    export_params(
        gdir / "gen_model-1.msgpack",
        {"params": state.g_params, "batch_stats": state.g_batch_stats},
    )
    export_params(
        ddir / "disc_model-1.msgpack",
        {"params": state.d_params, "spectral": state.d_spectral},
    )
    return root


def _evaluate(run_dir, out_name, quirk):
    ev = FIDEvaluator(
        str(run_dir / "train"),
        str(run_dir / out_name),
        image_size=(H, W, 3),
        dropout=0.0,
        sqrtm_method="scipy",  # the reference's exact formula path
        quirk_range_mismatch=quirk,
    )
    ds = ImageFolderDataset(str(run_dir / "data"), (H, W), labeled=True)
    results = ev.evaluate(dataset=ds, batch_size=4, start_epoch=0)
    return ev, results


def test_quirk_changes_fid_and_matches_reference_formula(run_dir):
    ev_off, res_off = _evaluate(run_dir, "eval_off", quirk=False)
    ev_on, res_on = _evaluate(run_dir, "eval_on", quirk=True)
    fids_off = np.asarray(res_off[1])
    fids_on = np.asarray(res_on[1])
    # The range mismatch is a real bias: values must differ.
    assert not np.allclose(fids_off, fids_on, rtol=1e-3)

    # Independent reimplementation of the reference pipeline
    # (generator_evaluation.py:155-184 + :36-55) on the same pinned state.
    import scipy.linalg

    init = ev_on.load_init()
    feat_fn = ev_on._load_disc_features_fn(init["disc_epoch"])
    gen_fn = ev_on._load_gen(1)
    expected = []
    for z, real in zip(init["random_z_used"], init["img_real_used"]):
        fake01 = (gen_fn(z) + 1.0) / 2.0  # create_samples output range
        ff = feat_fn(fake01)
        rf = feat_fn(real)  # reals stay [-1,1] — the reference's mismatch
        mu_f, cov_f = ff.mean(axis=0), np.cov(ff, rowvar=False)
        mu_r, cov_r = rf.mean(axis=0), np.cov(rf, rowvar=False)
        ssdiff = np.sum((mu_f - mu_r) ** 2)
        covmean = scipy.linalg.sqrtm(cov_f.dot(cov_r))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
        expected.append(
            float(ssdiff + np.trace(cov_f + cov_r - 2.0 * covmean))
        )
    np.testing.assert_allclose(fids_on, expected, rtol=2e-3)
