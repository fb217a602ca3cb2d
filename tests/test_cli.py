"""CLI signature parity tests: the reference invocations must parse
identically (SURVEY.md §2 #7, #14, #21 and eval CLIs)."""

from imagegeneration_tpu.cli.cyclegan_evaluation import build_parser as pd_parser
from imagegeneration_tpu.cli.cyclegan_trainer import build_parser as cyc_parser
from imagegeneration_tpu.cli.generator_evaluation import build_parser as fid_parser
from imagegeneration_tpu.cli.generator_output import build_parser as out_parser
from imagegeneration_tpu.cli.sndcgan_trainer import build_parser as sn_parser
from imagegeneration_tpu.cli.wgan_trainer import build_parser as wg_parser


def test_sndcgan_trainer_reference_signature():
    """sndcgan/Trainer.py:10-37 flags."""
    args = sn_parser().parse_args(
        "32 100 -cf 5 -d out -x data -r 0.5 -ld 0.0002 -lg 0.0002 -lo live -ct".split()
    )
    assert args.bSize == 32 and args.epochs == 100
    assert args.ckptFreq == 5 and args.dirPath == "out" and args.data == "data"
    assert args.dropout == 0.5 and args.learnRateDisc == 2e-4
    assert args.liveOutput == "live" and args.continue_ is True
    # defaults
    d = sn_parser().parse_args(["4", "1"])
    assert (d.dirPath, d.data, d.dropout, d.ckptFreq) == ("training", "dataset", 0.5, 5)
    assert (d.height, d.width, d.z_size) == (144, 256, 128)


def test_wgan_trainer_reference_signature():
    """wasserstein_gan/Trainer.py:34-51 flags + hardcoded quirks."""
    args = wg_parser().parse_args("16 50 -d wout -c 10 -ct".split())
    assert args.bSize == 16 and args.epochs == 50
    assert args.path == "wout" and args.chps == 10 and args.continue_
    d = wg_parser().parse_args(["4", "1"])
    assert d.data == "bilderNeuro"  # faithful hardcoded default
    assert d.n_critic == 5 and (d.height, d.width) == (144, 256)


def test_cyclegan_trainer_reference_signature():
    """cyclegan/Trainer.py:7-27 flags."""
    args = cyc_parser().parse_args("1 200 -x dogs -y cats -d cout -c 5 -ct".split())
    assert args.bSize == 1 and args.epochs == 200
    assert args.dataset1 == "dogs" and args.dataset2 == "cats"
    assert args.path == "cout" and args.chps == 5
    d = cyc_parser().parse_args(["1", "1"])
    assert (d.dataset1, d.dataset2) == ("x_data", "y_data")
    assert (d.height, d.width) == (128, 128)


def test_generator_output_reference_signature():
    """sndcgan/generator_output.py:103-115 flags."""
    args = out_parser().parse_args("5 -b 3 -d tr -o img -s 10".split())
    assert args.every == 5 and args.bSize == 3
    assert args.dirPath == "tr" and args.output == "img" and args.start == 10


def test_generator_evaluation_reference_signature():
    """sndcgan/generator_evaluation.py:248-265 flags."""
    args = fid_parser().parse_args(
        "95 -b 32 -d tr -o out -x data -st 2 -se 5 -ct".split()
    )
    assert args.discEpoch == 95 and args.bSize == 32
    assert args.dirPath == "tr" and args.output == "out" and args.data == "data"
    assert args.stepSize == 2 and args.start == 5 and args.continue_


def test_cyclegan_evaluation_reference_signature():
    """cyclegan/generator_evaluation.py:143-154 flags."""
    args = pd_parser().parse_args("gens samples -s 64 -o out".split())
    assert args.generators == "gens" and args.samples == "samples"
    assert args.sampleSize == 64 and args.output == "out"
