"""End-to-end CLI tests on tiny synthetic datasets (CPU): online
adaptation (stats.csv/series.csv artifacts), continual adaptation
(overall.csv, saved weights), offline training (checkpoints + resume),
and the headless demo loop."""

import json
import os
import queue

import numpy as np
import pytest

rng = np.random.default_rng(7)
H, W = 64, 96


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    import cv2

    tmp_path = tmp_path_factory.mktemp("ds")
    lines = []
    base = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    for i in range(3):
        left = np.roll(base, i, axis=0)
        right = np.roll(left, -3, axis=1)
        gt = np.full((H, W), 3.0, np.float32)
        lp, rp_, gp = (
            str(tmp_path / f"l{i}.png"),
            str(tmp_path / f"r{i}.png"),
            str(tmp_path / f"g{i}.png"),
        )
        cv2.imwrite(lp, left[..., ::-1])
        cv2.imwrite(rp_, right[..., ::-1])
        cv2.imwrite(gp, (gt * 256).astype(np.uint16))
        lines.append(f"{lp},{rp_},{gp},{gp}")
    lf = tmp_path / "list.csv"
    lf.write_text("\n".join(lines) + "\n")
    return str(lf)


@pytest.fixture(scope="module")
def initial_weights(tmp_path_factory):
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import save_params

    tmp = tmp_path_factory.mktemp("w")
    model = get_stereo_net("MADNet")
    params = model.init(jax.random.PRNGKey(1))
    path = str(tmp / "init.npz")
    save_params(path, params)
    return path


def test_adapt_cli_mad(tiny_dataset, initial_weights, tmp_path):
    from real_time_self_adaptive_deep_stereo_tpu.cli import adapt

    out = str(tmp_path / "out")
    args = adapt.build_argparser().parse_args(
        [
            "-l", tiny_dataset,
            "-o", out,
            "--weights", initial_weights,
            "--modelName", "MADNet",
            "--blockConfig", "block_config/MadNet_full.json",
            "--mode", "MAD",
            "--imageShape", str(H), str(W),
            "--sampleMode", "SEQUENTIAL",
            "--corrMode", "jnp",
            "--logDispStep", "2",
            "--seed", "0",
        ]
    )
    os.makedirs(out, exist_ok=True)
    result = adapt.main(args)
    assert np.isfinite(result["avg_epe"])
    stats = open(os.path.join(out, "stats.csv")).read()
    assert stats.startswith("Metrics,cumulative,average")
    assert "FPS," in stats and "#resets," in stats
    series = open(os.path.join(out, "series.csv")).read().strip().splitlines()
    assert series[0] == "Iteration,Time,EPE,bad3" and len(series) == 4
    assert os.path.exists(os.path.join(out, "disparities", "disparity_0.png"))


def test_adapt_cli_fused_emits_artifacts(tiny_dataset, initial_weights, tmp_path):
    """Explicit --sessionMode fused + --logDispStep must still dump the
    per-stride disparity PNGs (round-1 gap: they were silently skipped)."""
    from real_time_self_adaptive_deep_stereo_tpu.cli import adapt

    out = str(tmp_path / "outf")
    args = adapt.build_argparser().parse_args(
        [
            "-l", tiny_dataset,
            "-o", out,
            "--weights", initial_weights,
            "--modelName", "MADNet",
            "--blockConfig", "block_config/MadNet_full.json",
            "--mode", "MAD",
            "--imageShape", str(H), str(W),
            "--sampleMode", "SEQUENTIAL",
            "--corrMode", "jnp",
            "--sessionMode", "fused",
            "--logDispStep", "2",
            "--seed", "0",
        ]
    )
    os.makedirs(out, exist_ok=True)
    result = adapt.main(args)
    assert np.isfinite(result["avg_epe"])
    assert os.path.exists(os.path.join(out, "disparities", "disparity_0.png"))
    assert os.path.exists(os.path.join(out, "disparities", "disparity_2.png"))


def test_adapt_continual_cli(tiny_dataset, initial_weights, tmp_path):
    from real_time_self_adaptive_deep_stereo_tpu.cli import adapt_continual

    out = str(tmp_path / "outc")
    args = adapt_continual.build_argparser().parse_args(
        [
            "-l", tiny_dataset,
            "-o", out,
            "--weights", initial_weights,
            "--modelName", "MADNet",
            "--blockConfig", "block_config/MadNet_full.json",
            "--mode", "MAD",
            "--imageShape", str(H), str(W),
            "--sampleMode", "SEQUENTIAL",
            "--corrMode", "jnp",
            "--saveWeights",
            "--seed", "0",
        ]
    )
    os.makedirs(out, exist_ok=True)
    result = adapt_continual.main(args)
    assert np.isfinite(result["avg_d1"])
    overall = open(os.path.join(out, "overall.csv")).read()
    assert overall.startswith("EPE\tD1")
    assert os.path.isdir(os.path.join(out, "weights"))
    assert open(os.path.join(out, "histogram.csv")).read().startswith("Histogram")


def test_train_cli_and_resume(tiny_dataset, tmp_path):
    from real_time_self_adaptive_deep_stereo_tpu.cli import train
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import (
        latest_checkpoint,
    )

    out = str(tmp_path / "outt")
    argv = [
        "--trainingSet", tiny_dataset,
        "-o", out,
        "--modelName", "MADNet",
        "--imageShape", "32", "48",
        "--batchSize", "1",
        "--numEpochs", "2",
        "--corrMode", "jnp",
        "--maxSteps", "3",
        "--ckptEvery", "2",
    ]
    args = train.build_argparser().parse_args(argv)
    os.makedirs(out, exist_ok=True)
    res = train.main(args)
    assert np.isfinite(res["final_loss"])
    path, step = latest_checkpoint(out)
    assert step >= 2
    # resume continues from the saved step
    res2 = train.main(train.build_argparser().parse_args(argv))
    assert res2["steps"] >= step


def test_demo_headless(tiny_dataset, initial_weights, tmp_path):
    from real_time_self_adaptive_deep_stereo_tpu.cli import demo

    out = str(tmp_path / "demo_out")
    os.makedirs(out, exist_ok=True)
    args = demo.build_argparser().parse_args(
        [
            "--weights", initial_weights,
            "--blockConfig", "block_config/MadNet_full.json",
            "--mode", "MAD",
            "--camera", "folder",
            "--list", tiny_dataset,
            "--display", "none",
            "--outDir", out,
            "--imageShape", str(H), str(W),
            "--cropShape", str(H), str(W),
            "--maxFrames", "3",
            "--seed", "0",
        ]
    )
    fps = demo.main(args)
    assert fps > 0
    assert len(os.listdir(out)) >= 1
