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


def test_adapt_cli_fused_chunked(tiny_dataset, initial_weights, tmp_path):
    """--chunk K (fused throughput mode) scans K frames per dispatch:
    same stats.csv/series.csv artifacts, same metric series as the
    per-frame fused run (identical trajectory by construction)."""
    from real_time_self_adaptive_deep_stereo_tpu.cli import adapt

    def run(out, extra):
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
                "--seed", "0",
            ]
            + extra
        )
        os.makedirs(out, exist_ok=True)
        return adapt.main(args)

    plain = run(str(tmp_path / "plain"), [])
    # 3 dataset frames, K=2: one chunked dispatch + one per-frame tail
    chunked = run(str(tmp_path / "chunked"), ["--chunk", "2"])
    assert np.isfinite(chunked["avg_epe"])
    np.testing.assert_allclose(chunked["avg_epe"], plain["avg_epe"], rtol=1e-5)
    np.testing.assert_allclose(chunked["avg_d1"], plain["avg_d1"], rtol=1e-5)
    series = (
        open(os.path.join(str(tmp_path / "chunked"), "series.csv"))
        .read().strip().splitlines()
    )
    assert len(series) == 4  # header + 3 frames


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


def test_adapt_continual_fused_host_parity(tiny_dataset, initial_weights, tmp_path):
    """Fused and host session modes of the continual CLI must produce the
    same trajectory for the two round-4 regression cases: FIXED with a
    multi-id list (the CLI passed only fixedID[0] to the fused session)
    and FULL with --dilation (the fused step ignored the gate). Reference
    semantics: Sampler/sampler_factory.py:23-37,
    Stereo_Continual_Adaptation.py:212-213."""
    import ast

    from real_time_self_adaptive_deep_stereo_tpu.cli import adapt_continual

    def run(out, extra):
        args = adapt_continual.build_argparser().parse_args(
            [
                "-l", tiny_dataset,
                "-o", out,
                "--weights", initial_weights,
                "--modelName", "MADNet",
                "--blockConfig", "block_config/MadNet_full.json",
                "--imageShape", str(H), str(W),
                "--corrMode", "jnp",
                "--seed", "0",
            ]
            + extra
        )
        os.makedirs(out, exist_ok=True)
        return adapt_continual.main(args)

    cases = {
        "fixed": ["--mode", "MAD", "--sampleMode", "FIXED", "--fixedID", "2", "3"],
        "fulldil": ["--mode", "FULL", "--dilation", "2"],
    }
    for tag, extra in cases.items():
        h = run(str(tmp_path / f"{tag}_host"), extra + ["--sessionMode", "host"])
        f = run(str(tmp_path / f"{tag}_fused"), extra + ["--sessionMode", "fused"])
        np.testing.assert_allclose(f["avg_epe"], h["avg_epe"], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(f["avg_d1"], h["avg_d1"], rtol=1e-4, atol=1e-4)

    # the fused FIXED run must have fetched exactly blocks 2 and 3
    hist = open(str(tmp_path / "fixed_fused" / "histogram.csv")).read().splitlines()
    counts = ast.literal_eval(hist[-1])
    assert [i for i, c in enumerate(counts) if c > 0] == [2, 3]


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


@pytest.mark.parametrize("session_mode", ["fused", "host"])
def test_demo_headless(tiny_dataset, initial_weights, tmp_path, session_mode):
    """Headless demo in both serving shapes: fused (the shipped depth-1
    pipelined f16 consumer) and host (reference-style blocking fetch).
    Every input frame must yield a disparity PNG in both modes."""
    from real_time_self_adaptive_deep_stereo_tpu.cli import demo

    out = str(tmp_path / f"demo_out_{session_mode}")
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
            "--sessionMode", session_mode,
        ]
    )
    fps = demo.main(args)
    assert fps > 0
    assert len([f for f in os.listdir(out) if f.endswith(".png")]) == 3


def test_kitti_eval_tool(initial_weights, tmp_path):
    """tools/kitti_eval.py end-to-end on a synthetic KITTI-raw layout:
    CSV list construction (missing-GT frames dropped), per-sequence
    adaptation run, and the combined kitti_table.csv — the real-data
    protocol runner (Stereo_Continual_Adaptation.py:244-249,
    README.MD:46-63), exercised minus only the real download."""
    import importlib.util

    import cv2

    spec = importlib.util.spec_from_file_location(
        "kitti_eval", os.path.join(os.getcwd(), "tools", "kitti_eval.py")
    )
    kitti_eval = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(kitti_eval)

    # synthetic KITTI checkout: one date dir, one drive, 4 frames,
    # frame 3 lacking GT (must be dropped like KITTI's sparse LiDAR GT)
    drive = "2011_09_26_drive_0005_sync"
    ddir = tmp_path / "raw" / "2011_09_26" / drive
    gdir = tmp_path / "gt" / drive
    for d in (ddir / "image_02" / "data", ddir / "image_03" / "data", gdir):
        os.makedirs(d)
    base = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    for i in range(4):
        left = np.roll(base, i, axis=0)
        right = np.roll(left, -3, axis=1)
        name = f"{i:010d}.png"
        cv2.imwrite(str(ddir / "image_02" / "data" / name), left[..., ::-1])
        cv2.imwrite(str(ddir / "image_03" / "data" / name), right[..., ::-1])
        if i != 3:
            gt16 = (np.full((H, W), 3.0, np.float32) * 256).astype(np.uint16)
            cv2.imwrite(str(gdir / name), gt16)

    out = str(tmp_path / "kout")
    args = kitti_eval.build_argparser().parse_args(
        [
            "--kittiRoot", str(tmp_path / "raw"),
            "--gtRoot", str(tmp_path / "gt"),
            "--weights", initial_weights,
            "--sequences", f"city={drive}",
            "--output", out,
            "--mode", "MAD",
            "--blockConfig", "block_config/MadNet_full.json",
            "--imageShape", str(H), str(W),
            "--seed", "0",
        ]
    )
    results = kitti_eval.main(args)
    assert len(results) == 1 and results[0]["frames"] == 3  # GT-less frame dropped
    assert np.isfinite(results[0]["avg_d1"]) and np.isfinite(results[0]["avg_epe"])
    table = open(os.path.join(out, "kitti_table.csv")).read().splitlines()
    assert table[0].startswith("sequence,mode,frames,avg_d1")
    assert table[1].startswith("city,MAD,3,")


def test_evaluate_cli_batched(tiny_dataset, initial_weights, tmp_path):
    """Batched offline evaluation: per-frame metrics must be identical
    to the batch-1 run (batching is semantically free on the
    no-feedback path), the eval remainder (3 frames at batch 2) must be
    padded+trimmed not dropped, and the adapt-NONE artifact set must be
    emitted."""
    from real_time_self_adaptive_deep_stereo_tpu.cli import evaluate
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import set_conv_precision

    results = {}
    try:
        for batch in (1, 2):
            out = str(tmp_path / f"ev{batch}")
            args = evaluate.build_argparser().parse_args(
                [
                    "-l", tiny_dataset,
                    "-o", out,
                    "--weights", initial_weights,
                    "--modelName", "MADNet",
                    "--imageShape", str(H), str(W),
                    "--batch", str(batch),
                    "--corrMode", "jnp",
                    "--precision", "default",
                    "--logDispStep", "2",
                ]
            )
            os.makedirs(out, exist_ok=True)
            results[batch] = (evaluate.main(args), out)
    finally:
        set_conv_precision("default")

    r1, out1 = results[1]
    r2, out2 = results[2]
    assert np.isfinite(r1["avg_epe"]) and np.isfinite(r2["avg_d1"])
    series1 = open(os.path.join(out1, "series.csv")).read().splitlines()
    series2 = open(os.path.join(out2, "series.csv")).read().splitlines()
    assert len(series1) == len(series2) == 4  # header + all 3 frames
    for l1, l2 in zip(series1[1:], series2[1:]):
        epe1, bad31 = float(l1.split(",")[2]), float(l1.split(",")[3])
        epe2, bad32 = float(l2.split(",")[2]), float(l2.split(",")[3])
        np.testing.assert_allclose(epe1, epe2, rtol=1e-5)
        np.testing.assert_allclose(bad31, bad32, rtol=1e-5)
    assert open(os.path.join(out2, "stats.csv")).read().startswith(
        "Metrics,cumulative,average"
    )
    assert os.path.exists(os.path.join(out2, "disparities", "disparity_0.png"))
    assert os.path.exists(os.path.join(out2, "disparities", "disparity_2.png"))


@pytest.mark.quick
def test_cli_argparser_surfaces_quick():
    """Quick-tier smoke for the CLI subsystem: every entry point builds
    its parser and accepts its reference-compatible flag set (no model
    compiles; real runs are covered by the full-tier tests above)."""
    from real_time_self_adaptive_deep_stereo_tpu.cli import (
        adapt,
        adapt_continual,
        demo,
        evaluate,
        train,
    )

    base = ["-l", "list.csv", "-o", "/tmp/o", "--weights", "w.npz",
            "--blockConfig", "block_config/MadNet_full.json"]
    a = adapt.build_argparser().parse_args(
        base + ["--mode", "MAD", "--sampleMode", "FIXED",
                "--fixedID", "1", "4", "--numBlocks", "2"]
    )
    assert a.fixedID == [1, 4] and a.numBlocks == 2
    c = adapt_continual.build_argparser().parse_args(base + ["--dilation", "2"])
    assert c.dilation == 2
    t = train.build_argparser().parse_args(
        ["--trainingSet", "list.csv", "-o", "/tmp/o"]
    )
    assert t.lr > 0
    d = demo.build_argparser().parse_args(
        ["--weights", "w.npz", "--blockConfig",
         "block_config/MadNet_full.json", "--camera", "folder"]
    )
    assert d.camera == "folder" and d.SSIMTh == 0.5
    e = evaluate.build_argparser().parse_args(
        ["-l", "list.csv", "-o", "/tmp/o", "--weights", "w.npz", "--batch", "8"]
    )
    assert e.batch == 8 and e.precision == "bf16_act"
