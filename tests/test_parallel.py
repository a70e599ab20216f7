"""Multi-device sharding tests on the 8-device virtual CPU mesh:
data-parallel training equivalence and spatial (width) sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
from real_time_self_adaptive_deep_stereo_tpu.parallel import (
    batch_sharded,
    make_dp_train_step,
    make_mesh,
    make_spatial_adapt_step,
    shard_batch,
    width_sharded,
)
from real_time_self_adaptive_deep_stereo_tpu.utils import optim

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

rng = np.random.default_rng(0)
H, W = 64, 128


def _batch(n):
    return {
        "left": rng.random((n, H, W, 3)).astype(np.float32) * 255,
        "right": rng.random((n, H, W, 3)).astype(np.float32) * 255,
        "target": rng.random((n, H, W, 1)).astype(np.float32) * 60,
    }


@pytest.fixture(scope="module")
def model_and_params():
    model = get_stereo_net("MADNet", corr_mode="jnp")
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_dp_train_step_runs_and_matches_single_device(model_and_params):
    model, params = model_and_params
    batch = _batch(8)

    mesh = make_mesh(8)
    step = make_dp_train_step(model, mesh, lr=1e-4)
    sharded = shard_batch(batch, batch_sharded(mesh))
    p_multi, _, loss_multi = step(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        optim.adam_init(params),
        sharded,
    )

    mesh1 = make_mesh(1)
    step1 = make_dp_train_step(model, mesh1, lr=1e-4)
    p_single, _, loss_single = step1(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        optim.adam_init(params),
        shard_batch(batch, batch_sharded(mesh1)),
    )

    np.testing.assert_allclose(float(loss_multi), float(loss_single), rtol=1e-4)
    a = np.asarray(p_multi["pyramid"]["conv1"]["w"])
    b = np.asarray(p_single["pyramid"]["conv1"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-6)


def test_spatial_adapt_step_matches_unsharded(model_and_params):
    model, params = model_and_params
    frame = _batch(1)

    mesh = make_mesh(8)
    sstep = make_spatial_adapt_step(model, mesh, lr=1e-4)
    p_sp, _, loss_sp = sstep(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        optim.momentum_init(params),
        shard_batch(frame, width_sharded(mesh)),
    )

    mesh1 = make_mesh(1)
    s1 = make_spatial_adapt_step(model, mesh1, lr=1e-4)
    p_1, _, loss_1 = s1(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        optim.momentum_init(params),
        shard_batch(frame, width_sharded(mesh1)),
    )
    np.testing.assert_allclose(float(loss_sp), float(loss_1), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(p_sp["pyramid"]["conv1"]["w"]),
        np.asarray(p_1["pyramid"]["conv1"]["w"]),
        rtol=1e-3,
        atol=1e-6,
    )


def test_graft_dryrun_multichip():
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_spatial_step_collective_audit(model_and_params):
    """HLO-level audit of the width-sharded adaptation step: the conv
    pipeline must be partitioned with bounded halo exchanges
    (collective-permute), NEVER by all-gathering the full width.

    Measured profile on the 8-device mesh (this test pins it):
    - convs: collective-permute halos only (hundreds of them, one per
      conv edge per direction) — zero conv-attributed all-gathers;
    - TF1-legacy resize (dense [out_w,in_w] einsum, ops/resize.py):
      GSPMD keeps the dot shard-local over the contracted (sharded)
      input width and all-reduces the *output* — for disparity maps
      (C=1) that is a tiny [1,H,1,W_out] tensor, NOT a frame
      replication (the concern raised in round 2's review);
    - the only all-gathers are the dynamic-disparity warps
      (take_along_axis and its scatter-add VJP): a W-gather by an
      unbounded dynamic index fundamentally needs the full source
      width unless disparity-bound halos are hand-written with
      shard_map. Their total traffic is small (feature maps at pyramid
      levels, ~a few MB/step at full res, ~100us-class on ICI vs a
      multi-ms step) — documented ceiling, not a perf bug.
    """
    model, params = model_and_params
    # realistic proportions matter: every level's halo (3x3 convs, the
    # context net's dilation-16) must fit inside one shard's width or
    # GSPMD rightfully falls back to all-gather. 192x640/8 shards keeps
    # the quarter-res context net at shard width 20 > halo 16 (at the
    # tiny 64x128 equivalence-test size the audit would false-positive).
    Ha, Wa = 192, 640
    frame = {
        "left": rng.random((1, Ha, Wa, 3)).astype(np.float32) * 255,
        "right": rng.random((1, Ha, Wa, 3)).astype(np.float32) * 255,
        "target": rng.random((1, Ha, Wa, 1)).astype(np.float32) * 60,
    }
    mesh = make_mesh(8)
    step = make_spatial_adapt_step(model, mesh, lr=1e-4)
    lowered = step.lower(
        params, optim.momentum_init(params), shard_batch(frame, width_sharded(mesh))
    )
    txt = lowered.compile().as_text()

    import re

    # halo exchange is present on the conv path
    assert txt.count("collective-permute(") > 50

    gathers = [
        ln for ln in txt.splitlines() if re.search(r"= \S+ all-gather\(", ln)
    ]
    for ln in gathers:
        m = re.search(r'metadata={op_name="([^"]*)"', ln)
        src = m.group(1) if m else ""
        # every all-gather must come from a dynamic-index warp (gather /
        # scatter-add VJP) or the final W-resize of the C=1 disparity —
        # NEVER from a convolution
        assert "conv" not in src.lower(), f"conv all-gathered full width: {ln[:160]}"
        assert (
            "take_along_axis" in src or "bhwc,wo->bhco" in src
        ), f"unexpected all-gather source {src!r}: {ln[:160]}"
    # the count is structural (5 warp levels + 2 scatter-add VJPs + 1
    # disparity resize); allow slack for XLA version drift but flag a
    # regression to frame replication
    assert len(gathers) <= 12, f"{len(gathers)} all-gathers (expected ~8)"


def test_mad_fused_step_under_mesh_matches_single_device(model_and_params):
    """The flagship fused MAD step (lax.switch + subtree update + reward
    controller) compiled under GSPMD with the frame width-sharded must
    reproduce the single-device trajectory."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    model = get_stereo_net("MADNet", bulkhead=True, corr_mode="jnp")
    params = model.init(jax.random.PRNGKey(0))
    blocks = make_blocks(
        load_block_config("block_config/MadNet_full.json"), model.layer_to_path
    )
    engine = AdaptationEngine(model, blocks, lr=1e-4)
    frames = [_batch(1) for _ in range(3)]

    def run(mesh):
        sess = FusedOnlineSession(
            engine,
            jax.tree_util.tree_map(lambda x: x.copy(), params),
            mode="MAD",
            sample_mode="SEQUENTIAL",
            max_steps=8,
            seed=0,
            mesh=mesh,
        )
        sh = width_sharded(mesh)
        for f in frames:
            sess.step(shard_batch(f, sh))
        return sess.finalize(), sess.current_params()

    host_multi, p_multi = run(make_mesh(8))
    host_single, p_single = run(make_mesh(1))

    # SSIM's sigma = pool(x^2) - mu^2 is cancellation-sensitive in fp32,
    # so the sharded mean's different reduction order moves the loss at
    # the few-1e-4 relative level (not a sharding bug — per-element values
    # are exact; only summation order differs across shards)
    np.testing.assert_allclose(
        host_multi["loss"], host_single["loss"], rtol=5e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        host_multi["epe"], host_single["epe"], rtol=5e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        host_multi["fetch_counter"], host_single["fetch_counter"]
    )
    np.testing.assert_allclose(
        np.asarray(p_multi["estimator_6"]["disp1"]["w"]),
        np.asarray(p_single["estimator_6"]["disp1"]["w"]),
        rtol=1e-3,
        atol=1e-6,
    )


@pytest.mark.quick
def test_mesh_sharding_primitives_quick():
    """Quick-tier smoke for the parallel subsystem: mesh construction,
    batch/width shardings, and a sharded jit whose result matches the
    unsharded computation — no full-net compile (the 1-core host cannot
    afford one inside the <5 min `pytest -m quick` budget)."""
    from real_time_self_adaptive_deep_stereo_tpu.parallel import (
        batch_sharded,
        make_mesh,
        shard_batch,
        width_sharded,
    )

    mesh = make_mesh(4)
    assert mesh.devices.shape == (4,)
    x = np.arange(4 * 8 * 16 * 3, dtype=np.float32).reshape(4, 8, 16, 3)
    batch = shard_batch({"left": x}, batch_sharded(mesh))
    assert batch["left"].sharding.is_equivalent_to(batch_sharded(mesh), 4)
    f = jax.jit(lambda b: jnp.mean(b["left"] ** 2, axis=(1, 2, 3)))
    np.testing.assert_allclose(
        np.asarray(f(batch)), np.asarray(f({"left": jnp.asarray(x)})), rtol=1e-6
    )
    wide = shard_batch({"left": x}, width_sharded(mesh))
    assert wide["left"].sharding.spec == width_sharded(mesh).spec
