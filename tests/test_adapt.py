"""Tests for the MAD adaptation machinery: block partitioning, samplers,
engine steps (NONE/FULL/MAD), reward bookkeeping and the reset safeguard."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from real_time_self_adaptive_deep_stereo_tpu.adapt import (
    AdaptationEngine,
    OnlineAdaptationSession,
    get_sampler,
    load_block_config,
    make_blocks,
    softmax,
)
from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net

H, W = 64, 64
rng = np.random.default_rng(0)


def _frame():
    return {
        "left": jnp.asarray(rng.random((1, H, W, 3)) * 255, jnp.float32),
        "right": jnp.asarray(rng.random((1, H, W, 3)) * 255, jnp.float32),
        "target": jnp.asarray(rng.random((1, H, W, 1)) * 60, jnp.float32),
    }


@pytest.fixture(scope="module")
def madnet_setup():
    net = get_stereo_net("MADNet", corr_mode="jnp")
    params = net.init(jax.random.PRNGKey(0))
    groups = load_block_config("block_config/MadNet_full.json")
    blocks = make_blocks(groups, net.layer_to_path)
    # one engine for the whole module: its jitted steps are stateless and
    # caching them across tests keeps the suite fast
    eng = AdaptationEngine(net, blocks, lr=1e-4)
    return net, params, blocks, eng


# ---------------------------------------------------------------- samplers


@pytest.mark.quick
def test_samplers_cover_strategies():
    dist = softmax(np.array([0.1, 2.0, 0.3, 0.1, 0.5]))
    assert get_sampler("FIXED", 1, fixed_id=3).sample(dist) == [3]
    assert get_sampler("ARGMAX", 1).sample(dist) == [1]
    seq = get_sampler("SEQUENTIAL", 2)
    assert seq.sample(dist) == [0, 1] and seq.sample(dist) == [1, 2]
    r = get_sampler("RANDOM", 2, seed=0).sample(dist)
    assert len(set(r)) == 2 and all(0 <= i < 5 for i in r)
    p = get_sampler("PROBABILITY", 1, seed=0).sample(dist)
    assert len(p) == 1
    np.testing.assert_allclose(dist.sum(), 1.0, rtol=1e-12)


# ------------------------------------------------------------------ blocks


@pytest.mark.quick
def test_blocks_partition_params(madnet_setup):
    net, params, blocks, eng = madnet_setup
    assert len(blocks) == 5
    # block 0 = scale 6: estimator_6 + pyramid conv11/conv12
    names = {"/".join(p) for p in blocks[0].paths}
    assert "estimator_6/disp1" in names and "pyramid/conv12" in names
    # last block owns context net
    names4 = {"/".join(p) for p in blocks[4].paths}
    assert "context/context7" in names4 and "pyramid/conv1" in names4
    # extract/merge roundtrip
    bp = blocks[0].extract(params)
    bumped = jax.tree_util.tree_map(lambda x: x + 1.0, bp)
    merged = blocks[0].merge(params, bumped)
    np.testing.assert_allclose(
        np.asarray(merged["estimator_6"]["disp1"]["w"]),
        np.asarray(params["estimator_6"]["disp1"]["w"]) + 1.0,
    )
    # untouched subtree identical object
    assert merged["estimator_5"]["disp1"]["w"] is params["estimator_5"]["disp1"]["w"]


# ------------------------------------------------------------------- engine


def test_mad_step_updates_only_selected_block(madnet_setup):
    net, params, blocks, eng = madnet_setup
    opt = eng.init_opt(params)
    frame = _frame()
    p1, o1, res = eng.adapt_block(1)(
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        opt,
        frame,
    )
    assert np.isfinite(float(res["loss"]))
    touched = {"/".join(p) for p in blocks[1].paths}
    flat_old = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_new = jax.tree_util.tree_flatten_with_path(p1)[0]
    changed = 0
    for (kp_old, v_old), (kp_new, v_new) in zip(flat_old, flat_new):
        path = "/".join(str(getattr(k, "key", k)) for k in kp_old[:-1])
        same = np.array_equal(np.asarray(v_old), np.asarray(v_new))
        if path in touched:
            if not same:
                changed += 1
        else:
            assert same, f"param outside block changed: {path}"
    assert changed > 0


def test_full_step_updates_everything(madnet_setup):
    net, params, blocks, eng = madnet_setup
    opt = eng.init_opt(params)
    frame = _frame()
    p1, o1, res = eng.adapt_full(
        jax.tree_util.tree_map(lambda x: x.copy(), params), opt, frame
    )
    # every leaf with gradient flow should move; check a few
    assert not np.array_equal(
        np.asarray(p1["pyramid"]["conv1"]["w"]), np.asarray(params["pyramid"]["conv1"]["w"])
    )
    assert not np.array_equal(
        np.asarray(p1["context"]["context7"]["w"]),
        np.asarray(params["context"]["context7"]["w"]),
    )
    assert np.isfinite(float(res["loss"]))


def test_session_runs_all_modes(madnet_setup):
    net, params, blocks, eng = madnet_setup
    for mode in ("NONE", "FULL", "MAD"):
        sess = OnlineAdaptationSession(
            eng,
            jax.tree_util.tree_map(lambda x: x.copy(), params),
            mode=mode,
            sample_mode="SEQUENTIAL",
            seed=0,
        )
        for _ in range(3):
            out = sess.step(_frame())
            assert np.isfinite(out["loss"])
        assert sess.stats.steps == 3
        if mode == "MAD":
            assert sum(sess.stats.fetch_counter) == 3


def test_reset_safeguard(madnet_setup):
    net, params, blocks, eng = madnet_setup
    sess = OnlineAdaptationSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="SEQUENTIAL",
        ssim_th=-1.0,  # force a reset every frame
        seed=0,
    )
    sess.step(_frame())
    assert sess.stats.reset_counter == 1
    np.testing.assert_allclose(
        np.asarray(sess.params["pyramid"]["conv1"]["w"]),
        np.asarray(params["pyramid"]["conv1"]["w"]),
    )


def test_adaptation_reduces_loss_on_static_scene(madnet_setup):
    """FULL adaptation on a repeated synthetic frame should reduce the
    photometric loss (the core capability of the system)."""
    net, params, blocks, _ = madnet_setup
    eng = AdaptationEngine(net, blocks, lr=2e-3)
    sess = OnlineAdaptationSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="FULL",
        ssim_th=10.0,  # disable resets
    )
    # structured scene: horizontal gradient with a shifted copy
    base = np.tile(np.linspace(0, 255, W, dtype=np.float32)[None, :, None], (H, 1, 3))
    base += rng.random((H, W, 3)).astype(np.float32) * 30
    shift = 4
    right = np.roll(base, -shift, axis=1)
    frame = {
        "left": jnp.asarray(base[None]),
        "right": jnp.asarray(right[None]),
        "target": jnp.asarray(np.full((1, H, W, 1), shift, np.float32)),
    }
    losses = [sess.step(frame)["loss"] for _ in range(20)]
    assert min(losses[5:]) < losses[0], losses


@pytest.mark.parametrize("shared_forward", [False, True])
def test_fused_session_matches_host_session(madnet_setup, shared_forward):
    """With a deterministic sampler and no resets, the fused on-device
    controller must produce the same loss/metric trajectory as the
    host-driven session — for BOTH fused step shapes: the N-branch
    lax.switch (runtime partial backward; production default) and the
    shared-forward masked-update program (one backward, leaf-masked
    momentum update)."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(4)]

    host = OnlineAdaptationSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="SEQUENTIAL",
        ssim_th=1e9,
        seed=0,
    )
    host_losses = [host.step(f)["loss"] for f in frames]

    fused = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="SEQUENTIAL",
        ssim_th=1e9,
        max_steps=8,
        seed=0,
        shared_forward=shared_forward,
    )
    for f in frames:
        fused.step(f)
    stats = fused.finalize()
    np.testing.assert_allclose(stats["loss"], host_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["epe"], host.stats.epe, rtol=1e-4, atol=1e-4)
    assert list(stats["fetch_counter"]) == host.stats.fetch_counter
    # reward scores follow the same trajectory
    np.testing.assert_allclose(
        stats["scores"], host.scores, rtol=1e-3, atol=1e-5
    )


@pytest.mark.parametrize("unroll", [1, 4])
def test_step_chunk_matches_sequential_steps(madnet_setup, unroll):
    """step_chunk(K frames) must reproduce EXACTLY the trajectory of K
    sequential step() calls (lax.scan over the same traced step fn) —
    the chunked mode only amortizes host dispatch, never changes
    semantics. unroll=K (full scan unroll, the no-loop-overhead serving
    shape) must be equally exact."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(4)]
    cp = lambda: jax.tree_util.tree_map(lambda x: x.copy(), params)  # noqa: E731
    kw = dict(mode="MAD", sample_mode="SEQUENTIAL", ssim_th=1e9, max_steps=8, seed=0)

    seq = FusedOnlineSession(eng, cp(), **kw)
    for f in frames:
        seq.step(f)
    last_seq = np.asarray(jax.device_get(seq.last_disp))
    seq_stats = seq.finalize()

    chunked = FusedOnlineSession(eng, cp(), **kw)
    stacked = {k: jnp.stack([f[k] for f in frames]) for k in frames[0]}
    chunked.step_chunk(stacked, unroll=unroll)
    last_chunk = np.asarray(jax.device_get(chunked.last_disp))
    chunk_stats = chunked.finalize()

    assert last_chunk.shape[0] == 4
    np.testing.assert_allclose(last_chunk[-1], last_seq, rtol=1e-5, atol=1e-5)
    for k in ("loss", "epe", "d1", "scores"):
        np.testing.assert_allclose(
            chunk_stats[k], seq_stats[k], rtol=1e-5, atol=1e-6
        )
    assert list(chunk_stats["fetch_counter"]) == list(seq_stats["fetch_counter"])


def test_step_chunk_matches_sequential_steps_multistream(madnet_setup):
    """Chunked dispatch for the multi-stream serving mode: scanning K
    [N,...] frames must equal K sequential stream steps (same lax.map
    per-iteration composition — one program advances K*N frames)."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    N, K = 2, 3
    frames = [
        {k: jnp.stack([v, v * 0.9], axis=0) for k, v in _frame().items()}
        for _ in range(K)
    ]  # stream axis prepended: [N, 1, H, W, C]
    cp = lambda: jax.tree_util.tree_map(lambda x: x.copy(), params)  # noqa: E731
    kw = dict(
        mode="MAD", sample_mode="SEQUENTIAL", ssim_th=1e9, max_steps=8,
        seed=0, num_streams=N,
    )

    seq = FusedOnlineSession(eng, cp(), **kw)
    for f in frames:
        seq.step(f)
    seq_stats = seq.finalize()

    chunked = FusedOnlineSession(eng, cp(), **kw)
    stacked = {k: jnp.stack([f[k] for f in frames]) for k in frames[0]}
    chunked.step_chunk(stacked)
    chunk_stats = chunked.finalize()

    assert np.asarray(jax.device_get(chunked.last_disp)).shape[:2] == (K, N)
    for k in ("loss", "epe", "d1"):
        np.testing.assert_allclose(
            chunk_stats[k], seq_stats[k], rtol=1e-5, atol=1e-6
        )


def test_snapshot_params_nonblocking_and_stable(madnet_setup):
    """snapshot_params() taken mid-stream must capture the weights AT
    the snapshot point, stay valid after further (donating) steps, and
    materialize to the same pytree current_params() showed then."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    sess = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="SEQUENTIAL",
        ssim_th=1e9,
        max_steps=8,
        seed=0,
    )
    sess.step(_frame())
    want = jax.tree_util.tree_map(np.asarray, jax.device_get(sess.current_params()))
    get = sess.snapshot_params()
    for _ in range(2):  # donations recycle the old params buffer
        sess.step(_frame())
    sess.block_until_ready()
    got = get()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), b), got, want
    )


def test_compute_metrics_false_same_trajectory(madnet_setup):
    """compute_metrics=False (production serving: no ground truth) must
    leave the adaptation trajectory untouched — identical disparities
    and params, no 'target' key required, metrics absent from
    finalize()."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(3)]
    cp = lambda: jax.tree_util.tree_map(lambda x: x.copy(), params)  # noqa: E731

    for mode in ("NONE", "MAD"):
        kw = dict(
            mode=mode, sample_mode="SEQUENTIAL", ssim_th=1e9, max_steps=8,
            seed=0,
        )
        ref = FusedOnlineSession(eng, cp(), **kw)
        for f in frames:
            ref.step(f)
        want_disp = np.asarray(jax.device_get(ref.last_disp))

        bare = FusedOnlineSession(eng, cp(), compute_metrics=False, **kw)
        for f in frames:
            bare.step({k: v for k, v in f.items() if k != "target"})
        got_disp = np.asarray(jax.device_get(bare.last_disp))

        np.testing.assert_allclose(got_disp, want_disp, rtol=1e-6, atol=1e-6)
        if mode == "MAD":
            np.testing.assert_allclose(
                np.asarray(bare.current_params()["estimator_6"]["disp1"]["w"]),
                np.asarray(ref.current_params()["estimator_6"]["disp1"]["w"]),
                rtol=1e-6,
                atol=1e-7,
            )
        stats = bare.finalize()
        assert "epe" not in stats and stats["steps"] == 3


def test_bf16_act_forward_drift_bounded(madnet_setup):
    """'bf16_act' (bfloat16 activations BETWEEN convs, the
    HBM-bandwidth serving mode) must keep the full-resolution disparity
    in fp32 at the head and within bf16-mantissa-class drift of the
    fp32-exact forward. End-to-end D1 drift on the adaptation loop is
    tracked in PARITY_RESULTS.md; this is the in-CI guard."""
    from real_time_self_adaptive_deep_stereo_tpu.ops.conv import (
        set_conv_precision,
    )

    net, params, _, _ = madnet_setup
    f = _frame()
    want = np.asarray(net.forward(params, f["left"], f["right"])["full_res_disp"])
    try:
        set_conv_precision("bf16_act")
        got_arr = net.forward(params, f["left"], f["right"])["full_res_disp"]
    finally:
        set_conv_precision("highest")
    assert got_arr.dtype == jnp.float32
    got = np.asarray(got_arr)
    # disparities at random init are O(1); the refinement cascade
    # amplifies bf16 rounding ~10x past single-conv tolerance
    denom = np.maximum(np.abs(want), 1.0)
    assert float(np.median(np.abs(got - want) / denom)) < 0.05
    assert np.isfinite(got).all()


@pytest.mark.quick
def test_stochastic_samplers_distribution_equivalence():
    """Host (numpy) and fused (Gumbel top-k) PROBABILITY/RANDOM samplers
    are trajectory-independent by design; this pins their DISTRIBUTIONS
    to the same law (round-2 review: equivalence was only ever tested
    via the deterministic SEQUENTIAL/FIXED modes).

    Chi-square each against the exact categorical law at alpha=0.001
    (df=3 crit 16.27): num_blocks=1 PROBABILITY ~ softmax(scores),
    RANDOM ~ uniform; and for num_blocks=2 the first-pick marginals of
    Plackett-Luce (numpy draw-renormalize == Gumbel top-k order).
    """
    from types import SimpleNamespace

    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )
    from real_time_self_adaptive_deep_stereo_tpu.adapt.samplers import (
        get_sampler,
        softmax,
    )

    n, draws, crit = 4, 4000, 16.27
    scores = np.array([0.1, 1.2, -0.4, 0.6], np.float32)
    probs = softmax(scores)

    def chi2(counts, p):
        exp = p * counts.sum()
        return float(((counts - exp) ** 2 / exp).sum())

    def device_counts(mode, m, seed):
        stub = SimpleNamespace(
            n_actions=n, num_blocks=m, sample_mode=mode,
            fixed_id=0, sample_frequency=1,
        )
        keys = jax.random.split(jax.random.PRNGKey(seed), draws)
        ids = jax.vmap(
            lambda k: FusedOnlineSession._sample(
                stub, jnp.asarray(scores), k, jnp.asarray(0)
            )
        )(keys)
        first = np.asarray(ids)[:, 0]
        return np.bincount(first, minlength=n).astype(np.float64)

    def host_counts(mode, m, seed):
        s = get_sampler(mode, m, seed=seed)
        dist = probs if mode == "PROBABILITY" else scores
        first = [s.sample(dist)[0] for _ in range(draws)]
        return np.bincount(np.asarray(first), minlength=n).astype(np.float64)

    uniform = np.full(n, 1.0 / n)
    for m in (1, 2):
        assert chi2(device_counts("PROBABILITY", m, 7), probs) < crit
        assert chi2(host_counts("PROBABILITY", m, 7), probs) < crit
        assert chi2(device_counts("RANDOM", m, 11), uniform) < crit
        assert chi2(host_counts("RANDOM", m, 11), uniform) < crit


def test_multi_block_one_shot_semantics(madnet_setup):
    """adapt_blocks([k0,k1]) must equal: gradients of BOTH blocks taken
    at the same pre-step params, disjoint updates applied together (the
    reference's single-sess.run semantics for --numBlocks>1,
    Stereo_Online_Adaptation.py:201-208) — NOT sequential application
    where block k1's gradient would see block k0's update."""
    net, params, blocks, eng = madnet_setup
    cp = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)  # noqa: E731
    f = _frame()
    k0, k1 = 0, 3

    p2, _, res = eng.adapt_blocks([k0, k1])(cp(params), eng.init_opt(params), f)
    assert res["block_loss"].shape == (2,)

    # oracle: each block's own single-block step from the SAME params;
    # the one-shot result takes block k's leaves from step k's output
    pa, _, _ = eng.adapt_block(k0)(cp(params), eng.init_opt(params), f)
    pb, _, _ = eng.adapt_block(k1)(cp(params), eng.init_opt(params), f)
    expected = blocks[k0].merge(cp(params), blocks[k0].extract(pa))
    expected = blocks[k1].merge(expected, blocks[k1].extract(pb))

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        p2,
        expected,
    )

    # duplicate ids collapse (TF dedupes identical fetches in one run)
    p_dup, _, _ = eng.adapt_blocks([k0, k0])(cp(params), eng.init_opt(params), f)
    p_single, _, _ = eng.adapt_block(k0)(cp(params), eng.init_opt(params), f)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8
        ),
        p_dup,
        p_single,
    )


def test_fused_matches_host_num_blocks_2(madnet_setup):
    """Fused == host must hold for numBlocks=2: both paths implement the
    one-shot pre-step-gradient semantics, so their loss/score/weight
    trajectories must agree exactly."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(4)]
    kw = dict(
        mode="MAD",
        sample_mode="SEQUENTIAL",
        num_blocks=2,
        ssim_th=1e9,
        seed=0,
    )

    host = OnlineAdaptationSession(
        eng, jax.tree_util.tree_map(lambda x: x.copy(), params), **kw
    )
    host_losses = [host.step(f)["loss"] for f in frames]

    fused = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        max_steps=8,
        **kw,
    )
    for f in frames:
        fused.step(f)
    stats = fused.finalize()
    np.testing.assert_allclose(stats["loss"], host_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["epe"], host.stats.epe, rtol=1e-4, atol=1e-4)
    assert list(stats["fetch_counter"]) == host.stats.fetch_counter
    np.testing.assert_allclose(stats["scores"], host.scores, rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(fused.current_params()["pyramid"]["conv1"]["w"]),
        np.asarray(host.params["pyramid"]["conv1"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_fused_matches_host_fixed_id_list(madnet_setup):
    """FIXED with a multi-id list must train exactly the listed blocks in
    BOTH session modes (reference: the fixed sampler returns its
    configured ids regardless of the nominal block count,
    Sampler/sampler_factory.py:23-37). Round-3 regression: the fused
    path silently broadcast fixedID[0] (VERDICT r3 missing-next #6)."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(3)]
    ids = [1, 4]
    kw = dict(
        mode="MAD",
        sample_mode="FIXED",
        num_blocks=2,
        fixed_id=ids,
        ssim_th=1e9,
        seed=0,
    )

    host = OnlineAdaptationSession(
        eng, jax.tree_util.tree_map(lambda x: x.copy(), params), **kw
    )
    host_losses = [host.step(f)["loss"] for f in frames]

    fused = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        max_steps=8,
        **kw,
    )
    for f in frames:
        fused.step(f)
    stats = fused.finalize()
    np.testing.assert_allclose(stats["loss"], host_losses, rtol=1e-4, atol=1e-5)
    assert list(stats["fetch_counter"]) == host.stats.fetch_counter
    # exactly the listed blocks (and no others) were trained
    fetched = [i for i, c in enumerate(stats["fetch_counter"]) if c > 0]
    assert fetched == sorted(ids)
    fp, hp = fused.current_params(), host.params
    for k, blk in enumerate(blocks):
        same = k not in ids
        for a, b in zip(
            jax.tree_util.tree_leaves(blk.extract(fp)),
            jax.tree_util.tree_leaves(blk.extract(hp)),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            )
        for a, b in zip(
            jax.tree_util.tree_leaves(blk.extract(fp)),
            jax.tree_util.tree_leaves(blk.extract(params)),
        ):
            if same:
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # length mismatch is an error, not a silent truncation/broadcast
    with pytest.raises(ValueError, match="FIXED"):
        FusedOnlineSession(
            eng,
            params,
            mode="MAD",
            sample_mode="FIXED",
            num_blocks=2,
            fixed_id=0,
            max_steps=8,
        )


def test_fused_matches_host_with_dilation_freq_and_reset(madnet_setup):
    """Fused == host must hold with the full knob set exercised: training
    dilated to every 3rd frame, block resampling every 2nd frame, and at
    least one reset-triggering frame. The reference updates scores and
    rolls loss_t_1/loss_t_2 EVERY frame while gating only the train ops on
    dilation (Stereo_Continual_Adaptation.py:212,225-238)."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(8)]
    kw = dict(
        mode="MAD",
        sample_mode="SEQUENTIAL",
        dilation=3,
        sample_frequency=2,
        seed=0,
    )

    # probe run (no resets) to pick a threshold that actually triggers
    probe = OnlineAdaptationSession(
        eng, jax.tree_util.tree_map(lambda x: x.copy(), params), ssim_th=1e9, **kw
    )
    probe_losses = [probe.step(f)["loss"] for f in frames]
    th = (min(probe_losses) + max(probe_losses)) / 2.0

    host = OnlineAdaptationSession(
        eng, jax.tree_util.tree_map(lambda x: x.copy(), params), ssim_th=th, **kw
    )
    host_losses = [host.step(f)["loss"] for f in frames]
    assert host.stats.reset_counter >= 1, "threshold never triggered a reset"

    fused = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        ssim_th=th,
        max_steps=16,
        **kw,
    )
    for f in frames:
        fused.step(f)
    stats = fused.finalize()
    np.testing.assert_allclose(stats["loss"], host_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["epe"], host.stats.epe, rtol=1e-4, atol=1e-4)
    assert list(stats["fetch_counter"]) == host.stats.fetch_counter
    assert int(stats["reset_count"]) == host.stats.reset_counter
    np.testing.assert_allclose(stats["scores"], host.scores, rtol=1e-3, atol=1e-5)
    # final weights agree too
    np.testing.assert_allclose(
        np.asarray(fused.current_params()["pyramid"]["conv1"]["w"]),
        np.asarray(host.params["pyramid"]["conv1"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )


def test_fused_matches_host_full_mode_dilation(madnet_setup):
    """FULL mode must honour --dilation in the fused session too: the
    reference gates whichever train op runs on the dilation stride
    (Stereo_Continual_Adaptation.py:212-213), and the host runner gates
    FULL accordingly (runner.py:113-119). Round-4 regression: the fused
    step ran train_full every frame regardless of dilation."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    cp = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)  # noqa: E731
    frames = [_frame() for _ in range(5)]
    kw = dict(mode="FULL", dilation=2, ssim_th=1e9, seed=0)

    host = OnlineAdaptationSession(eng, cp(params), **kw)
    host_losses = [host.step(f)["loss"] for f in frames]

    fused = FusedOnlineSession(eng, cp(params), max_steps=8, **kw)
    for f in frames:
        fused.step(f)
    stats = fused.finalize()
    np.testing.assert_allclose(stats["loss"], host_losses, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(stats["epe"], host.stats.epe, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(fused.current_params()["pyramid"]["conv1"]["w"]),
        np.asarray(host.params["pyramid"]["conv1"]["w"]),
        rtol=1e-4,
        atol=1e-6,
    )
    # the gate must actually bite: an undilated fused run ends elsewhere
    dense = FusedOnlineSession(
        eng, cp(params), max_steps=8, mode="FULL", dilation=1, ssim_th=1e9, seed=0
    )
    for f in frames:
        dense.step(f)
    dense.finalize()
    assert not np.allclose(
        np.asarray(dense.current_params()["pyramid"]["conv1"]["w"]),
        np.asarray(fused.current_params()["pyramid"]["conv1"]["w"]),
    )


def test_pipelined_serving_matches_blocking(madnet_setup):
    """The depth-1 pipelined serving API (step_pipelined / serve /
    flush_disp) must deliver exactly the per-step disparities, in frame
    order, one frame late — pipelining changes WHEN the consumer sees a
    disparity, never WHAT it sees. Also checks disp_dtype=float16 output
    (the shipped low-latency demo configuration)."""
    import jax.numpy as jnp

    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    cp = lambda t: jax.tree_util.tree_map(lambda x: x.copy(), t)  # noqa: E731
    frames = [_frame() for _ in range(4)]
    kw = dict(mode="MAD", sample_mode="SEQUENTIAL", ssim_th=1e9, seed=0)

    ref_sess = FusedOnlineSession(eng, cp(params), max_steps=8, **kw)
    want = []
    for f in frames:
        ref_sess.step(f)
        want.append(np.asarray(jax.device_get(ref_sess.last_disp)))

    # step_pipelined: None first, then disp[i-1]; flush drains the last
    pipe = FusedOnlineSession(eng, cp(params), max_steps=8, **kw)
    got = [pipe.step_pipelined(f) for f in frames]
    assert got[0] is None
    for i in range(1, len(frames)):
        np.testing.assert_array_equal(got[i], want[i - 1])
    np.testing.assert_array_equal(pipe.flush_disp(), want[-1])
    assert pipe.flush_disp() is None  # drained

    # serve(): one disparity per input frame, in order
    srv = FusedOnlineSession(eng, cp(params), max_steps=8, **kw)
    out = list(srv.serve(iter(frames)))
    assert len(out) == len(frames)
    for g, w in zip(out, want):
        np.testing.assert_array_equal(g, w)

    # f16 consumer output, GT-free production contract
    f16 = FusedOnlineSession(
        eng, cp(params), max_steps=8, compute_metrics=False,
        disp_dtype=jnp.float16, **kw
    )
    nogt = [{k: f[k] for k in ("left", "right")} for f in frames]
    outs = list(f16.serve(iter(nogt)))
    assert outs[0].dtype == np.float16
    np.testing.assert_allclose(
        outs[-1].astype(np.float32), want[-1], rtol=2e-3, atol=0.1
    )


# ----------------------------------------------------- dispnet MAD + splits


def test_dispnet_mad_runs_with_6_group_config():
    """DispNet MAD end-to-end with the corrected 6-group block config
    (the reference ships a 5-group dispnet_full.json that cannot satisfy
    its own len(predictions)==len(config) assert — kept as-is for
    parity; dispnet_full_6.json is the working extra)."""
    net = get_stereo_net("Dispnet", corr_mode="jnp")
    params = net.init(jax.random.PRNGKey(0))
    groups = load_block_config("block_config/dispnet_full_6.json")
    blocks = make_blocks(groups, net.layer_to_path)
    assert len(blocks) == net.num_adaptable_predictions == 6
    eng = AdaptationEngine(net, blocks, lr=1e-4)
    sess = OnlineAdaptationSession(
        eng, params, mode="MAD", sample_mode="SEQUENTIAL", seed=0
    )
    f = _frame()
    for _ in range(2):
        out = sess.step(f)
    assert np.isfinite(out["loss"])


@pytest.mark.parametrize("name", ["MADNet", "Dispnet"])
def test_split_forward_matches_whole_forward(name):
    """extract_features + estimate_from_features == forward (the TPU
    equivalent of the reference's split/placeholder machinery,
    Stereo_net.py:81-97), for both model families."""
    net = get_stereo_net(name, corr_mode="jnp")
    params = net.init(jax.random.PRNGKey(1))
    f = _frame()
    whole = net.forward(params, f["left"], f["right"])
    feats = net.extract_features(params, f["left"], f["right"])
    staged = net.estimate_from_features(params, feats)
    np.testing.assert_array_equal(
        np.asarray(whole["full_res_disp"]), np.asarray(staged["full_res_disp"])
    )
    assert len(whole["disparities"]) == len(staged["disparities"])


@pytest.mark.quick
def test_dispnet_batched_siamese_stack_exact():
    """DispNet runs its siamese conv1/conv2 as ONE B=2B batched stack
    (the MADNet pyramid pattern — halves the dispatch count of the most
    HBM-bound convs). Batching must be mathematically invisible: the
    stacked features must equal per-view batch-1 convs bitwise."""
    from real_time_self_adaptive_deep_stereo_tpu.ops import conv2d, pad_image

    net = get_stereo_net("Dispnet", corr_mode="jnp")
    params = net.init(jax.random.PRNGKey(3))
    f = _frame()
    feats = net.extract_features(params, f["left"], f["right"])

    def encode(img):
        x = pad_image(img.astype(jnp.float32) / 255.0 - 100.0 / 255.0, 64)
        c1 = conv2d(params["conv1"], x, strides=2)
        return c1, conv2d(params["conv2"], c1, strides=2)

    c1a, c2a = encode(f["left"])
    _, c2b = encode(f["right"])
    np.testing.assert_array_equal(np.asarray(feats["c1a"]), np.asarray(c1a))
    np.testing.assert_array_equal(np.asarray(feats["c2a"]), np.asarray(c2a))
    np.testing.assert_array_equal(np.asarray(feats["c2b"]), np.asarray(c2b))


@pytest.mark.parametrize("stream_impl", ["map", "vmap", "unroll"])
def test_multistream_session_matches_single(madnet_setup, stream_impl):
    """num_streams=N runs N independent adaptation streams in ONE program
    (own params/opt/scores/PRNG each). 'map' composes the production
    switch step sequentially (partial backward preserved), 'vmap'
    batches the shared-forward step. With identical seeds and frames
    every stream must reproduce the matching single-stream trajectory."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    frames = [_frame() for _ in range(3)]

    single = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="PROBABILITY",
        ssim_th=1e9,
        max_steps=8,
        seed=0,
        shared_forward=(stream_impl == "vmap"),  # map/unroll: switch step
    )
    for f in frames:
        single.step(f)
    ref = single.finalize()

    multi = FusedOnlineSession(
        eng,
        jax.tree_util.tree_map(lambda x: x.copy(), params),
        mode="MAD",
        sample_mode="PROBABILITY",
        ssim_th=1e9,
        max_steps=8,
        seed=[0, 0],
        num_streams=2,
        stream_impl=stream_impl,
    )
    for f in frames:
        multi.step(jax.tree_util.tree_map(lambda x: jnp.stack([x, x]), f))
    got = multi.finalize()

    assert got["loss"].shape == (2, 3)
    for s in range(2):
        np.testing.assert_allclose(got["loss"][s], ref["loss"], rtol=2e-5, atol=1e-7)
        np.testing.assert_allclose(got["epe"][s], ref["epe"], rtol=2e-5, atol=1e-6)
        np.testing.assert_array_equal(got["fetch_counter"][s], ref["fetch_counter"])
    p = multi.current_params()
    np.testing.assert_allclose(
        np.asarray(p["pyramid"]["conv1"]["w"][0]),
        np.asarray(single.current_params()["pyramid"]["conv1"]["w"]),
        rtol=2e-5,
        atol=1e-7,
    )


def test_arena_rejects_overlapping_blocks(madnet_setup):
    """A param leaf in two MAD blocks cannot live in the flat arena's
    contiguous ranges; silent first-block assignment would drop the
    second block's updates, so construction must fail loudly."""
    from real_time_self_adaptive_deep_stereo_tpu.adapt.arena import build_arena
    from real_time_self_adaptive_deep_stereo_tpu.adapt.blocks import Block

    net, params, blocks, eng = madnet_setup
    overlapping = [
        Block(0, [("estimator_6",), ("pyramid", "conv12")]),
        Block(1, [("estimator_5",), ("pyramid", "conv12")]),  # conv12 again
    ]
    with pytest.raises(ValueError, match="more than one MAD block"):
        build_arena(params, overlapping)


def test_shared_forward_invalid_combo_raises(madnet_setup):
    from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
        FusedOnlineSession,
    )

    net, params, blocks, eng = madnet_setup
    with pytest.raises(ValueError, match="shared_forward requires"):
        FusedOnlineSession(
            eng, params, mode="FULL", shared_forward=True, max_steps=4
        )
    with pytest.raises(ValueError, match="shared_forward requires"):
        FusedOnlineSession(
            eng, params, mode="MAD", num_blocks=2, shared_forward=True,
            max_steps=4,
        )
