"""Fused on-device adaptation session: ONE dispatch per frame, ZERO
host syncs in steady state.

The classic runner (:mod:`runner`) mirrors the reference's host loop —
it fetches the loss scalar every frame for the reward update and reset
check (Stereo_Online_Adaptation.py:208-224). On TPU runtimes a
device->host sync costs orders of magnitude more than a dispatch, so
this module moves the *entire* controller into the jitted step:

* block sampling (``jax.random.categorical`` / argmax / round-robin /
  Gumbel top-k for multi-block) over the device-resident score vector,
* the per-block train branch selected with ``lax.switch`` (only the
  sampled branch executes at runtime),
* the reward bookkeeping (linear loss extrapolation, decay/uf credit —
  Stereo_Online_Adaptation.py:211-224),
* the loss-threshold reset via ``lax.cond`` against pristine weights
  kept on device (Stereo_Online_Adaptation.py:241-244),
* per-frame metric accumulation into device ring buffers (EPE, bad3,
  D1, loss, fetch counts).

The host loop reduces to ``state = step(state, frame)`` — pure async
dispatch — and a single transfer at the end (or at a configurable
logging stride) materialises the statistics.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from real_time_self_adaptive_deep_stereo_tpu.adapt.arena import build_arena
from real_time_self_adaptive_deep_stereo_tpu.adapt.engine import (
    AdaptationEngine,
    d1_metric,
    disparity_metrics,
)

__all__ = ["FusedOnlineSession"]


class FusedOnlineSession:
    """Device-resident NONE / FULL / MAD adaptation session.

    Usage::

        eng = AdaptationEngine(model, blocks, lr=1e-4)
        sess = FusedOnlineSession(eng, params, mode="MAD",
                                  sample_mode="PROBABILITY", max_steps=N)
        for frame in frames:          # device-put dict batches
            sess.step(frame)          # async; no host sync
        stats = sess.finalize()       # one transfer
    """

    def __init__(
        self,
        engine: AdaptationEngine,
        params,
        mode: str = "MAD",
        sample_mode: str = "PROBABILITY",
        num_blocks: int = 1,
        fixed_id: int = 0,
        sample_frequency: int = 1,
        ssim_th: float = 0.5,
        decay: float = 0.99,
        uf: float = 0.01,
        dilation: int = 1,
        max_steps: int = 100_000,
        seed: int = 0,
        mesh=None,
        spatial_axis: str = "data",
        shared_forward: bool = False,
        arena: bool = True,
        num_streams: int = 0,
        stream_impl: str = "auto",
        compute_metrics: bool = True,
        disp_dtype=None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` — the step is then
        compiled under GSPMD with the controller state replicated and
        the frame sharded along image width over ``spatial_axis``
        (spatial parallelism for the flagship MAD mode: one camera
        stream riding a whole pod slice; net-new vs the single-GPU
        reference, SURVEY.md §5)."""
        if mode not in ("NONE", "FULL", "MAD"):
            raise ValueError(f"unknown mode {mode!r}")
        # compute_metrics=False is the PRODUCTION serving contract: no
        # ground truth exists at deployment (adaptation is unsupervised;
        # the reference's EPE/bad3/D1 are evaluation-protocol extras),
        # so frames need no "target", the EPE/bad3/D1 computes and the
        # metrics ring buffer drop out of the program, and NONE mode
        # also skips the reprojection loss (it only fed the metrics).
        # MAD/FULL keep the loss — the reward/reset controller needs it.
        self.compute_metrics = bool(compute_metrics)
        # disp_dtype: dtype of the RETURNED per-frame disparity (e.g.
        # jnp.float16). The adaptation state/loss stay float32 — only the
        # consumer-facing output is cast, inside the fused program, which
        # halves the device->host bytes of a per-frame disparity fetch
        # (the latency-serving mode; see fetch_disp). Disparities are
        # <192 px, so f16's ~2^-13 relative step keeps quantization well
        # under 0.05 px.
        self.disp_dtype = disp_dtype
        self.mesh = mesh
        self.spatial_axis = spatial_axis
        self.engine = engine
        self.mode = mode
        self.sample_mode = sample_mode
        self.num_blocks = num_blocks
        if sample_mode == "FIXED":
            # Host/reference semantics (Sampler/sampler_factory.py:23-37
            # via samplers.FixedSampler): FIXED trains exactly the
            # configured id list, ignoring the sampler's nominal block
            # count. The fused step's shapes are static, so the list
            # length must equal num_blocks — callers (cli/adapt._run_fused)
            # set num_blocks = len(fixedID) for FIXED.
            ids = list(np.atleast_1d(fixed_id))
            if len(ids) != num_blocks:
                raise ValueError(
                    f"FIXED needs len(fixed_id) == num_blocks for the fused "
                    f"session (got {len(ids)} ids, num_blocks={num_blocks}); "
                    "pass num_blocks=len(fixed_id) or use the host session"
                )
        self.fixed_id = fixed_id
        self.sample_frequency = max(1, sample_frequency)
        self.ssim_th = ssim_th
        self.decay = decay
        self.uf = uf
        self.dilation = max(1, dilation)
        self.max_steps = max_steps
        self.n_actions = len(engine.blocks) if mode == "MAD" else 1
        # the shared-forward MAD step (one forward + one dynamically-
        # selected backward + leaf-masked update) replaces the N-branch
        # lax.switch; only valid for single-block momentum MAD.
        # Measured trade-off on a v5e at 384x1280 batch 1: the switch
        # executes only the sampled block's PARTIAL backward per step
        # (44.6 FPS) while the shared program must run the full masked
        # backward every step (25.5 FPS) — so the switch is the default;
        # shared_forward buys a ~5x smaller program / compile time and
        # is the right shape when batching many cameras per chip.
        #
        # ``arena=True`` packs params / pristine params / optimizer state
        # each into ONE contiguous vector (adapt/arena.py): profiling
        # showed ~440 tiny per-leaf `copy` kernels per step (~10 ms of
        # pure launch overhead) moving the ~540 leaves through the
        # switch/state boundary.
        # ``num_streams=N`` turns the session into N INDEPENDENT
        # adaptation streams (e.g. one per camera of a rig) sharing one
        # chip and ONE dispatch per frame-batch; per-stream params /
        # optimizer / controller state carry a leading stream axis.
        # Net-new vs the single-GPU single-stream reference.
        #
        # stream_impl picks how the per-stream step composes:
        # * "map"  — jax.lax.map: streams execute SEQUENTIALLY inside the
        #   one program, so each keeps the switch path's partial backward
        #   (full single-stream efficiency; ~N x single-stream step time,
        #   peak activation memory of ONE stream). The default on a
        #   single device.
        # * "vmap" — jax.vmap: streams execute batched/lockstep; MAD then
        #   requires the shared-forward step (a vmapped lax.switch with
        #   per-stream indices would run EVERY branch), which pays a full
        #   backward per stream. Required (and default) under a mesh,
        #   where the stream axis shards across devices and sequential
        #   map would serialize them.
        # * "unroll" — same semantics as "map" with static stream
        #   indices instead of the lax.map while-loop: kills the
        #   per-iteration dynamic-slice/update kernels and loop
        #   overhead, and exposes the independent streams to the
        #   scheduler; N-times larger program (longer compile).
        #
        # THROUGHPUT NOTE (measured, r4 matrix + r5): on one chip every
        # one-program mode loses to N interleaved single-stream sessions
        # (~165 total FPS unrolled at 4 streams vs ~185-200 interleaved)
        # — XLA serializes the unrolled streams' convs anyway and the
        # single big program forfeits the host/device overlap the
        # interleaved dispatch gets for free. num_streams is an
        # OPERATIONAL convenience (one state object, one dispatch, one
        # snapshot) and the mesh stream-parallel building block ("vmap"
        # + mesh), not a single-chip throughput play. See
        # docs/SERVING.md and docs/ROADMAP.md (r5 closing note).
        self.num_streams = int(num_streams)
        if stream_impl == "auto":
            stream_impl = "vmap" if mesh is not None else "map"
        self.stream_impl = stream_impl
        if self.num_streams:
            if not arena:
                raise ValueError("num_streams requires arena=True")
            if stream_impl not in ("map", "vmap", "unroll"):
                raise ValueError(f"unknown stream_impl {stream_impl!r}")
            if stream_impl in ("map", "unroll") and mesh is not None:
                raise ValueError(
                    f"stream_impl={stream_impl!r} composes streams inside "
                    "one device program — use 'vmap' for stream-parallel "
                    "execution over a mesh"
                )
            if stream_impl == "vmap" and mode == "MAD":
                if num_blocks != 1 or engine.optimizer != "momentum":
                    raise ValueError(
                        "num_streams MAD under vmap requires num_blocks=1 "
                        "+ momentum (the shared-forward step)"
                    )
                shared_forward = True
        if shared_forward and not (
            mode == "MAD" and num_blocks == 1 and engine.optimizer == "momentum"
        ):
            raise ValueError(
                "shared_forward requires mode='MAD', num_blocks=1 and the "
                "momentum optimizer (got mode=%r, num_blocks=%d, optimizer=%r)"
                % (mode, num_blocks, engine.optimizer)
            )
        self.shared_forward = bool(shared_forward)

        self.spec = build_arena(params, engine.blocks) if arena else None
        self.state = self._init_state(params, seed)
        self.last_disp = None  # async device array after each step()
        self._pending_disp = None  # in-flight fetch of step_pipelined
        self._chunk_fn = None  # built lazily by step_chunk
        self._step_fn = self._build_step()
        if arena:
            unravel = (
                jax.vmap(self.spec.unravel) if self.num_streams else self.spec.unravel
            )
            self._unravel_fn = jax.jit(unravel)
        else:
            self._unravel_fn = None

    # ------------------------------------------------------------------ state
    def _init_state(self, params, seed: int) -> Dict:
        eng = self.engine
        n = self.n_actions
        buf = lambda: jnp.zeros((self.max_steps,), jnp.float32)  # noqa: E731
        if self.spec is not None:
            flat = jax.jit(self.spec.ravel)(params)
            params = flat
            if self.mode == "NONE":
                opt = {}
            elif eng.optimizer == "momentum":
                opt = {"acc": jnp.zeros_like(flat)}
            else:  # adam (optimizer-global step count, engine.init_opt)
                opt = {
                    "m": jnp.zeros_like(flat),
                    "v": jnp.zeros_like(flat),
                    "t": jnp.zeros((), jnp.int32),
                }
        else:
            opt = eng.init_opt(params) if self.mode != "NONE" else {}
        # pristine weights for the reset safeguard: a CLOSURE constant of
        # the jitted step, NOT carried state — carrying it through the
        # donated state pytree forced a passthrough copy of every leaf
        # every frame (~178 small copy kernels)
        self._params0 = jax.tree_util.tree_map(lambda x: x.copy(), params)
        # per-frame metrics ride in ONE [max_steps, 4] ring buffer
        # (epe, bad3, d1, loss): four separate buffers cost four
        # dynamic-update-slice kernels (~130 us fixed cost each) per frame
        state = {
            "params": params,
            "opt": opt,
            "scores": jnp.zeros((n,), jnp.float32),
            "loss_t1": jnp.zeros((), jnp.float32),
            "loss_t2": jnp.zeros((), jnp.float32),
            "last_mask": jnp.zeros((n,), jnp.float32),
            "key": jax.random.PRNGKey(
                0 if isinstance(seed, (list, tuple)) else int(seed)
            ),
            "step": jnp.zeros((), jnp.int32),
            "reset_count": jnp.zeros((), jnp.int32),
            "fetch_counter": jnp.zeros((n,), jnp.int32),
            "cur_blocks": jnp.zeros((self.num_blocks,), jnp.int32),
        }
        if self.compute_metrics:
            state["metrics"] = jnp.zeros((self.max_steps, 4), jnp.float32)
        if self.num_streams:
            ns = self.num_streams
            seeds = (
                list(seed)
                if isinstance(seed, (list, tuple))
                else [seed + i for i in range(ns)]
            )
            if len(seeds) != ns:
                raise ValueError(f"need {ns} seeds, got {len(seeds)}")
            state = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (ns,) + x.shape).copy(), state
            )
            state["key"] = jnp.stack([jax.random.PRNGKey(s) for s in seeds])
        return state

    # ---------------------------------------------------------------- sampler
    def _sample(self, scores, key, step):
        """Device-side block sampling; returns [num_blocks] int32 indices.

        PROBABILITY samples prop. to softmax(scores) (Gumbel top-k for
        multi-block, exactly categorical for one); RANDOM is uniform;
        ARGMAX takes the top-k; SEQUENTIAL round-robins; FIXED is
        constant. Mirrors Sampler/sampler_factory.py semantics.
        """
        n, m = self.n_actions, self.num_blocks
        mode = self.sample_mode
        if mode == "FIXED":
            # length validated == m at construction; no truncation/broadcast
            return jnp.atleast_1d(jnp.asarray(self.fixed_id, jnp.int32))
        if mode == "SEQUENTIAL":
            base = (step // self.sample_frequency) % n
            return (base + jnp.arange(m, dtype=jnp.int32)) % n
        if mode == "ARGMAX":
            _, idx = jax.lax.top_k(scores, m)
            return idx.astype(jnp.int32)
        gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, (n,)) + 1e-20) + 1e-20)
        if mode == "RANDOM":
            _, idx = jax.lax.top_k(gumbel, m)
        else:  # PROBABILITY: Gumbel-top-k == sampling w/o replacement ~ softmax
            _, idx = jax.lax.top_k(scores + gumbel, m)
        return idx.astype(jnp.int32)

    # ------------------------------------------------------------------- step
    def _build_step(self):
        eng = self.engine
        mode = self.mode
        n = self.n_actions
        spec = self.spec

        def as_tree(params):
            """Pytree view of the params (identity in legacy mode)."""
            return spec.unravel(params) if spec is not None else params

        def vec_update(bp, opt_sl, g, k):
            """Optimizer update on arena vectors — delegates straight to
            engine._apply_update (its tree_maps operate on bare arrays),
            so the arena and pytree paths share ONE set of optimizer
            numerics."""
            return eng._apply_update(bp, opt_sl, g, k)

        def train_none(params, opt, frame):
            out = eng.model.forward(as_tree(params), frame["left"], frame["right"])
            if mode == "NONE" and not self.compute_metrics:
                # inference-only serving: the loss existed solely to feed
                # the metrics buffer (NONE never resets) — skip the whole
                # reprojection/SSIM pipeline
                loss = jnp.zeros((), jnp.float32)
            else:
                loss = eng._full_loss(out["disparities"], frame)
            return params, opt, loss, out["full_res_disp"]

        def train_full(params, opt, frame):
            def loss_fn(p):
                out = eng.model.forward(p, frame["left"], frame["right"])
                return eng._full_loss(out["disparities"], frame), out

            (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                as_tree(params)
            )
            if spec is not None:
                params2, opt2 = vec_update(params, opt, spec.ravel(grads), 0)
            else:
                params2, opt2 = eng._apply_update(params, opt, grads, 0)
            return params2, opt2, loss, out["full_res_disp"]

        def make_block_branch(k):
            block = eng.blocks[k]

            def branch(params, opt, frame):
                bp = block.extract(params)

                def loss_fn(bp_):
                    p = block.merge(params, bp_)
                    out = eng.model.forward(p, frame["left"], frame["right"])
                    return eng._block_loss(out["disparities"], k, frame), out

                (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(bp)
                opt_sub = eng._extract_opt(opt, block)
                new_bp, new_opt_sub = eng._apply_update(bp, opt_sub, grads, k)
                params2 = block.merge(params, new_bp)
                opt2 = eng._merge_opt(opt, new_opt_sub, block)
                loss = eng._full_loss(out["disparities"], frame)
                return params2, opt2, loss, out["full_res_disp"]

            return branch

        def make_block_branch_arena(k):
            """Branch k on the flat arena: differentiate w.r.t. block k's
            contiguous slice only (leaves outside the block are captured
            constants in unravel_override → same partial backward as
            ``minimize(loss_k, var_list=block_k)``), then update that
            slice in place with ONE fused vector op."""

            def branch(params, opt, frame):
                bp = spec.block_slice(params, k)

                def loss_fn(bp_):
                    p = spec.unravel_override(params, bp_, k)
                    out = eng.model.forward(p, frame["left"], frame["right"])
                    return eng._block_loss(out["disparities"], k, frame), out

                (_, out), g = jax.value_and_grad(loss_fn, has_aux=True)(bp)
                opt_sl = {
                    key: (tree if key == "t" else spec.block_slice(tree, k))
                    for key, tree in opt.items()
                }
                bp2, opt_sl2 = vec_update(bp, opt_sl, g, k)
                params2 = spec.block_update(params, bp2, k)
                opt2 = {
                    key: (
                        opt_sl2[key]
                        if key == "t"
                        else spec.block_update(opt[key], opt_sl2[key], k)
                    )
                    for key in opt
                }
                loss = eng._full_loss(out["disparities"], frame)
                return params2, opt2, loss, out["full_res_disp"]

            return branch

        mk_branch = make_block_branch_arena if spec is not None else make_block_branch
        branches = (
            [mk_branch(k) for k in range(n)]
            if mode == "MAD" and not self.shared_forward
            else []
        )

        # leaf -> owning-block-index map (python-int leaves — or one int32
        # vector over the arena; blocks are disjoint). Needed by the
        # shared-forward masked update AND the one-shot multi-block merge.
        if self.shared_forward or (mode == "MAD" and self.num_blocks > 1):
            if spec is not None:
                bid = np.full((spec.size,), -1, np.int32)
                for bk, (s, e) in enumerate(spec.block_ranges):
                    bid[s:e] = bk
                leaf_block_ids = jnp.asarray(bid)
            else:
                ids = jax.tree_util.tree_map(lambda _: -1, self.state["params"])
                for bk, block in enumerate(eng.blocks):
                    sub = jax.tree_util.tree_map(lambda _: bk, block.extract(ids))
                    ids = block.merge(ids, sub)
                leaf_block_ids = ids

        def train_mad_shared(params, opt, frame, k):
            """TF's ``minimize(loss_k, var_list=block_k)`` == the block-k
            restriction of the full gradient of loss_k, so instead of a
            ``lax.switch`` whose N branches each re-trace forward+backward
            (N× program size, ~400 extra fusions), run ONE forward, stack
            the per-block loss candidates, dynamically select with the
            sampled id, backprop once, and mask the momentum update per
            leaf by block ownership (Stereo_Online_Adaptation.py:85-118)."""
            inputs, prep = eng.block_loss_inputs(frame)

            def loss_fn(p):
                out = eng.model.forward(p, frame["left"], frame["right"])
                stacked = jnp.stack(
                    [prep(out["disparities"][i]) for i in range(n)], 0
                )
                sel = jax.lax.dynamic_index_in_dim(stacked, k, 0, keepdims=False)
                return eng._block_base_loss([sel], inputs), out

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                as_tree(params)
            )
            if spec is not None:
                g = spec.ravel(grads)
                m = leaf_block_ids == k
                acc = jnp.where(m, eng.momentum * opt["acc"] + g, opt["acc"])
                params2 = jnp.where(m, params - eng.lr * acc, params)
            else:
                acc = jax.tree_util.tree_map(
                    lambda a, g, bid: jnp.where(k == bid, eng.momentum * a + g, a),
                    opt["acc"],
                    grads,
                    leaf_block_ids,
                )
                params2 = jax.tree_util.tree_map(
                    lambda p, a, bid: jnp.where(k == bid, p - eng.lr * a, p),
                    params,
                    acc,
                    leaf_block_ids,
                )
            loss = eng._full_loss(out["disparities"], frame)
            return params2, {"acc": acc}, loss, out["full_res_disp"]

        def step(state, frame):
            params, opt = state["params"], state["opt"]
            step_i = state["step"]
            key, kstep = jax.random.split(state["key"])

            if mode == "MAD":
                fresh = self._sample(state["scores"], kstep, step_i)
                resample = (step_i % self.sample_frequency) == 0
                blocks_now = jnp.where(resample, fresh, state["cur_blocks"])
                train_now = (step_i % self.dilation) == 0

                def do_train(args):
                    params, opt = args
                    if self.shared_forward:
                        return train_mad_shared(params, opt, frame, blocks_now[0])
                    if self.num_blocks == 1:
                        return jax.lax.switch(
                            blocks_now[0], branches, params, opt, frame
                        )
                    # multi-block one-shot (reference single-sess.run
                    # semantics, Stereo_Online_Adaptation.py:201-208):
                    # every sampled branch reads the SAME pre-step
                    # params/opt, then the disjoint updates merge via
                    # ownership-masked selects. Duplicate sampled ids
                    # collapse (identical branch outputs make the
                    # chained select idempotent — matching TF's fetch
                    # dedup in one run).
                    outs = [
                        jax.lax.switch(blocks_now[j], branches, params, opt, frame)
                        for j in range(self.num_blocks)
                    ]
                    p2, o2 = params, opt
                    for j, (pj, oj, _, _) in enumerate(outs):
                        k_j = blocks_now[j]
                        if spec is not None:
                            m_j = leaf_block_ids == k_j
                            p2 = jnp.where(m_j, pj, p2)
                            o2 = {
                                key: (
                                    o2[key]  # scalar t fixed up below
                                    if key == "t"
                                    else jnp.where(m_j, oj[key], o2[key])
                                )
                                for key in o2
                            }
                        else:
                            sel = lambda ids, a, b: jnp.where(ids == k_j, a, b)
                            p2 = jax.tree_util.tree_map(
                                sel, leaf_block_ids, pj, p2
                            )
                            o2 = {
                                key: (
                                    o2[key]
                                    if key == "t"
                                    else jax.tree_util.tree_map(
                                        sel, leaf_block_ids, oj[key], o2[key]
                                    )
                                )
                                for key in o2
                            }
                    if "t" in o2:
                        # the shared Adam step count advances once per
                        # UNIQUE executed train op (TF dedupes identical
                        # fetches; each surviving op bumps the optimizer's
                        # beta-power variables once)
                        uniq = jnp.ones((), jnp.int32)
                        for j in range(1, self.num_blocks):
                            is_new = jnp.all(blocks_now[j] != blocks_now[:j])
                            uniq = uniq + is_new.astype(jnp.int32)
                        o2["t"] = opt["t"] + uniq
                    # loss/disp come from the shared pre-step forward
                    # (all branches saw the same params)
                    _, _, loss0, disp0 = outs[0]
                    return p2, o2, loss0, disp0

                def no_train(args):
                    params, opt = args
                    p, o, loss, disp = train_none(params, opt, frame)
                    return p, o, loss, disp

                if self.dilation == 1:
                    # train_now is identically True — skip the cond so the
                    # program carries no duplicate forward-only branch
                    params2, opt2, new_loss, disp = do_train((params, opt))
                else:
                    params2, opt2, new_loss, disp = jax.lax.cond(
                        train_now, do_train, no_train, (params, opt)
                    )

                # reward bookkeeping (reference :211-224)
                first = step_i == 0
                loss_t1 = jnp.where(first, new_loss, state["loss_t1"])
                loss_t2 = jnp.where(first, new_loss, state["loss_t2"])
                expected = 2.0 * loss_t1 - loss_t2
                gain = expected - new_loss
                scores = self.decay * state["scores"] + self.uf * gain * state[
                    "last_mask"
                ]
                cur_mask = (
                    jnp.zeros((n,), jnp.float32)
                    .at[blocks_now]
                    .add(1.0)
                )
                fetch = state["fetch_counter"] + jnp.where(
                    resample, cur_mask.astype(jnp.int32), 0
                )
                new_state_extras = {
                    "scores": scores,
                    "loss_t1": new_loss,
                    "loss_t2": loss_t1,
                    "last_mask": cur_mask,
                    "fetch_counter": fetch,
                    "cur_blocks": blocks_now,
                }
            elif mode == "FULL":
                # --dilation gates the train op in FULL mode too (reference
                # Stereo_Continual_Adaptation.py:212-213 gates whichever
                # train op runs; host mirror: runner.py:113-119). With
                # dilation==1 skip the cond so the compiled program carries
                # no duplicate forward-only branch.
                if self.dilation == 1:
                    params2, opt2, new_loss, disp = train_full(params, opt, frame)
                else:
                    train_now = (step_i % self.dilation) == 0
                    params2, opt2, new_loss, disp = jax.lax.cond(
                        train_now,
                        lambda a: train_full(a[0], a[1], frame),
                        lambda a: train_none(a[0], a[1], frame),
                        (params, opt),
                    )
                new_state_extras = {}
            else:
                params2, opt2, new_loss, disp = train_none(params, opt, frame)
                new_state_extras = {}

            # reset safeguard (reference :241-244); NONE never resets
            if mode != "NONE":
                do_reset = new_loss > self.ssim_th
                params2 = jax.tree_util.tree_map(
                    lambda p, p0: jnp.where(do_reset, p0, p), params2, self._params0
                )
                reset_count = state["reset_count"] + do_reset.astype(jnp.int32)
            else:
                reset_count = state["reset_count"]

            if not self.compute_metrics:
                new_state = {
                    **state,
                    **new_state_extras,
                    "params": params2,
                    "opt": opt2,
                    "key": key,
                    "step": step_i + 1,
                    "reset_count": reset_count,
                }
                return new_state, disp

            epe, bad3 = disparity_metrics(disp, frame["target"])
            _, d1 = d1_metric(disp, frame["target"])
            i = jnp.minimum(step_i, self.max_steps - 1)
            new_state = {
                **state,
                **new_state_extras,
                "params": params2,
                "opt": opt2,
                "key": key,
                "step": step_i + 1,
                "reset_count": reset_count,
                "metrics": state["metrics"].at[i].set(
                    jnp.stack([epe, bad3, d1, new_loss])
                ),
            }
            return new_state, disp

        if self.disp_dtype is not None:
            _inner_step = step

            def step(state, frame):  # noqa: F811 — consumer-output cast
                s, d = _inner_step(state, frame)
                return s, d.astype(self.disp_dtype)

        # keep the traceable step for the chunked-dispatch mode
        # (step_chunk scans it over a [K]-frame axis in one program)
        self._raw_step = step

        if self.num_streams:
            # N independent streams in one program: per-stream state and
            # frames carry a leading stream axis; params0 (closure
            # constant) broadcasts. Streams can also be sharded over a
            # mesh (stream-parallel serving: whole streams per device).
            if self.stream_impl == "map":
                # sequential per-stream execution preserves the switch
                # path's partial backward — full single-stream efficiency
                def mstep(state, frame):
                    return jax.lax.map(lambda sf: step(sf[0], sf[1]), (state, frame))

                return jax.jit(mstep, donate_argnums=(0,))
            if self.stream_impl == "unroll":
                # same per-stream semantics as "map" but with STATIC
                # stream indices instead of a lax.map while-loop: the
                # map body pays ~24 separate dynamic-slice /
                # dynamic-update-slice kernels per stream-iteration
                # (state in/out of the stacked carry) plus loop
                # overhead — fixed launch costs that measured ~19% off
                # the per-stream throughput at 4 streams. Unrolling
                # makes the slices/stacks static (fusable) and leaves
                # the N independent stream computations visible to the
                # scheduler. Cost: an N-times larger program (compile
                # time), so "map" stays the default.
                ns = self.num_streams

                def ustep(state, frame):
                    at = lambda t, i: jax.tree_util.tree_map(  # noqa: E731
                        lambda x: x[i], t
                    )
                    outs = [step(at(state, i), at(frame, i)) for i in range(ns)]
                    new_state = jax.tree_util.tree_map(
                        lambda *xs: jnp.stack(xs), *[o[0] for o in outs]
                    )
                    disp = jnp.stack([o[1] for o in outs])
                    return new_state, disp

                return jax.jit(ustep, donate_argnums=(0,))
            vstep = jax.vmap(step)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                ssh = NamedSharding(self.mesh, P(self.spatial_axis))
                return jax.jit(
                    vstep,
                    in_shardings=(ssh, ssh),
                    out_shardings=(ssh, ssh),
                    donate_argnums=(0,),
                )
            return jax.jit(vstep, donate_argnums=(0,))
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            wsh = NamedSharding(self.mesh, P(None, None, self.spatial_axis))
            # state replicated, frame width-sharded (pytree-prefix
            # shardings); GSPMD partitions the convs with halo exchange
            # and all-reduces the loss/metric scalars
            return jax.jit(
                step,
                in_shardings=(repl, wsh),
                out_shardings=(repl, wsh),
                donate_argnums=(0,),
            )
        return jax.jit(step, donate_argnums=(0,))

    # -------------------------------------------------------------------- api
    def step(self, frame: Dict) -> None:
        """Async: dispatches one frame; returns immediately.

        The frame's full-resolution disparity is kept as ``last_disp``
        (an async device array) so callers that need per-stride
        artifacts (PNG dumps / TB images, Stereo_Online_Adaptation.py
        :135-136,246-251) can ``jax.device_get`` it at their own
        cadence without forcing a sync on every frame."""
        self.state, self.last_disp = self._step_fn(self.state, frame)

    def fetch_disp(self):
        """Low-latency per-frame disparity fetch: starts the
        device->host copy of ``last_disp`` WITHOUT blocking and returns
        a zero-arg materializer (numpy array when called).

        This is the robot-consumer serving mode (the reference fetches
        the disparity every ``sess.run``, Demo/demo_model.py:251-258
        equivalent): call right after ``step`` so the transfer rides the
        in-flight step instead of issuing a blocking sync afterwards —
        on this runtime a blocking ``device_get`` pays a ~27 ms
        degraded-sync roundtrip that the async copy avoids. Combine with
        ``disp_dtype=jnp.float16`` to halve the transferred bytes.
        Same pattern as ``snapshot_params`` (proven non-blocking)."""
        d = self.last_disp
        try:
            d.copy_to_host_async()
        except AttributeError:  # runtime without the async hint
            pass
        return lambda: np.asarray(jax.device_get(d))

    def step_pipelined(self, frame: Dict):
        """Depth-1 pipelined serving step: dispatch this frame + start
        its disparity's async D2H copy, then return the PREVIOUS frame's
        disparity as numpy (``None`` on the very first call).

        This is the lowest-latency per-frame serving mode the framework
        ships: frame i's device->host copy overlaps frame i+1's
        execution instead of paying a blocking sync into a busy queue,
        so the consumer-observed interval approaches the device step
        time plus the one-way transfer (measured: ~44-56 ms p50 on the
        tunneled harness vs ~106 ms blocking; sub-10 ms floor; see
        docs/SERVING.md). The cost is ONE frame of staleness — the
        disparity a robot loop acts on is of the previous camera frame,
        which a fixed-rate consumer experiences as pure latency, not a
        trajectory change. Counterpart of the reference demo's per-frame
        ``sess.run`` fetch (Demo/demo_model.py:251-258), re-pipelined.
        Combine with ``disp_dtype=jnp.float16`` to halve the bytes.

        Call :meth:`flush_disp` after the last frame to drain the final
        pending disparity."""
        self.step(frame)
        nxt = self.fetch_disp()
        prev, self._pending_disp = self._pending_disp, nxt
        return prev() if prev is not None else None

    def flush_disp(self):
        """Materialize + clear the disparity left in flight by the last
        :meth:`step_pipelined` call (``None`` if nothing is pending)."""
        pending, self._pending_disp = self._pending_disp, None
        return pending() if pending is not None else None

    def serve(self, frames):
        """Depth-1 pipelined serving loop over an iterable of frames.

        Yields one numpy disparity PER INPUT FRAME, in frame order,
        using the :meth:`step_pipelined` overlap (frame i's result is
        yielded while frame i+1 executes; the final disparity is drained
        after the input ends). The steady-state yield interval is the
        pipelined latency, not the blocking-sync latency."""
        pending = None
        for f in frames:
            self.step(f)
            nxt = self.fetch_disp()
            if pending is not None:
                yield pending()
            pending = nxt
        if pending is not None:
            yield pending()

    def step_chunk(self, frames: Dict, unroll: int = 1) -> None:
        """Async: dispatches K frames in ONE program (lax.scan over the
        fused step; the frames pytree carries a leading [K] axis).

        The per-dispatch host cost (~0.3 ms on this runtime — enqueue,
        argument parsing, done-event plumbing) caps a 2.3 ms device step
        at ~390 FPS when paid per frame; scanning K frames per dispatch
        amortizes it K-fold. The adaptation trajectory is IDENTICAL to K
        sequential ``step`` calls (scan is sequential); the tradeoff is
        K-1 frames of extra pipeline latency, so this is the
        throughput-serving mode. ``last_disp`` holds the [K] stacked
        disparities.

        Multi-stream sessions chunk too: pass frames with a leading
        [K, num_streams] prefix; each scan iteration runs one frame of
        every stream (same per-iteration composition as ``step``), so
        one dispatch advances K*N frames.

        ``unroll`` (default 1) is forwarded to ``lax.scan`` — unrolling
        the body U-fold removes the scan's per-iteration frame-slice /
        output-stack kernels at the cost of a U-times larger program.
        Fixed at the first call (the compiled program is cached).
        """
        if self._chunk_fn is None:
            if self.mesh is not None:
                raise ValueError(
                    "step_chunk is a single-chip dispatch optimization; "
                    "mesh sessions amortize dispatch differently"
                )
            raw = self._raw_step
            if self.num_streams and self.stream_impl == "map":
                base = lambda st, fr: jax.lax.map(  # noqa: E731
                    lambda sf: raw(sf[0], sf[1]), (st, fr)
                )
            elif self.num_streams and self.stream_impl == "unroll":
                ns = self.num_streams

                def base(st, fr):
                    at = lambda t, i: jax.tree_util.tree_map(  # noqa: E731
                        lambda x: x[i], t
                    )
                    outs = [raw(at(st, i), at(fr, i)) for i in range(ns)]
                    return (
                        jax.tree_util.tree_map(
                            lambda *xs: jnp.stack(xs), *[o[0] for o in outs]
                        ),
                        jnp.stack([o[1] for o in outs]),
                    )

            elif self.num_streams:
                base = jax.vmap(raw)
            else:
                base = raw
            self._chunk_fn = jax.jit(
                lambda state, fr: jax.lax.scan(base, state, fr, unroll=unroll),
                donate_argnums=(0,),
            )
        self.state, disps = self._chunk_fn(self.state, frames)
        self.last_disp = disps

    def finalize(self) -> Dict[str, np.ndarray]:
        """Block + transfer the accumulated statistics (one sync).

        Multi-stream sessions return arrays with a leading [num_streams]
        axis (every stream has taken the same number of steps)."""
        s = self.state
        nsteps = int(np.max(jax.device_get(s["step"])))
        fetch = {
            "scores": s["scores"],
            "fetch_counter": s["fetch_counter"],
            "reset_count": s["reset_count"],
        }
        if self.compute_metrics:
            fetch["metrics"] = s["metrics"]
        host = jax.device_get(fetch)
        if self.compute_metrics:
            m = host.pop("metrics")[..., :nsteps, :]
            for j, k in enumerate(("epe", "bad3", "d1", "loss")):
                host[k] = m[..., j]
        host["steps"] = nsteps
        return host

    def current_params(self):
        """The adapted params as a pytree (device arrays) — unravels the
        arena view when arena mode is on. Use for checkpointing or for
        handing weights to a host session/engine."""
        p = self.state["params"]
        return self._unravel_fn(p) if self.spec is not None else p

    def snapshot_params(self):
        """Non-blocking weight snapshot for periodic checkpointing of a
        live stream: starts the device->host copy of the current params
        WITHOUT waiting (the dispatch queue keeps draining), returns a
        zero-arg callable that materializes the pytree (numpy leaves)
        when called. Copying the arena vector is one contiguous
        transfer; the unravel to a pytree happens on host at
        materialization time.

        Production pattern: ``get = sess.snapshot_params()`` inside the
        frame loop at the checkpoint stride, ``save_params(path, get())``
        on a writer thread.
        """
        # device-side copy first: state["params"] is DONATED to the next
        # step, so holding the live buffer would be invalidated; the copy
        # (one contiguous HBM pass in arena mode) is owned by the
        # snapshot and stays valid across any number of future steps
        p = jax.tree_util.tree_map(jnp.copy, self.state["params"])
        for leaf in jax.tree_util.tree_leaves(p):
            try:
                leaf.copy_to_host_async()
            except AttributeError:  # runtime without the async hint
                pass
        if self.spec is not None:
            entries = self.spec.entries
            ns = self.num_streams

            def materialize():
                # pure-host unravel: touching the device here would sync
                # into the (busy) stream's dispatch queue
                flat = np.asarray(jax.device_get(p))
                out: Dict = {}
                for path, shape, off, size in entries:
                    node = out
                    for k in path[:-1]:
                        node = node.setdefault(k, {})
                    leaf = flat[..., off : off + size]
                    node[path[-1]] = leaf.reshape(
                        ((ns,) if ns else ()) + tuple(shape)
                    )
                return out

            return materialize
        return lambda: jax.tree_util.tree_map(np.asarray, jax.device_get(p))

    def block_until_ready(self) -> None:
        """True synchronization: fetches the step counter. (A plain
        ``jax.block_until_ready`` on a donated output buffer can return
        before the program finishes on some PJRT runtimes; a device->host
        transfer always waits.)"""
        jax.device_get(self.state["step"])
