"""Online adaptation session: the host-side frame loop.

This is the runtime the reference keeps inline in its entry scripts
(Stereo_Online_Adaptation.py:156-253, Stereo_Continual_Adaptation.py:163-284):
reward-driven block sampling, score updates, the loss-threshold network
reset, and metric accumulation. Here it is a reusable class around the
jitted :class:`AdaptationEngine` steps.

Per frame exactly one device->host scalar sync happens (the adaptation
loss, needed by the reward update and the reset safeguard); metric
scalars ride along in the same result pytree. Heavy outputs (the
disparity map) stay on device unless the caller asks for them.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import jax
import numpy as np

from real_time_self_adaptive_deep_stereo_tpu.adapt.engine import AdaptationEngine
from real_time_self_adaptive_deep_stereo_tpu.adapt.samplers import get_sampler, softmax

__all__ = ["OnlineAdaptationSession", "SessionStats"]


@dataclass
class SessionStats:
    epe: List[float] = field(default_factory=list)
    bad3: List[float] = field(default_factory=list)
    d1: List[float] = field(default_factory=list)
    loss: List[float] = field(default_factory=list)
    fetch_counter: List[int] = field(default_factory=list)
    sample_distribution: Optional[np.ndarray] = None
    reset_counter: int = 0
    steps: int = 0
    exec_time: float = 0.0

    @property
    def fps(self) -> float:
        return self.steps / self.exec_time if self.exec_time > 0 else 0.0


class OnlineAdaptationSession:
    """Drives NONE / FULL / MAD adaptation over a frame stream.

    Reward bookkeeping matches the reference: after each step, the
    expected loss is linearly extrapolated from the two previous losses
    and the realised gain is credited to the last-trained blocks with
    exponential decay (Stereo_Online_Adaptation.py:211-224; decay/uf
    tunable as in Stereo_Continual_Adaptation.py:225-238).
    """

    def __init__(
        self,
        engine: AdaptationEngine,
        params,
        mode: str = "MAD",
        sample_mode: str = "PROBABILITY",
        num_blocks: int = 1,
        fixed_id=0,
        sample_frequency: int = 1,
        ssim_th: float = 0.5,
        decay: float = 0.99,
        uf: float = 0.01,
        dilation: int = 1,
        seed: Optional[int] = None,
    ):
        if mode not in ("NONE", "FULL", "MAD"):
            raise ValueError(f"unknown adaptation mode {mode!r}")
        self.engine = engine
        self.mode = mode
        self.ssim_th = ssim_th
        self.decay = decay
        self.uf = uf
        self.dilation = max(1, dilation)
        self.sample_frequency = max(1, sample_frequency)

        self.params = params
        # pristine weights for the reset safeguard, kept on device as
        # separate buffers (step fns donate self.params, so it must not
        # alias these)
        self.params0 = jax.tree_util.tree_map(lambda x: x.copy(), params)
        self.opt = engine.init_opt(params) if mode != "NONE" else None

        n_actions = len(engine.blocks) if mode == "MAD" else 1
        self.n_actions = n_actions
        self.sampler = (
            get_sampler(sample_mode, num_blocks, fixed_id, seed) if mode == "MAD" else None
        )
        self.scores = np.zeros((n_actions,), np.float64)
        self._loss_t1 = 0.0
        self._loss_t2 = 0.0
        self._last_trained: List[int] = []
        self._blocks_to_train: List[int] = []
        self.stats = SessionStats(fetch_counter=[0] * n_actions)

    # ------------------------------------------------------------------ step
    def step(self, frame: Dict) -> Dict[str, float]:
        """Process one frame: adapt (per mode) and return scalar metrics."""
        t0 = time.perf_counter()
        step_idx = self.stats.steps

        if self.mode == "MAD" and step_idx % self.sample_frequency == 0:
            distribution = softmax(self.scores)
            self._blocks_to_train = list(self.sampler.sample(distribution))
            for k in self._blocks_to_train:
                self.stats.fetch_counter[k] += 1

        train_this_step = step_idx % self.dilation == 0
        if self.mode == "NONE" or not train_this_step:
            res = self.engine.infer(self.params, frame)
        elif self.mode == "FULL":
            self.params, self.opt, res = self.engine.adapt_full(
                self.params, self.opt, frame
            )
        elif len(self._blocks_to_train) == 1:  # MAD, single block
            k = self._blocks_to_train[0]
            self.params, self.opt, res = self.engine.adapt_block(k)(
                self.params, self.opt, frame
            )
        else:  # MAD, numBlocks>1: one-shot — all gradients at pre-step
            # params, disjoint updates applied together (the reference's
            # single-sess.run semantics, Stereo_Online_Adaptation.py:201-208)
            self.params, self.opt, res = self.engine.adapt_blocks(
                self._blocks_to_train
            )(self.params, self.opt, frame)

        new_loss = float(res["loss"])  # the single host sync per frame

        # The reward/score update runs EVERY frame — only the train ops are
        # dilation-gated (Stereo_Continual_Adaptation.py:212 gates the op,
        # :225-238 updates scores and rolls loss_t_1/loss_t_2 unconditionally).
        if self.mode == "MAD":
            if step_idx == 0:
                self._loss_t1 = self._loss_t2 = new_loss
            expected = 2.0 * self._loss_t1 - self._loss_t2
            gain = expected - new_loss
            self.scores *= self.decay
            for k in self._last_trained:
                self.scores[k] += self.uf * gain
            self._last_trained = self._blocks_to_train
            self._loss_t2 = self._loss_t1
            self._loss_t1 = new_loss

        # reset safeguard (Stereo_Online_Adaptation.py:241-244)
        if new_loss > self.ssim_th and self.mode != "NONE":
            self.reset()

        epe = float(res["epe"])
        bad3 = float(res["bad3"])
        d1 = float(res["d1"])
        self.stats.epe.append(epe)
        self.stats.bad3.append(bad3)
        self.stats.d1.append(d1)
        self.stats.loss.append(new_loss)
        self.stats.steps += 1
        self.stats.exec_time += time.perf_counter() - t0
        self.stats.sample_distribution = self.scores.copy()
        out = {"loss": new_loss, "epe": epe, "bad3": bad3, "d1": d1}
        out["disp"] = res["disp"]  # device array; fetch only if needed
        return out

    def reset(self) -> None:
        """Restore pristine weights (optimizer state intentionally kept,
        matching the reference whose restore touches model vars only)."""
        # copy so a later donated step cannot clobber the pristine buffers
        self.params = jax.tree_util.tree_map(lambda x: x.copy(), self.params0)
        self.stats.reset_counter += 1
