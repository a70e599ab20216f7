"""Live adaptation demo — counterpart of reference ``Demo/``
(Live_Adaptation_Demo.py + demo_model.py): a camera grabber thread
feeds stereo pairs through a bounded queue into a real-time stereo
thread that infers + adapts each frame (NONE/FULL/MAD with Adam, as the
demo uses — demo_model.py:163) and optionally displays input/disparity
with OpenCV.

Headless operation is first-class: ``--camera folder`` replays image
pairs and ``--display none`` writes PNGs instead of opening windows.
"""

from __future__ import annotations

import argparse
import os
import queue
import threading
import time

import numpy as np

__all__ = ["RealTimeStereo", "build_argparser", "main"]


class RealTimeStereo(threading.Thread):
    """Consumes stereo pairs from a queue; per frame: resize/crop to the
    working resolution, adaptation step, score update, reset check,
    display/serialize (reference demo_model.py:233-284)."""

    def __init__(
        self,
        in_queue: queue.Queue,
        session,
        image_shape=(480, 640),
        crop_shape=(320, 512),
        display: str = "cv2",
        out_dir: str | None = None,
        max_frames: int | None = None,
        colormap: str = "jet",
    ):
        super().__init__(daemon=True)
        self.queue = in_queue
        self.session = session
        # rescale-then-crop input stages, as the reference demo
        # (demo_model.py:80-86): image_shape is the bilinear rescale
        # target, crop_shape the centered crop; either may be None.
        self.image_shape = tuple(image_shape) if image_shape else None
        self.crop_shape = tuple(crop_shape) if crop_shape else None
        self.display = display
        self.out_dir = out_dir
        self.max_frames = max_frames
        self.colormap = colormap
        self.frame_times: list = []
        # NB: must not be named `_stop` (threading.Thread internal)
        self._stop_evt = threading.Event()

    def stop(self):
        self._stop_evt.set()

    def _emit(self, disp, left, right, n):
        """Display or serialize one disparity (reference demo_model.py
        :219-225,251-258)."""
        from real_time_self_adaptive_deep_stereo_tpu.utils.visual import (
            colorize_disparity,
            save_disparity_png,
        )

        if self.display == "cv2":  # pragma: no cover - needs a display
            import cv2

            vis = (
                colorize_disparity(disp, cmap=self.colormap) * 255
            ).astype(np.uint8)
            vis = np.ascontiguousarray(vis[..., ::-1])
            cv2.putText(
                vis,
                f"{self.fps:5.1f} FPS  frame {n}",
                (8, 24),
                cv2.FONT_HERSHEY_SIMPLEX,
                0.7,
                (255, 255, 255),
                2,
            )
            cv2.imshow("disparity", vis)
            # left + right input windows, as the reference demo
            # (demo_model.py:219-225)
            cv2.imshow("left", left.astype(np.uint8)[..., ::-1])
            cv2.imshow("right", right.astype(np.uint8)[..., ::-1])
            cv2.waitKey(1)
        elif self.out_dir:
            os.makedirs(self.out_dir, exist_ok=True)
            save_disparity_png(
                os.path.join(self.out_dir, f"disparity_{n:05d}.png"), disp
            )

    def run(self):
        import jax.numpy as jnp

        from real_time_self_adaptive_deep_stereo_tpu.data.readers import (
            center_crop_or_pad,
            resize_image_np,
        )

        # The fused session serves with the depth-1 pipeline: frame i's
        # disparity materializes while frame i+1 executes (lowest
        # measured per-frame latency; one frame of display staleness).
        # The host session is the reference-style blocking consumer.
        pipelined = hasattr(self.session, "step_pipelined")
        n = 0
        last_inputs = None
        while not self._stop_evt.is_set():
            try:
                item = self.queue.get(timeout=2.0)
            except queue.Empty:
                continue
            if item is None:
                break
            t0 = time.perf_counter()
            left, right = item[0], item[1]
            if self.image_shape is not None:
                left = resize_image_np(left, *self.image_shape)
                right = resize_image_np(right, *self.image_shape)
            if self.crop_shape is not None:
                left = center_crop_or_pad(left, *self.crop_shape)
                right = center_crop_or_pad(right, *self.crop_shape)
            h, w = left.shape[:2]
            frame = {
                "left": jnp.asarray(left[None]),
                "right": jnp.asarray(right[None]),
            }
            if pipelined:
                out = self.session.step_pipelined(frame)
                disp = None if out is None else np.asarray(out)[0]
            else:
                frame["target"] = jnp.zeros((1, h, w, 1), jnp.float32)
                disp = np.asarray(self.session.step(frame)["disp"])[0]
            self.frame_times.append(time.perf_counter() - t0)
            n += 1
            if disp is not None:
                self._emit(disp, left, right, n - 1 if pipelined else n)
            last_inputs = (left, right)
            if self.max_frames and n >= self.max_frames:
                break
        if pipelined and last_inputs is not None:
            disp = self.session.flush_disp()  # drain the in-flight frame
            if disp is not None:
                self._emit(np.asarray(disp)[0], *last_inputs, n)

    @property
    def fps(self) -> float:
        """Steady-state throughput: mean over the last 100 frames,
        excluding the first 3 (the first step pays the XLA compile or
        compile-cache load — minutes vs milliseconds; averaging it in
        made short headless runs report nonsense)."""
        times = self.frame_times
        if len(times) > 6:
            times = times[3:]
        if not times:
            return 0.0
        return 1.0 / np.mean(times[-100:])


def build_argparser() -> argparse.ArgumentParser:
    from real_time_self_adaptive_deep_stereo_tpu.adapt.samplers import AVAILABLE_SAMPLER

    p = argparse.ArgumentParser(description="Live self-adaptive stereo demo (TPU)")
    p.add_argument("--weights", required=True)
    p.add_argument("--blockConfig", required=True)
    p.add_argument("--modelName", default="MADNet")
    p.add_argument("--mode", default="MAD", choices=["NONE", "FULL", "MAD"])
    p.add_argument("--lr", type=float, default=0.0001)
    p.add_argument("--sampleMode", default="PROBABILITY", choices=AVAILABLE_SAMPLER)
    p.add_argument(
        "--imageShape",
        type=int,
        nargs="+",
        default=[480, 640],
        help="rescale camera frames to [height,width] before cropping "
        "(reference demo default 480x640); -1 to disable",
    )
    p.add_argument(
        "--cropShape",
        type=int,
        nargs="+",
        default=[320, 512],
        help="centered crop applied after the rescale (reference demo "
        "default 320x512); -1 to disable",
    )
    p.add_argument("--SSIMTh", type=float, default=0.5)
    p.add_argument("--camera", default="folder")
    p.add_argument("--list", default=None, help="pair list for --camera folder")
    p.add_argument("--loop", action="store_true")
    p.add_argument("--display", default="cv2", choices=["cv2", "none"])
    p.add_argument(
        "--colormap",
        default="jet",
        help="matplotlib colormap for the disparity window (jet, magma, "
        "viridis, turbo, ...); the reference demo uses jet",
    )
    p.add_argument("--outDir", default=None)
    p.add_argument("--maxFrames", type=int, default=None)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument(
        "--sessionMode",
        default="auto",
        choices=["auto", "fused", "host"],
        help="fused (default): on-device controller + depth-1 pipelined "
        "f16 disparity fetch — the lowest-latency serving mode; host: "
        "reference-style blocking per-frame consumer",
    )
    return p


def main(args) -> float:
    import jax

    from real_time_self_adaptive_deep_stereo_tpu.utils.compile_cache import enable

    enable()  # persistent XLA cache: CLIs must not cold-compile per process

    from real_time_self_adaptive_deep_stereo_tpu.adapt import (
        AdaptationEngine,
        OnlineAdaptationSession,
        load_block_config,
        make_blocks,
    )
    from real_time_self_adaptive_deep_stereo_tpu.data.grabber import get_camera
    from real_time_self_adaptive_deep_stereo_tpu.models import get_stereo_net
    from real_time_self_adaptive_deep_stereo_tpu.utils.checkpoint import restore_or_init

    model_kwargs = {}
    if args.modelName == "MADNet":
        model_kwargs["bulkhead"] = args.mode == "MAD"
    model = get_stereo_net(args.modelName, **model_kwargs)
    params = model.init(jax.random.PRNGKey(args.seed or 0))
    params, restored, _ = restore_or_init("/nonexistent", params, args.weights, model)
    if not restored:
        raise SystemExit(f"could not restore weights from {args.weights}")

    blocks = make_blocks(load_block_config(args.blockConfig), model.layer_to_path)
    # the live demo adapts with Adam (reference demo_model.py:163)
    engine = AdaptationEngine(model, blocks, lr=args.lr, optimizer="adam")
    session_mode = getattr(args, "sessionMode", "auto")
    if session_mode == "auto":
        session_mode = "fused"
    if session_mode == "fused":
        # production serving shape: the whole controller on device, no
        # ground truth (compute_metrics=False — live cameras have none),
        # f16 consumer output (halves D2H bytes), depth-1 pipelined
        # fetch in RealTimeStereo.run. This replaces the r4 demo's
        # blocking np.asarray per frame — the worst measured serving
        # pattern (docs/SERVING.md).
        import jax.numpy as jnp

        from real_time_self_adaptive_deep_stereo_tpu.adapt.fused import (
            FusedOnlineSession,
        )

        session = FusedOnlineSession(
            engine,
            params,
            mode=args.mode,
            sample_mode=args.sampleMode,
            ssim_th=args.SSIMTh,
            seed=args.seed or 0,
            compute_metrics=False,
            disp_dtype=jnp.float16,
        )
    else:
        session = OnlineAdaptationSession(
            engine,
            params,
            mode=args.mode,
            sample_mode=args.sampleMode,
            ssim_th=args.SSIMTh,
            seed=args.seed,
        )

    q: queue.Queue = queue.Queue(maxsize=1)
    cam = get_camera(args.camera, q, list_file=args.list, loop=args.loop)
    image_shape = None if args.imageShape[0] == -1 else args.imageShape
    crop_shape = None if args.cropShape[0] == -1 else args.cropShape
    worker = RealTimeStereo(
        q,
        session,
        image_shape=image_shape,
        crop_shape=crop_shape,
        display=args.display,
        out_dir=args.outDir,
        max_frames=args.maxFrames,
        colormap=args.colormap,
    )
    cam.start()
    worker.start()

    # stdin stop control (reference Live_Adaptation_Demo.py waits on
    # stdin): any input line stops the demo. EOF (closed stdin, e.g.
    # headless/batch runs) just retires the listener without stopping.
    def _stdin_stop():
        import sys

        try:
            line = sys.stdin.readline()
        except Exception:
            return
        if line:
            print("stop requested from stdin")
            cam.stop()
            worker.stop()

    threading.Thread(target=_stdin_stop, daemon=True).start()
    print("demo running — press Enter to stop")
    try:
        worker.join()
    except KeyboardInterrupt:
        pass
    cam.stop()
    worker.stop()
    print(f"demo done: {len(worker.frame_times)} frames, {worker.fps:.1f} FPS")
    return worker.fps


if __name__ == "__main__":
    main(build_argparser().parse_args())
