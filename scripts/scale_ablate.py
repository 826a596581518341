"""Scale-run ablation driver: bundle lag / BA / closure knobs at 1024
frames.  In-session diagnostic.

Usage: python scripts/scale_ablate.py lag0 lag1 noba ...
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from scripts.scale_run import run_scale
    from vslam_tpu.tracking import tracker as tr_mod

    from vslam_tpu.system import ba_runner

    variants = sys.argv[1:] or ["lag1"]
    n = int(os.environ.get("N_FRAMES", "1024"))
    for v in variants:
        lag = 0 if "lag0" in v else 1
        ba = "noba" not in v
        orig_init = tr_mod.FusedPoseTracker.__init__

        def patched(self, *a, _lag=lag, **kw):
            orig_init(self, *a, **kw)
            self._bundle_lag = _lag

        tr_mod.FusedPoseTracker.__init__ = patched
        orig_ba = ba_runner.run_windowed_ba
        kw = {}
        if "noLM" in v:
            kw["write_landmarks"] = False
        if "noPose" in v:
            kw["write_poses"] = False
        if "noLive" in v:
            kw["update_live"] = False
        if kw:
            ba_runner.run_windowed_ba = (
                lambda engine, _kw=kw: orig_ba(engine, **_kw)
            )
        try:
            m = run_scale(n_frames=n, enable_ba=ba, verbose=False)
        finally:
            tr_mod.FusedPoseTracker.__init__ = orig_init
            ba_runner.run_windowed_ba = orig_ba
        print(
            f"{v}: fps={m['fps']} ate={m['ate_rmse_m']} "
            f"closures={m['n_closures']} opts={m['n_pose_graph_optimizations']} "
            f"ba={m['n_ba_runs']} breaks={m['tracking_breaks']}",
            flush=True,
        )


if __name__ == "__main__":
    main()
