from vslam_tpu.frontend import detect, orb, matching
