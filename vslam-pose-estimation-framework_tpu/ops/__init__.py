from vslam_tpu.ops import lie, camera, hamming
