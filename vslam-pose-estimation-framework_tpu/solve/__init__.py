from vslam_tpu.solve import gn, aligners
