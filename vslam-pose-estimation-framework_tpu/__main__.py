from vslam_tpu.system.cli import main

main()
