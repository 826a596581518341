"""Config system tests: shipped YAML files parse; overrides apply."""

import glob
import os

import pytest

from vslam_tpu.io.config import ParameterCollection, load_config, save_config

CONFIG_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "configurations")


@pytest.mark.parametrize("path", sorted(glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))))
def test_shipped_configs_parse(path):
    cfg = load_config(path)
    assert cfg.framepoint_generation.capacity > 0
    assert cfg.tracking.motion_model in ("NONE", "CONSTANT_VELOCITY")
    assert cfg.command_line.tracker_mode in ("RGB_STEREO", "RGB_DEPTH")


def test_config_count_matches_reference():
    """Reference ships kitti, kitti_fast, euroc, tum, icl (+xtion live-only);
    the dataset-playback set must all exist here."""
    names = {os.path.basename(p) for p in glob.glob(os.path.join(CONFIG_DIR, "*.yaml"))}
    for want in ["configuration_kitti.yaml", "configuration_kitti_fast.yaml",
                 "configuration_euroc.yaml", "configuration_tum.yaml",
                 "configuration_icl.yaml"]:
        assert want in names


def test_tum_is_depth_mode():
    cfg = load_config(os.path.join(CONFIG_DIR, "configuration_tum.yaml"))
    assert cfg.command_line.tracker_mode == "RGB_DEPTH"
    assert cfg.framepoint_generation.maximum_depth_meters == 5.0


def test_overrides_beat_yaml():
    cfg = load_config(os.path.join(CONFIG_DIR, "configuration_kitti.yaml"),
                      overrides={"tracking.motion_model": "NONE"})
    assert cfg.tracking.motion_model == "NONE"


def test_save_roundtrip(tmp_path):
    cfg = ParameterCollection()
    cfg.tracking.good_tracking_ratio = 0.42
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    back = load_config(p)
    assert back.tracking.good_tracking_ratio == 0.42


import os
import pytest

REF_CONFIG_DIR = "/root/reference/configurations"


@pytest.mark.skipif(not os.path.isdir(REF_CONFIG_DIR),
                    reason="reference configs not present")
@pytest.mark.parametrize("name", [
    "configuration_kitti.yaml", "configuration_kitti_fast.yaml",
    "configuration_euroc.yaml", "configuration_tum.yaml",
    "configuration_icl.yaml", "configuration_xtion.yaml",
])
def test_reference_yaml_files_load(name):
    """Config-compat claim, proven on the REFERENCE's own YAML files
    (parameters.cpp:272-441 groups): every file loads, recognized keys
    land in the right groups, unknown keys warn instead of raising."""
    from vslam_tpu.io.config import load_config

    cfg = load_config(os.path.join(REF_CONFIG_DIR, name))
    # Spot checks: widely-present keys must transfer with real values.
    assert cfg.local_map.minimum_number_of_landmarks > 0
    assert cfg.command_line.tracker_mode in ("RGB_STEREO", "RGB_DEPTH")
    assert cfg.world_map.minimum_distance_traveled_for_local_map > 0
    if name.startswith("configuration_kitti"):
        assert cfg.command_line.tracker_mode == "RGB_STEREO"
    if name in ("configuration_tum.yaml", "configuration_icl.yaml",
                "configuration_xtion.yaml"):
        assert cfg.command_line.tracker_mode == "RGB_DEPTH"
