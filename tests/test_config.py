import textwrap

from findnpropagate_tpu.config import EDict, cfg_from_list, cfg_from_yaml_file


def test_edict_attr_access():
    d = EDict({"A": 1, "B": {"C": [1, 2, {"D": 3}]}})
    assert d.A == 1
    assert d.B.C[2].D == 3
    d.E = {"F": 5}
    assert d.E.F == 5


def test_base_config_inheritance(tmp_path):
    base = tmp_path / "cfgs" / "dataset_configs"
    base.mkdir(parents=True)
    (base / "base.yaml").write_text(
        textwrap.dedent(
            """
            DATA_CONFIG:
                POINT_CLOUD_RANGE: [0, -40, -3, 70.4, 40, 1]
                SHARED: base
            """
        )
    )
    child_dir = tmp_path / "cfgs" / "kitti_models"
    child_dir.mkdir(parents=True)
    child = child_dir / "model.yaml"
    child.write_text(
        textwrap.dedent(
            f"""
            CLASS_NAMES: [Car]
            _BASE_CONFIG_: {base / 'base.yaml'}
            DATA_CONFIG:
                SHARED: child
            MODEL:
                NAME: PointPillar
            """
        )
    )
    cfg = cfg_from_yaml_file(str(child))
    assert cfg.CLASS_NAMES == ["Car"]
    assert cfg.DATA_CONFIG.POINT_CLOUD_RANGE[3] == 70.4
    assert cfg.DATA_CONFIG.SHARED == "child"  # child overrides base
    assert cfg.MODEL.NAME == "PointPillar"
    assert cfg.TAG == "model"
    assert cfg.EXP_GROUP_PATH == "kitti_models"


def test_cfg_from_list_overrides():
    cfg = EDict({"MODEL": {"NAME": "X", "LR": 0.1, "LIST": [1, 2]}})
    cfg_from_list(["MODEL.NAME", "Y", "MODEL.LR", "0.5", "MODEL.NEW.DEEP", "7"], cfg)
    assert cfg.MODEL.NAME == "Y"
    assert cfg.MODEL.LR == 0.5
    assert cfg.MODEL.NEW.DEEP == 7
