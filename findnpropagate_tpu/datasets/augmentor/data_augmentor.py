"""DataAugmentor — cfg-named queue of world-level augmentations.

Parity with pcdet/datasets/augmentor/data_augmentor.py:11-395
(/root/reference). Each world aug also records its parameter
(flip_x / noise_rot / noise_scale / noise_translate) in the data_dict so
the self-training stage can invert them (pseudo_processor.AugReverse),
and transforms `pseudo_boxes` alongside gt when present.

gt_sampling (GT-database copy-paste) and the pseudo-label hooks
(load_frustum_pseudos / load_selftrain_pseudos / unknowns_copy_paste)
register here as the reference does; they are provided by the openvocab
subsystem and arrive via `register_extra` to keep this module dependency-free.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from ...utils import geometry_np as G

EXTRA_AUGMENTORS = {}


def register_extra(name, factory):
    EXTRA_AUGMENTORS[name] = factory


class DataAugmentor:
    def __init__(self, augmentor_configs, class_names, root_path=None, logger=None):
        self.class_names = class_names
        self.logger = logger
        self.root_path = root_path
        self.queue = []
        cfg_list = (
            augmentor_configs["AUG_CONFIG_LIST"]
            if isinstance(augmentor_configs, dict)
            else augmentor_configs
        )
        disable = (
            augmentor_configs.get("DISABLE_AUG_LIST", [])
            if isinstance(augmentor_configs, dict)
            else []
        )
        for cfg in cfg_list:
            name = cfg["NAME"]
            if name in disable:
                continue
            if name == "gt_sampling":
                from .database_sampler import DataBaseSampler

                self.queue.append(
                    DataBaseSampler(cfg, root_path, class_names, logger=logger)
                )
            elif name in EXTRA_AUGMENTORS:
                self.queue.append(EXTRA_AUGMENTORS[name](cfg, self))
            else:
                self.queue.append(partial(getattr(self, name), config=cfg))

    # --- world augs; each records its parameter for later inversion ---

    def random_world_flip(self, data_dict, config):
        gt_boxes = data_dict.get("gt_boxes")
        points = data_dict["points"]
        for axis in config["ALONG_AXIS_LIST"]:
            enable = np.random.random() < 0.5
            if axis == "x":
                data_dict["flip_x"] = float(enable)
                if enable:
                    points, gt_boxes = G.flip_along_x(points, gt_boxes)
                    if data_dict.get("pseudo_boxes") is not None:
                        _, data_dict["pseudo_boxes"] = G.flip_along_x(
                            points[:0], data_dict["pseudo_boxes"]
                        )
            elif axis == "y":
                data_dict["flip_y"] = float(enable)
                if enable:
                    points, gt_boxes = G.flip_along_y(points, gt_boxes)
                    if data_dict.get("pseudo_boxes") is not None:
                        _, data_dict["pseudo_boxes"] = G.flip_along_y(
                            points[:0], data_dict["pseudo_boxes"]
                        )
        data_dict["points"] = points
        if gt_boxes is not None:
            data_dict["gt_boxes"] = gt_boxes
        return data_dict

    def random_world_rotation(self, data_dict, config):
        rot_range = config["WORLD_ROT_ANGLE"]
        if not isinstance(rot_range, (list, tuple, np.ndarray)):
            rot_range = [-rot_range, rot_range]
        angle = np.random.uniform(rot_range[0], rot_range[1])
        data_dict["noise_rot"] = angle
        data_dict["points"] = G.rotate_points_along_z(data_dict["points"], angle)
        if data_dict.get("gt_boxes") is not None and len(data_dict["gt_boxes"]):
            data_dict["gt_boxes"] = G.rotate_boxes_along_z(
                data_dict["gt_boxes"], angle
            )
        if data_dict.get("pseudo_boxes") is not None and len(data_dict["pseudo_boxes"]):
            data_dict["pseudo_boxes"] = G.rotate_boxes_along_z(
                data_dict["pseudo_boxes"], angle
            )
        return data_dict

    def random_world_scaling(self, data_dict, config):
        lo, hi = config["WORLD_SCALE_RANGE"]
        scale = np.random.uniform(lo, hi) if hi - lo >= 1e-3 else 1.0
        data_dict["noise_scale"] = scale
        data_dict["points"] = data_dict["points"].copy()
        data_dict["points"][:, :3] *= scale
        for key in ("gt_boxes", "pseudo_boxes"):
            if data_dict.get(key) is not None and len(data_dict[key]):
                b = data_dict[key].copy()
                b[:, :6] *= scale
                if b.shape[1] > 8:
                    b[:, 7:9] *= scale
                data_dict[key] = b
        return data_dict

    def random_world_translation(self, data_dict, config):
        std = config["NOISE_TRANSLATE_STD"]
        if not isinstance(std, (list, tuple, np.ndarray)):
            std = [std, std, std]
        offset = np.array(
            [np.random.normal(0, s) for s in std], dtype=np.float32
        )
        data_dict["noise_translate"] = offset
        data_dict["points"] = data_dict["points"].copy()
        data_dict["points"][:, :3] += offset
        for key in ("gt_boxes", "pseudo_boxes"):
            if data_dict.get(key) is not None and len(data_dict[key]):
                b = data_dict[key].copy()
                b[:, :3] += offset
                data_dict[key] = b
        return data_dict

    def forward(self, data_dict):
        for aug in self.queue:
            data_dict = aug(data_dict)
        if data_dict.get("gt_boxes") is not None and len(data_dict["gt_boxes"]):
            data_dict["gt_boxes"][:, 6] = G.limit_period(
                data_dict["gt_boxes"][:, 6], offset=0.5, period=2 * np.pi
            )
        if "gt_boxes_mask" in data_dict:
            mask = data_dict.pop("gt_boxes_mask")
            if data_dict.get("gt_boxes") is not None:
                data_dict["gt_boxes"] = data_dict["gt_boxes"][mask]
                data_dict["gt_names"] = np.asarray(data_dict["gt_names"])[mask]
        return data_dict
