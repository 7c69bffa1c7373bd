"""3D matplotlib scene rendering (tools/visual_utils/pyplot_vis_utils.py —
parity target /root/reference/tools/visual_utils/pyplot_vis_utils.py:94-274
and the draw_scenes contract of open3d_vis_utils.py): a synthetic scene
with GT + prediction boxes must render to a non-trivial PNG headlessly."""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from visual_utils.pyplot_vis_utils import (  # noqa: E402
    draw_scenes,
    save_scene,
)


def _scene():
    rng = np.random.RandomState(0)
    pts = rng.uniform(-40, 40, (5000, 4)).astype(np.float32)
    pts[:, 2] = rng.uniform(-2, 2, 5000)
    gt = np.array([[5, 5, -1, 4, 2, 1.6, 0.3],
                   [-10, 3, -1, 0.6, 0.6, 1.7, 0.0]], np.float32)
    pred = np.array([[5.2, 5.1, -1, 4.1, 2.0, 1.5, 0.25],
                     [20, -8, -1, 2.0, 0.8, 1.2, 1.2]], np.float32)
    scores = np.array([0.91, 0.44], np.float32)
    labels = np.array([1, 7], np.int64)
    return pts, gt, pred, scores, labels


def test_draw_scenes_builds_3d_figure():
    pts, gt, pred, scores, labels = _scene()
    fig = draw_scenes(pts, gt_boxes=gt, ref_boxes=pred, ref_scores=scores,
                      ref_labels=labels)
    ax = fig.gca()
    assert ax.name == "3d"
    # 1 scatter + >= 3 line collections (grid, gt, >=1 label class)
    assert len(ax.collections) >= 4
    import matplotlib.pyplot as plt

    plt.close(fig)


def test_save_scene_writes_png(tmp_path):
    pts, gt, pred, scores, labels = _scene()
    out = save_scene(tmp_path / "scene.png", pts, gt_boxes=gt,
                     ref_boxes=pred, ref_scores=scores, ref_labels=labels)
    data = Path(out).read_bytes()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert len(data) > 20000  # non-trivial render, not a blank canvas


def test_draw_scenes_handles_empty_predictions(tmp_path):
    pts, gt, _, _, _ = _scene()
    out = save_scene(tmp_path / "empty.png", pts, gt_boxes=gt,
                     ref_boxes=np.zeros((0, 7), np.float32),
                     ref_scores=np.zeros((0,), np.float32),
                     ref_labels=np.zeros((0,), np.int64))
    assert Path(out).exists()
