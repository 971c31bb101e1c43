import json
import os

import numpy as np

from cim_tpu.evaluation import rle as rle_util
from cim_tpu.utils.visualize import draw_detections, visualize_result_file


def test_draw_detections_renders(rng):
    image = (rng.rand(60, 80, 3) * 255).astype(np.uint8)
    mask = np.zeros((60, 80), np.uint8)
    mask[10:30, 20:50] = 1
    dets = [
        {"category_id": 3, "score": 0.9, "bbox": [20, 10, 30, 20],
         "segmentation": rle_util.encode(mask)},
        {"category_id": 5, "score": 0.1, "bbox": [0, 0, 10, 10]},  # below thr
    ]
    from cim_tpu.data.voc_meta import VOC_CLASSES

    out = draw_detections(image, dets, VOC_CLASSES, score_thr=0.3)
    arr = np.asarray(out)
    assert arr.shape == (60, 80, 3)
    # the mask overlay changed pixels inside the mask region
    assert np.abs(arr[15:25, 30:40].astype(int) - image[15:25, 30:40]).sum() > 0


def test_visualize_result_file(tmp_path, rng):
    from PIL import Image

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray((rng.rand(40, 50, 3) * 255).astype(np.uint8)).save(
        img_dir / "2008_000001.jpg"
    )
    results = [
        {"image_id": 2008000001, "category_id": 2, "score": 0.8,
         "bbox": [5, 5, 20, 15]}
    ]
    rf = tmp_path / "res.json"
    rf.write_text(json.dumps(results))
    n = visualize_result_file(
        str(rf), str(img_dir), str(tmp_path / "vis"), num_classes=20,
        score_thr=0.3,
    )
    assert n == 1
    assert (tmp_path / "vis" / "2008_000001.jpg").exists()
