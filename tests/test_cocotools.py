"""COCO dataset API + detection evaluator on synthetic annotations, with
hand-computed AP/AR oracles (VERDICT r1 item 6: the reference's pycocotools
surface, coco.py:70-433 / cocoeval.py:10-534)."""

import json

import numpy as np
import pytest

from s2vt_tpu.cocotools import COCO, COCOeval
from s2vt_tpu.utils import mask as maskUtils

pytest.importorskip("ctypes")


def make_dataset():
    """3 images, 2 categories, mixed polygon/crowd annotations."""
    imgs = [{"id": i, "height": 20, "width": 20, "file_name": f"{i}.jpg"}
            for i in (1, 2, 3)]
    cats = [{"id": 1, "name": "cat", "supercategory": "animal"},
            {"id": 2, "name": "dog", "supercategory": "animal"}]
    # axis-aligned square polygons for exact areas
    def poly(x, y, w, h):
        return [[x, y, x, y + h, x + w, y + h, x + w, y]]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
         "area": 100.0, "bbox": [0, 0, 10, 10],
         "segmentation": poly(0, 0, 10, 10)},
        {"id": 2, "image_id": 1, "category_id": 2, "iscrowd": 0,
         "area": 25.0, "bbox": [12, 12, 5, 5],
         "segmentation": poly(12, 12, 5, 5)},
        {"id": 3, "image_id": 2, "category_id": 1, "iscrowd": 1,
         "area": 64.0, "bbox": [2, 2, 8, 8],
         "segmentation": poly(2, 2, 8, 8)},
        {"id": 4, "image_id": 3, "category_id": 2, "iscrowd": 0,
         "area": 16.0, "bbox": [5, 5, 4, 4],
         "segmentation": poly(5, 5, 4, 4)},
    ]
    return {"images": imgs, "categories": cats, "annotations": anns,
            "info": {"description": "synthetic"}}


@pytest.fixture()
def coco(tmp_path):
    path = tmp_path / "ann.json"
    path.write_text(json.dumps(make_dataset()))
    return COCO(str(path))


def test_index_and_queries(coco):
    assert sorted(coco.getImgIds()) == [1, 2, 3]
    assert coco.getCatIds(catNms=["cat"]) == [1]
    assert coco.getCatIds(supNms=["animal"]) == [1, 2]
    assert sorted(coco.getAnnIds(imgIds=1)) == [1, 2]
    assert coco.getAnnIds(catIds=2) == [2, 4]
    assert coco.getAnnIds(areaRng=[20, 200]) == [1, 2, 3]
    assert coco.getAnnIds(iscrowd=True) == [3]
    assert sorted(coco.getImgIds(catIds=[1])) == [1, 2]
    assert coco.loadAnns(1)[0]["area"] == 100.0
    assert coco.loadCats(2)[0]["name"] == "dog"
    assert coco.loadImgs([3])[0]["file_name"] == "3.jpg"


def test_ann_to_mask_polygon(coco):
    m = coco.annToMask(coco.loadAnns(1)[0])
    assert m.shape == (20, 20)
    assert m.sum() == 100
    assert m[:10, :10].all() and not m[10:, 10:].any()


def test_load_res_bbox(coco):
    res = coco.loadRes([{"image_id": 1, "category_id": 1,
                         "bbox": [0, 0, 10, 10], "score": 0.9}])
    ann = res.loadAnns(1)[0]
    assert ann["area"] == 100
    assert ann["iscrowd"] == 0
    assert "segmentation" in ann


def test_load_res_numpy(coco):
    data = np.array([[1, 0, 0, 10, 10, 0.8, 1]])
    res = coco.loadRes(data)
    ann = res.loadAnns(1)[0]
    assert ann["category_id"] == 1 and ann["score"] == 0.8


def test_load_res_rejects_foreign_images(coco):
    with pytest.raises(ValueError, match="correspond"):
        coco.loadRes([{"image_id": 99, "category_id": 1,
                       "bbox": [0, 0, 1, 1], "score": 0.5}])


# ---------------------------------------------------------------------------
# COCOeval oracles
# ---------------------------------------------------------------------------


def _eval(coco, dets, iou_type):
    dt = coco.loadRes(dets)
    E = COCOeval(coco, dt, iouType=iou_type)
    E.evaluate()
    E.accumulate()
    E.summarize()
    return E


def test_perfect_detections_ap1(coco, capsys):
    dets = [{"image_id": a["image_id"], "category_id": a["category_id"],
             "bbox": list(a["bbox"]), "score": 0.9}
            for a in coco.loadAnns(coco.getAnnIds(iscrowd=False))]
    E = _eval(coco, dets, "bbox")
    assert E.stats[0] == pytest.approx(1.0)   # AP
    assert E.stats[8] == pytest.approx(1.0)   # AR@100
    assert "Average Precision" in capsys.readouterr().out


def test_partial_iou_ap_oracle(tmp_path):
    """One gt [0,0,10,10]; one dt [0,0,10,6] -> IoU = 0.6 exactly: TP at
    thresholds {.5,.55,.6} of the 10 -> AP = 0.3 (hand-computed against
    the reference accumulate semantics)."""
    ds = make_dataset()
    ds["annotations"] = [ds["annotations"][0]]  # single gt, cat 1, img 1
    path = tmp_path / "one.json"
    path.write_text(json.dumps(ds))
    coco = COCO(str(path))
    E = _eval(coco, [{"image_id": 1, "category_id": 1,
                      "bbox": [0, 0, 10, 6], "score": 0.9}], "bbox")
    assert E.stats[0] == pytest.approx(0.3)
    assert E.stats[1] == pytest.approx(1.0)   # AP@.5
    assert E.stats[2] == pytest.approx(0.0)   # AP@.75


def test_crowd_gt_is_ignored(tmp_path):
    """Only a crowd gt: matched dt is ignored, no countable gts ->
    precision/recall stay -1."""
    ds = make_dataset()
    ds["annotations"] = [ds["annotations"][2]]  # the iscrowd ann (img 2)
    path = tmp_path / "crowd.json"
    path.write_text(json.dumps(ds))
    coco = COCO(str(path))
    E = _eval(coco, [{"image_id": 2, "category_id": 1,
                      "bbox": [2, 2, 8, 8], "score": 0.9}], "bbox")
    assert E.stats[0] == -1.0


def test_score_ordering_and_maxdets(tmp_path):
    """maxDets=1 keeps only the highest-scoring detection: a wrong
    high-score dt makes AR@1 = 0 even with a perfect low-score dt."""
    ds = make_dataset()
    ds["annotations"] = [ds["annotations"][0]]
    path = tmp_path / "md.json"
    path.write_text(json.dumps(ds))
    coco = COCO(str(path))
    E = _eval(coco, [
        {"image_id": 1, "category_id": 1, "bbox": [15, 15, 2, 2],
         "score": 0.95},                                   # wrong, top score
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10],
         "score": 0.5},                                    # perfect
    ], "bbox")
    assert E.stats[6] == pytest.approx(0.0)   # AR@1: only the wrong dt
    assert E.stats[8] == pytest.approx(1.0)   # AR@100: perfect dt counts


def test_segm_evaluation_matches_bbox_for_boxes(coco):
    """Box-shaped polygons: segm IoU equals bbox IoU, so AP agrees."""
    anns = coco.loadAnns(coco.getAnnIds(iscrowd=False))
    dets_b = [{"image_id": a["image_id"], "category_id": a["category_id"],
               "bbox": list(a["bbox"]), "score": 0.9} for a in anns]
    dets_s = []
    for a in anns:
        rle = coco.annToRLE(a)
        dets_s.append({"image_id": a["image_id"],
                       "category_id": a["category_id"],
                       "segmentation": {
                           "size": rle["size"],
                           "counts": maskUtils.toString(rle).decode()},
                       "score": 0.9})
    Eb = _eval(coco, dets_b, "bbox")
    Es = _eval(coco, dets_s, "segm")
    assert Es.stats[0] == pytest.approx(Eb.stats[0]) == pytest.approx(1.0)


def test_keypoints_oks_perfect(tmp_path):
    ds = make_dataset()
    kp = []
    rng = np.random.default_rng(0)
    xs = rng.uniform(2, 18, 17)
    ys = rng.uniform(2, 18, 17)
    for x, y in zip(xs, ys):
        kp += [float(x), float(y), 2]
    ds["annotations"] = [{
        "id": 1, "image_id": 1, "category_id": 1, "iscrowd": 0,
        "area": 100.0, "bbox": [0, 0, 10, 10], "keypoints": kp,
        "num_keypoints": 17}]
    path = tmp_path / "kp.json"
    path.write_text(json.dumps(ds))
    coco = COCO(str(path))
    E = _eval(coco, [{"image_id": 1, "category_id": 1, "keypoints": kp,
                      "score": 0.9}], "keypoints")
    assert E.stats[0] == pytest.approx(1.0)


def test_download_refuses(coco):
    with pytest.raises(RuntimeError, match="zero-egress"):
        coco.download("/tmp/x", [1])
