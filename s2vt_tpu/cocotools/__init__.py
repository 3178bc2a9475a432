"""pycocotools-compatible dataset API + detection evaluator.

The reference vendors pycocotools (coco.py, cocoeval.py, mask.py + a
Cython ``_mask`` extension) inside coco_caption; nothing on the caption
path imports it (SURVEY.md §2 #23), but it is part of the reference's
surface. This package rebuilds it host-side over the C++ RLE ops in
``s2vt_tpu.utils.mask`` (native/s2vt_mask.cpp).
"""

from s2vt_tpu.cocotools.coco import COCO
from s2vt_tpu.cocotools.cocoeval import COCOeval, Params

__all__ = ["COCO", "COCOeval", "Params"]
