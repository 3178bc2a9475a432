"""Feature-extraction CLI — the analog of ``python extract_features.py``
(/root/reference/extract_features.py:145-176), same flags plus pretrained
weight import and TPU-native knobs. Unlike the reference (single-GPU,
model reloaded per video), the backbone is compiled once and streamed.
"""

from __future__ import annotations

import argparse


def main():
    from s2vt_tpu.utils.compilation import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--video_path", required=True,
                    help="directory of MSVD/MSR-VTT videos (or frame dirs)")
    ap.add_argument("--mode", required=True, choices=["fix", "free"],
                    help="'fix': frames_num evenly spaced frames; "
                         "'free': every interval-th frame")
    ap.add_argument("--feat_path", default="./data/feats")
    ap.add_argument("--model", default="vgg16",
                    choices=["vgg16", "vgg16_bn", "resnet152", "inception_v4",
                             "tiny"])
    ap.add_argument("--interval", type=int, default=10)
    ap.add_argument("--frames_num", type=int, default=80)
    ap.add_argument("--weights", default=None,
                    help="path to a pretrained torch .pth state_dict "
                         "(pretrainedmodels zoo format)")
    ap.add_argument("--compute_dtype", default=None,
                    choices=[None, "bfloat16"],
                    help="bfloat16 matmul/conv inputs on TPU")
    ap.add_argument("--clip_batch", type=int, default=4,
                    help="fix-mode clips per device forward (1 disables)")
    args = ap.parse_args()

    from s2vt_tpu.extract import extract

    n = extract(args.video_path, args.feat_path, model=args.model,
                mode=args.mode, frames_num=args.frames_num,
                interval=args.interval, weights=args.weights,
                compute_dtype=args.compute_dtype,
                clip_batch=args.clip_batch)
    print(f"extracted features for {n} clips -> {args.feat_path}")


if __name__ == "__main__":
    main()
