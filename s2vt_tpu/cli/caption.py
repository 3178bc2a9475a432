"""End-to-end single-clip captioning: video/frames -> backbone features ->
caption. A capability extension (the reference requires a two-script
detour through .npy files); this runs the whole serving path in one
process: ffmpeg/frame decode -> jitted CNN -> jitted greedy/beam decode.
"""

from __future__ import annotations

import argparse
import json


def caption_clips(model_path: str, inputs, captions_file: str = None,
                  backbone: str = "vgg16", weights: str = None,
                  beam: bool = False, compute_dtype: str = None) -> dict:
    import numpy as np

    from s2vt_tpu.config import Opt
    from s2vt_tpu.data.corpus import load_captions, special_token_indices
    from s2vt_tpu.evaluation.decode import (ids_to_sentence,
                                            model_from_checkpoint)
    from s2vt_tpu.extract.pipeline import FeatureExtractor
    from s2vt_tpu.training.checkpoint import load_config

    cfg = load_config(model_path)
    base_opt = Opt(**cfg) if cfg else Opt()
    data = load_captions(captions_file or base_opt.caption_file)
    word2ix = data["word2ix"]
    ix2word = {int(k): v for k, v in data["ix2word"].items()}
    sp = special_token_indices(word2ix)

    opt, model, params = model_from_checkpoint(model_path, len(word2ix))

    extractor = FeatureExtractor(backbone, weights, compute_dtype)
    feats = np.stack([
        extractor.extract_clip(str(p), mode="fix",
                               frames_num=opt.train_length)
        for p in inputs])

    if beam:
        res = model.apply({"params": params}, feats, mode="beam_search",
                          beam_width=opt.beam_width,
                          max_beam_depth=opt.max_beam_depth,
                          beam_score_mode=opt.beam_score_mode)
        rows = np.asarray(res.tokens)[:, 0, 1:]
    else:
        rows = np.asarray(model.apply({"params": params}, feats, mode="test"))

    out = {}
    for p, ids in zip(inputs, rows):
        out[str(p)] = ids_to_sentence(ids, ix2word, sp["eos_ix"],
                                      sos_ix=sp["sos_ix"], pad_ix=sp["pad_ix"])
    return out


def main():
    from s2vt_tpu.utils.compilation import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="+",
                    help="video files or frame directories")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--caption_file", default=None,
                    help="captions.json for the vocab (default: the one "
                         "recorded in the checkpoint config)")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "vgg16_bn", "resnet152", "inception_v4",
                             "tiny"])
    ap.add_argument("--weights", default=None,
                    help="pretrained backbone .pth (imagenet)")
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--compute_dtype", default=None, choices=[None, "bfloat16"])
    args = ap.parse_args()

    captions = caption_clips(args.model_path, args.inputs, args.caption_file,
                             args.backbone, args.weights, args.beam,
                             args.compute_dtype)
    print(json.dumps(captions, indent=1))


if __name__ == "__main__":
    main()
