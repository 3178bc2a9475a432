"""End-to-end single-clip captioning: video/frames -> backbone features ->
caption. A capability extension (the reference requires a two-script
detour through .npy files); this runs the whole serving path in one
process: ffmpeg/frame decode -> jitted CNN -> jitted greedy/beam decode.
"""

from __future__ import annotations

import argparse
import json


class ClipCaptioner:
    """Compile-once serving object: checkpoint + vocab + backbone built a
    single time, then ``caption(paths)`` per request. Decode jits are
    cached per batch shape, so a long-lived server pays compilation only
    on the first request of each batch size."""

    def __init__(self, model_path: str = None, captions_file: str = None,
                 backbone: str = "vgg16", weights: str = None,
                 beam: bool = False, compute_dtype: str = None,
                 early_stop: bool = False, artifact: str = None):
        from s2vt_tpu.extract.pipeline import FeatureExtractor

        self.artifact = None
        if artifact is not None:
            # AOT serving path: decode from an exported StableHLO artifact
            # (cli/export_serving.py) — no checkpoint, no model code.
            from s2vt_tpu.serving import ServingCaptioner
            self.artifact = ServingCaptioner(artifact)
            self.frames_num = self.artifact.manifest["length"]
        else:
            from s2vt_tpu.config import Opt
            from s2vt_tpu.data.corpus import (load_captions,
                                              special_token_indices)
            from s2vt_tpu.evaluation.decode import model_from_checkpoint
            from s2vt_tpu.training.checkpoint import load_config

            cfg = load_config(model_path)
            base_opt = Opt(**cfg) if cfg else Opt()
            data = load_captions(captions_file or base_opt.caption_file)
            self.ix2word = {int(k): v for k, v in data["ix2word"].items()}
            self.specials = special_token_indices(data["word2ix"])
            self.opt, self.model, self.params = model_from_checkpoint(
                model_path, len(data["word2ix"]))
            self.frames_num = self.opt.train_length
        self.extractor = FeatureExtractor(backbone, weights, compute_dtype)
        self.beam = beam
        self.early_stop = early_stop

    def caption(self, inputs) -> dict:
        import numpy as np

        from s2vt_tpu.evaluation.decode import ids_to_sentence

        feats = np.stack([
            self.extractor.extract_clip(str(p), mode="fix",
                                        frames_num=self.frames_num)
            for p in inputs])
        if self.artifact is not None:
            sents = self.artifact.caption(feats)
            return {str(p): s for p, s in zip(inputs, sents)}
        if self.beam:
            res = self.model.apply(
                {"params": self.params}, feats, mode="beam_search",
                beam_width=self.opt.beam_width,
                max_beam_depth=self.opt.max_beam_depth,
                beam_score_mode=self.opt.beam_score_mode)
            rows = np.asarray(res.tokens)[:, 0, 1:]
        else:
            rows = np.asarray(self.model.apply(
                {"params": self.params}, feats, mode="test",
                early_stop=self.early_stop))
        sp = self.specials
        return {str(p): ids_to_sentence(ids, self.ix2word, sp["eos_ix"],
                                        sos_ix=sp["sos_ix"],
                                        pad_ix=sp["pad_ix"])
                for p, ids in zip(inputs, rows)}


def caption_clips(model_path: str, inputs, captions_file: str = None,
                  backbone: str = "vgg16", weights: str = None,
                  beam: bool = False, compute_dtype: str = None) -> dict:
    return ClipCaptioner(model_path, captions_file, backbone, weights,
                         beam, compute_dtype).caption(inputs)


def serve(captioner: ClipCaptioner, infile=None, outfile=None) -> int:
    """Line-oriented serving loop: one clip path (or a whitespace-separated
    batch of paths) per stdin line -> one JSON object per stdout line.
    Blank line or EOF ends the session. Returns requests served."""
    import sys

    infile = infile if infile is not None else sys.stdin
    outfile = outfile if outfile is not None else sys.stdout
    served = 0
    for line in infile:
        paths = line.split()
        if not paths:
            break
        try:
            result = captioner.caption(paths)
        except Exception as e:  # a bad clip must not kill the server
            result = {"error": f"{type(e).__name__}: {e}", "paths": paths}
        print(json.dumps(result), file=outfile, flush=True)
        served += 1
    return served


def main():
    from s2vt_tpu.utils.compilation import enable_compilation_cache
    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("inputs", nargs="*",
                    help="video files or frame directories (omit with "
                         "--serve)")
    ap.add_argument("--serve", action="store_true",
                    help="long-lived serving loop: clip path(s) per stdin "
                         "line -> JSON per stdout line; model/backbone are "
                         "built once and reused across requests")
    ap.add_argument("--model_path", default=None,
                    help="checkpoint directory (required unless --artifact)")
    ap.add_argument("--artifact", default=None,
                    help="AOT serving artifact directory (from "
                         "cli/export_serving.py); replaces --model_path")
    ap.add_argument("--caption_file", default=None,
                    help="captions.json for the vocab (default: the one "
                         "recorded in the checkpoint config)")
    ap.add_argument("--backbone", default="vgg16",
                    choices=["vgg16", "vgg16_bn", "resnet152", "inception_v4",
                             "tiny"])
    ap.add_argument("--weights", default=None,
                    help="pretrained backbone .pth (imagenet)")
    ap.add_argument("--beam", action="store_true")
    ap.add_argument("--early_stop", action="store_true",
                    help="greedy decode exits once every clip has emitted "
                         "<eos> (serving speedup; sentences unchanged)")
    ap.add_argument("--compute_dtype", default=None, choices=[None, "bfloat16"])
    args = ap.parse_args()
    if args.model_path is None and args.artifact is None:
        ap.error("one of --model_path / --artifact is required")
    if args.artifact is not None:
        # The artifact's baked-in decode governs: flags that try to change
        # it are errors, not silent no-ops. (--compute_dtype stays legal —
        # it configures the backbone extractor, which runs outside the
        # artifact; the decode input is cast to the manifest's dtype.)
        import pathlib
        if args.model_path is not None:
            ap.error("--artifact replaces --model_path; pass one, not both")
        if args.caption_file is not None:
            ap.error("--caption_file cannot apply with --artifact: the "
                     "vocabulary is baked into the artifact manifest")
        if args.early_stop:
            ap.error("--early_stop cannot apply with --artifact: the decode "
                     "loop is baked into the exported computation")
        try:
            manifest = json.loads(
                (pathlib.Path(args.artifact) / "manifest.json").read_text())
        except (OSError, ValueError) as e:   # missing, unreadable, corrupt
            ap.error(f"cannot read artifact manifest: {e}")
        if args.beam and manifest.get("mode") != "beam":
            ap.error(f"--beam cannot apply: artifact was exported with "
                     f"mode={manifest.get('mode')!r} (re-export with "
                     f"--mode beam, cli/export_serving.py)")
        if not args.beam and manifest.get("mode") == "beam":
            # mirror of the check above: the artifact replays beam decode
            # regardless of flags — say so instead of surprising a user
            # who expected the greedy default.
            import sys
            print("note: artifact was exported with mode='beam'; replaying "
                  "beam decode (pass --beam to silence this)",
                  file=sys.stderr)

    if args.serve:
        captioner = ClipCaptioner(args.model_path, args.caption_file,
                                  args.backbone, args.weights, args.beam,
                                  args.compute_dtype, args.early_stop,
                                  artifact=args.artifact)
        n = serve(captioner)
        print(f"served {n} request(s)", flush=True)
        return
    if not args.inputs:
        ap.error("provide clip paths, or use --serve")
    captioner = ClipCaptioner(args.model_path, args.caption_file,
                              args.backbone, args.weights, args.beam,
                              args.compute_dtype, args.early_stop,
                              artifact=args.artifact)
    print(json.dumps(captioner.caption(args.inputs), indent=1))


if __name__ == "__main__":
    main()
