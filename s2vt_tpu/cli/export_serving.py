"""Export a trained checkpoint as an AOT serving artifact (StableHLO).

``python -m s2vt_tpu.cli.export_serving --model_path checkpoint/... \\
    --out artifacts/msvd_greedy --batch 16 [--beam]``

The artifact (decode.hlo + params.npz + manifest.json) is replayed by
``s2vt_tpu.serving.ServingCaptioner`` — or by the caption CLI's
``--artifact`` flag — without the model definition. See
serving/export.py for the format.
"""

from __future__ import annotations

import argparse


def main():
    from s2vt_tpu.utils.compilation import enable_compilation_cache
    enable_compilation_cache()

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model_path", required=True,
                    help="checkpoint directory (orbax + opt.json)")
    ap.add_argument("--out", required=True, help="artifact output directory")
    ap.add_argument("--caption_file", default=None,
                    help="captions.json for the vocab (default: the one "
                         "recorded in the checkpoint config)")
    ap.add_argument("--batch", default="16",
                    help="exported batch size, or 'poly' for a "
                         "shape-polymorphic artifact (any batch; the "
                         "serving runtime lowers each new shape once)")
    ap.add_argument("--beam", action="store_true",
                    help="export beam-search decode instead of greedy")
    ap.add_argument("--beam_width", type=int, default=None)
    ap.add_argument("--max_beam_depth", type=int, default=None)
    ap.add_argument("--feats_dtype", default="float32",
                    choices=("float32", "bfloat16", "float16", "int8"),
                    help="the artifact's feature-input dtype. bfloat16 "
                         "halves the per-request upload — the measured "
                         "serving bottleneck (bench.py: H2D is ~97%% of "
                         "the request at B=16 over a network link); "
                         "ServingCaptioner.caption() casts f32 callers' "
                         "input via the manifest, so clients are "
                         "unaffected. int8 quarters it via per-clip "
                         "absmax quantization with on-device dequant — "
                         "LOSSY (max error absmax/254 per element; "
                         "bench.py records the token-match fraction), "
                         "opt in only when the link is the bottleneck")
    args = ap.parse_args()

    from s2vt_tpu.config import Opt
    from s2vt_tpu.data.corpus import load_captions, special_token_indices
    from s2vt_tpu.evaluation.decode import model_from_checkpoint
    from s2vt_tpu.serving import export_captioner
    from s2vt_tpu.training.checkpoint import load_config

    cfg = load_config(args.model_path)
    base_opt = Opt(**cfg) if cfg else Opt()
    data = load_captions(args.caption_file or base_opt.caption_file)
    ix2word = {int(k): v for k, v in data["ix2word"].items()}
    specials = special_token_indices(data["word2ix"])
    opt, model, params = model_from_checkpoint(args.model_path,
                                               len(data["word2ix"]))
    if opt.use_pallas:
        # Pallas kernels are TPU-only and cannot lower into the artifact's
        # multi-platform (cpu+tpu) StableHLO; the XLA scan path computes
        # the identical decode (parity-tested), so artifacts always export
        # it. The checkpoint's training config is unaffected.
        from s2vt_tpu.parallel import mesh as mesh_lib
        from s2vt_tpu.training.loop import build_model
        real_vocab = len(data["word2ix"])
        vocab = mesh_lib.pad_to_multiple(real_vocab, opt.vocab_pad_multiple)
        model = build_model(opt.replace(use_pallas=False), vocab,
                            valid_vocab=real_vocab)
    batch = None if args.batch == "poly" else int(args.batch)
    import jax.numpy as jnp
    out = export_captioner(
        model, params, ix2word, specials, batch, args.out,
        mode="beam" if args.beam else "greedy",
        beam_width=args.beam_width or opt.beam_width,
        max_beam_depth=args.max_beam_depth or opt.max_beam_depth,
        beam_score_mode=opt.beam_score_mode,
        feats_dtype=jnp.dtype(args.feats_dtype))
    print(f"exported {'beam' if args.beam else 'greedy'} captioner "
          f"(batch={'polymorphic' if batch is None else batch}) to {out}")


if __name__ == "__main__":
    main()
