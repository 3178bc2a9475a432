"""s2vt_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video-captioning framework.

A from-scratch rebuild of the capabilities of Kamino666/S2VT-video-caption
(reference mounted at /root/reference) designed TPU-first:

- ``ops``        — torch-semantics-compatible LSTM/GRU cells as ``lax.scan``
                   sequences with batched input projections (MXU-friendly),
                   Pallas-fused variants, masked cross-entropy.
- ``models``     — the S2VT two-layer encode-then-decode captioner, the
                   bi-LSTM + additive-attention baseline, batched on-device
                   beam search, and Flax CNN backbones for feature extraction.
- ``data``       — MSVD / MSR-VTT corpus parsing, vocab building, and a
                   fixed-shape host-side batch pipeline.
- ``training``   — Adam + reduce-on-plateau + early stopping, orbax
                   checkpoints, tensorboard logging, pjit data parallelism.
- ``evaluation`` — greedy/beam decoding harnesses + the COCO scorer.
- ``metrics``    — host-side BLEU / ROUGE-L / CIDEr / METEOR and a PTB
                   tokenizer compatible with the coco-caption toolkit.
- ``parallel``   — device mesh + sharding helpers (dp × tp).
- ``extract``    — video frame sampling + jitted backbone feature extraction.
- ``serving``    — AOT export: the jitted decode as versioned StableHLO
                   artifacts replayed without model code.
- ``cocotools``  — COCO dataset API + detection evaluator over the C++ RLE
                   mask ops.
"""

__version__ = "0.1.0"
