"""End-to-end quality loop: a learnable synthetic corpus (features encode
the caption) is memorized by S2VT and decoded back at BLEU-1 ~ 1.0.

This is the CPU-runnable stand-in for the MSVD METEOR gate (BASELINE.md):
the real-data run needs the MSVD features, which are not shipped; this
test proves the train -> checkpoint -> greedy decode -> COCO scoring loop
is lossless end-to-end.
"""

import json
import pathlib
from collections import Counter

import numpy as np
import pytest

from s2vt_tpu.config import Opt
from s2vt_tpu.data.corpus import build_vocab, tokenize_caption
from s2vt_tpu.evaluation import greedy_eval, score_predictions
from s2vt_tpu.training import Trainer


def _learnable_corpus(root: pathlib.Path, n_videos=12, L=10, feat_dim=24):
    vocab_words = [f"w{i}" for i in range(12)]
    sentences, counter, gts = {}, Counter(), {}
    feat_dir = root / "feats"
    feat_dir.mkdir(parents=True)
    for v in range(n_videos):
        vid = f"vid{v:03d}"
        words = [vocab_words[(v * 3 + j) % len(vocab_words)]
                 for j in range(3 + v % 3)]
        sent = " ".join(words)
        toks = tokenize_caption(sent)
        counter.update(toks)
        sentences[vid] = toks
        gts[vid] = [{"image_id": vid, "cap_id": 0, "caption": sent,
                     "tokenized": sent}]
    word2ix, ix2word = build_vocab(counter)
    captions = {vid: [[word2ix[w] for w in toks]]
                for vid, toks in sentences.items()}
    for vid, caps in captions.items():
        feats = np.zeros((L, feat_dim), np.float32)
        for j, ix in enumerate(caps[0][:L]):
            feats[j, ix % feat_dim] = 1.0
            feats[j, feat_dim // 2 + (ix // feat_dim) % (feat_dim // 2)] = 1.0
        np.save(feat_dir / f"{vid}.npy", feats)
    names = sorted(captions)
    json.dump({"word2ix": word2ix, "ix2word": ix2word, "captions": captions,
               "splits": {"train": names, "valid": names[:4], "test": names}},
              open(root / "captions.json", "w"))
    json.dump({"gts": gts}, open(root / "gts.json", "w"))
    return feat_dir


@pytest.mark.slow
def test_overfit_then_score(tmp_path):
    feat_dir = _learnable_corpus(tmp_path)
    opt = Opt(caption_file=str(tmp_path / "captions.json"),
              feats_path=str(feat_dir), gts_file=str(tmp_path / "gts.json"),
              train_length=10, dim_hidden=48, dim_embed=48, feat_dim=24,
              batch_size=8, lr=0.02, EPOCHS=150,
              save_path=str(tmp_path / "ckpt"),
              log_dir=str(tmp_path / "runs"), model="s2vt", seed=0,
              early_stopping_patience=1000, learning_rate_patience=10000)
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=250)
    assert hist["train_loss"][-1] < 0.1, "model failed to memorize"
    path = tr.save("overfit")

    preds = greedy_eval(path, opt.caption_file, opt.feats_path,
                        batch_size=8, mode="test")
    gts = json.load(open(opt.gts_file))["gts"]
    scores = score_predictions(preds, gts, verbose=False)
    assert scores["Bleu_1"] > 0.95, scores
    assert scores["ROUGE_L"] > 0.95, scores
    assert scores["CIDEr"] > 5.0, scores
    # METEOR is the north-star metric (BASELINE.md): a memorized corpus
    # must sit at the identical-sentence ceiling 1 - gamma*(1/m)^beta,
    # which for this corpus's 3-5 word captions is ~0.54 (m=4 ->
    # 1 - 0.6*(1/4)^0.2 = 0.545); observed 0.5453.
    assert scores["METEOR"] > 0.52, scores

    # Beam decode (the reference's second eval mode) recovers the same
    # memorized sentences at the same quality.
    from s2vt_tpu.evaluation import beam_eval
    preds_beam = beam_eval(path, opt.caption_file, opt.feats_path,
                           batch_size=8, mode="test")
    scores_beam = score_predictions(preds_beam, gts, verbose=False)
    assert scores_beam["Bleu_1"] > 0.95, scores_beam


@pytest.mark.slow
def test_overfit_att_baseline(tmp_path):
    """Same memorization check for the attention baseline (the model the
    reference's shipped train.py actually instantiates)."""
    feat_dir = _learnable_corpus(tmp_path)
    opt = Opt(caption_file=str(tmp_path / "captions.json"),
              feats_path=str(feat_dir), gts_file=str(tmp_path / "gts.json"),
              train_length=10, dim_hidden=48, dim_embed=48, feat_dim=24,
              batch_size=8, lr=0.02, EPOCHS=250,
              save_path=str(tmp_path / "ckpt"),
              log_dir=str(tmp_path / "runs"), model="att_baseline", seed=0,
              early_stopping_patience=1000, learning_rate_patience=10000)
    tr = Trainer(opt, writer=None)
    hist = tr.fit(epochs=250)
    assert hist["train_loss"][-1] < 0.2, hist["train_loss"][-5:]
    path = tr.save("overfit_att")

    preds = greedy_eval(path, opt.caption_file, opt.feats_path,
                        batch_size=8, mode="test")
    gts = json.load(open(opt.gts_file))["gts"]
    scores = score_predictions(preds, gts, verbose=False)
    assert scores["Bleu_1"] > 0.8, scores
