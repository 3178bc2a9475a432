"""End-to-end evaluation tests: train -> checkpoint -> decode -> score.

Mirrors the reference flow eval.py:222-235 on the synthetic corpus.
"""

import json

import numpy as np
import pytest

from s2vt_tpu.config import Opt
from s2vt_tpu.data import make_synthetic_corpus
from s2vt_tpu.evaluation import (beam_eval, greedy_eval, ids_to_sentence,
                                 pred_to_coco_samples_IDs, score_predictions)
from s2vt_tpu.training import Trainer


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("eval_corpus")
    corpus = make_synthetic_corpus(str(root), n_videos=8, feat_len=10,
                                   feat_dim=12, seed=7)
    opt = Opt(caption_file=corpus["captions_file"],
              feats_path=corpus["feat_path"], gts_file=corpus["gts_file"],
              train_length=10, dim_hidden=16, dim_embed=16,
              feat_dim=corpus["feat_dim"], batch_size=8,
              save_path=str(root / "ckpt"), log_dir=str(root / "runs"),
              lr=1e-2, EPOCHS=3, model="s2vt", seed=0)
    tr = Trainer(opt, writer=None)
    tr.fit(epochs=3)
    path = tr.save("eval_test")
    return corpus, path


def test_ids_to_sentence():
    ix2word = {0: "<pad>", 3: "<sos>", 4: "<eos>", 5: "dog", 6: "runs"}
    assert ids_to_sentence([5, 6, 4, 5], ix2word, eos_ix=4) == "dog runs"
    assert ids_to_sentence([3, 5, 6, 4], ix2word, eos_ix=4, sos_ix=3) == "dog runs"
    assert ids_to_sentence([5, 0, 6], ix2word, eos_ix=4) == "dog runs"
    assert ids_to_sentence([9], ix2word, eos_ix=4) == "<unk>"


def test_pred_to_coco_intersects_with_gts():
    preds = {"a": "x y", "b": "z", "missing": "q"}
    gts = {"a": [], "b": []}
    samples, ids = pred_to_coco_samples_IDs(preds, gts)
    assert set(ids) == {"a", "b"}
    assert samples["a"] == [{"image_id": "a", "caption": "x y"}]


def test_greedy_eval_from_checkpoint(trained):
    corpus, path = trained
    preds = greedy_eval(path, corpus["captions_file"], corpus["feat_path"],
                        batch_size=4)
    with open(corpus["captions_file"]) as f:
        splits = json.load(f)["splits"]
    assert set(preds.keys()) == set(splits["test"])
    assert all(isinstance(s, str) for s in preds.values())


def test_beam_eval_from_checkpoint(trained):
    corpus, path = trained
    preds = beam_eval(path, corpus["captions_file"], corpus["feat_path"],
                      batch_size=4, beam_width=2, max_beam_depth=8)
    assert all(isinstance(s, str) for s in preds.values())
    for s in preds.values():
        assert "<sos>" not in s and "<eos>" not in s


def test_score_predictions_end_to_end(trained):
    corpus, path = trained
    preds = greedy_eval(path, corpus["captions_file"], corpus["feat_path"],
                        batch_size=4)
    with open(corpus["gts_file"]) as f:
        gts = json.load(f)["gts"]
    scores = score_predictions(preds, gts, verbose=False)
    want_keys = {"Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR",
                 "ROUGE_L", "CIDEr"}
    assert set(scores.keys()) == want_keys
    assert all(np.isfinite(v) and 0.0 <= v for v in scores.values())


def test_scoring_perfect_predictions(trained):
    """Feeding each test video's own first gts caption back as the
    prediction must score BLEU-1 = 1."""
    corpus, _ = trained
    with open(corpus["gts_file"]) as f:
        gts = json.load(f)["gts"]
    with open(corpus["captions_file"]) as f:
        splits = json.load(f)["splits"]
    preds = {vid: gts[vid][0]["caption"] for vid in splits["test"]}
    scores = score_predictions(preds, gts, verbose=False)
    assert scores["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert scores["ROUGE_L"] == pytest.approx(1.0, abs=1e-6)


def test_mesh_decoding_matches_single_device(trained):
    """CaptionDecoder over an 8-device dp mesh produces identical captions
    to single-device decoding (the multi-chip serving path)."""
    from s2vt_tpu.data.dataset import VideoDataset
    from s2vt_tpu.evaluation.decode import CaptionDecoder, model_from_checkpoint
    from s2vt_tpu.parallel import make_mesh

    corpus, path = trained
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=10, mode="test", seed=0)
    opt, model, params = model_from_checkpoint(path, ds.vocab_size)

    single = CaptionDecoder(model, params, ds).greedy(batch_size=8)
    mesh = make_mesh()  # all 8 CPU devices on the data axis
    sharded = CaptionDecoder(model, params, ds, mesh=mesh).greedy(batch_size=8)
    assert sharded == single and len(single) > 0


def test_feature_bank_decoding_matches_streaming(trained):
    """CaptionDecoder(feature_bank=...) — on-device row gather instead of
    per-batch feature H2D — produces identical captions (greedy + beam)."""
    import jax
    from s2vt_tpu.data.dataset import VideoDataset
    from s2vt_tpu.evaluation.decode import CaptionDecoder, model_from_checkpoint

    corpus, path = trained
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=10, mode="test", seed=0)
    opt, model, params = model_from_checkpoint(path, ds.vocab_size)
    bank = jax.device_put(ds.load_all_features())

    plain = CaptionDecoder(model, params, ds)
    banked = CaptionDecoder(model, params, ds, feature_bank=bank)
    assert banked.greedy(batch_size=4) == plain.greedy(batch_size=4)
    assert banked.beam(batch_size=4) == plain.beam(batch_size=4)
