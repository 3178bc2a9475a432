"""MSR-VTT corpus parser (prepare_captions.py:118-197 parity) and
CiderD / COCOEvalCap harness tests."""

import json

import numpy as np
import pytest

from s2vt_tpu.data.corpus import parse_msr_vtt
from s2vt_tpu.evaluation import COCOEvalCap
from s2vt_tpu.metrics import Cider, CiderD


@pytest.fixture()
def msrvtt_files(tmp_path):
    train_val = {
        "videos": [
            {"video_id": "video0", "split": "train"},
            {"video_id": "video1", "split": "train"},
            {"video_id": "video2", "split": "validate"},
        ],
        "sentences": [
            {"video_id": "video0", "caption": "A man plays guitar."},
            {"video_id": "video0", "caption": "a man is playing a guitar"},
            {"video_id": "video1", "caption": "a cat sleeps"},
            {"video_id": "video2", "caption": "people are dancing"},
        ],
    }
    test = {"videos": [{"video_id": "video3", "split": "test"}]}
    tv = tmp_path / "train_val.json"
    te = tmp_path / "test.json"
    tv.write_text(json.dumps(train_val))
    te.write_text(json.dumps(test))
    return str(tv), str(te), tmp_path


def test_parse_msr_vtt(msrvtt_files):
    tv, te, tmp = msrvtt_files
    out = parse_msr_vtt(tv, te, str(tmp / "captions.json"),
                        str(tmp / "gts.json"))
    assert out["splits"] == {"train": ["video0", "video1"],
                             "valid": ["video2"], "test": ["video3"]}
    # vocab contract: <pad>=0, <unk>=1, frequency order
    assert out["word2ix"]["<pad>"] == 0 and out["word2ix"]["<unk>"] == 1
    # captions tokenized with <sos>/<eos> wrapping and punctuation strip
    cap0 = out["captions"]["video0"][0]
    words = [k for k, v in sorted(out["word2ix"].items(), key=lambda kv: kv[1])]
    decoded = [words[i] for i in cap0]
    assert decoded[0] == "<sos>" and decoded[-1] == "<eos>"
    assert "guitar" in decoded and "." not in " ".join(decoded)
    # gts format for the scorer
    gts = json.load(open(tmp / "gts.json"))["gts"]
    assert gts["video0"][0]["image_id"] == "video0"
    assert gts["video0"][1]["cap_id"] == 1


GTS = {"a": ["a man is playing a guitar", "a man plays the guitar"],
       "b": ["a cat is sleeping on the couch"]}
RES = {"a": ["a man is playing a guitar"], "b": ["a dog runs"]}


def test_ciderd_corpus_mode_matches_cider():
    c_score, c_per = Cider().compute_score(GTS, RES)
    d_score, d_per = CiderD().compute_score(GTS, RES)
    assert c_score == d_score
    np.testing.assert_array_equal(c_per, d_per)


def test_ciderd_precomputed_df():
    df = {("a",): 5.0, ("man",): 3.0, ("guitar",): 1.0}
    with pytest.raises(ValueError, match="ref_len"):
        CiderD(df_mode=df).compute_score(GTS, RES)
    d = CiderD(df_mode=df, ref_len=float(np.log(10.0)))
    score, per = d.compute_score(GTS, RES)
    assert np.isfinite(score) and per.shape == (2,)
    assert per[0] > per[1]


def test_coco_eval_cap_harness():
    gts = {k: [{"caption": c} for c in v] for k, v in GTS.items()}
    res = {k: [{"caption": v[0]}] for k, v in RES.items()}
    ev = COCOEvalCap(gts, res)
    scores = ev.evaluate()
    assert {"Bleu_1", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr"} <= set(scores)
    assert ev.imgToEval["a"]["Bleu_1"] == pytest.approx(1.0, abs=1e-6)
    assert len(ev.evalImgs) == 2


def test_msr_vtt_to_coco_gts(tmp_path):
    """The reference's abandoned mst_vrr_to_coco_gts (eval.py:101-133),
    fixed: sentences grouped by their own video_id."""
    import json

    from s2vt_tpu.evaluation.scorer import msr_vtt_to_coco_gts

    data = {"videos": [{"video_id": "video0"}, {"video_id": "video1"}],
            "sentences": [
                {"video_id": "video0", "caption": "A man runs."},
                {"video_id": "video1", "caption": "Hello, there!"},
                {"video_id": "video0", "caption": "Someone is running?"}]}
    p = tmp_path / "info.json"
    p.write_text(json.dumps(data))
    gts = msr_vtt_to_coco_gts(str(p))
    assert sorted(gts) == ["video0", "video1"]
    assert [c["cap_id"] for c in gts["video0"]] == [0, 1]
    assert gts["video0"][0]["tokenized"] == "a man runs "
    # ',' and '!' replaced by spaces (reference regex [.!,;?:], eval.py:114)
    assert gts["video1"][0]["tokenized"] == "hello  there "
    assert gts["video0"][1]["caption"] == "Someone is running?"
