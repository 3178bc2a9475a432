"""Data/corpus layer tests: vocab contract, MSVD/MSR-VTT parsing, batching."""

import json
from collections import Counter

import numpy as np
import pytest

from s2vt_tpu.data import (
    build_vocab,
    parse_csv,
    parse_msr_vtt,
    VideoDataset,
    make_synthetic_corpus,
)
from s2vt_tpu.data.corpus import tokenize_caption, special_token_indices


def test_build_vocab_contract():
    counter = Counter({"a": 10, "<sos>": 5, "<eos>": 5, "dog": 3, "runs": 1})
    w2i, i2w = build_vocab(counter)
    assert w2i["<pad>"] == 0 and w2i["<unk>"] == 1
    assert w2i["a"] == 2, "most frequent real word takes index 2"
    assert w2i["<sos>"] == 3 and w2i["<eos>"] == 4
    assert i2w[2] == "a"
    w2i_cut, _ = build_vocab(counter, min_feq=2)
    assert "runs" not in w2i_cut


def test_tokenize_caption_punctuation():
    toks = tokenize_caption("A man, (quickly!) runs/jumps; over: fences?")
    assert toks[0] == "<sos>" and toks[-1] == "<eos>"
    assert "man" in toks and "quickly" in toks
    assert not any(c in t for t in toks for c in "~\\/().!,;?:")


def test_parse_csv_roundtrip(tmp_path):
    import pandas as pd
    rows = []
    for i in range(8):
        rows.append({"VideoID": f"vid{i}", "Start": i, "End": i + 10,
                     "Language": "English", "Source": "clean",
                     "Description": f"a cat number {i} jumps."})
        rows.append({"VideoID": f"vid{i}", "Start": i, "End": i + 10,
                     "Language": "English", "Source": "clean",
                     "Description": "the animal runs"})
    rows.append({"VideoID": "vidX", "Start": 0, "End": 1,
                 "Language": "French", "Source": "clean", "Description": "le chat"})
    pd.DataFrame(rows).to_csv(tmp_path / "corpus.csv", index=False)

    out = parse_csv(str(tmp_path / "corpus.csv"), str(tmp_path / "captions.json"),
                    str(tmp_path / "gts.json"), clean_only=True,
                    split_sizes=(4, 2), seed=123)
    assert len(out["captions"]) == 8, "French row excluded; ids merged per video"
    assert "vid0_0_10" in out["captions"]
    assert len(out["splits"]["train"]) == 4
    assert len(out["splits"]["valid"]) == 2
    assert len(out["splits"]["test"]) == 2
    # determinism of the seeded split
    out2 = parse_csv(str(tmp_path / "corpus.csv"), str(tmp_path / "c2.json"),
                     str(tmp_path / "g2.json"), clean_only=True,
                     split_sizes=(4, 2), seed=123)
    assert out["splits"] == out2["splits"]
    # gts schema
    with open(tmp_path / "gts.json", encoding="utf-8") as f:
        gts = json.load(f)["gts"]
    entry = gts["vid0_0_10"][0]
    assert set(entry) == {"image_id", "cap_id", "caption", "tokenized"}


def test_parse_msr_vtt(tmp_path):
    train = {"videos": [{"video_id": "v0", "split": "train"},
                        {"video_id": "v1", "split": "validate"}],
             "sentences": [{"video_id": "v0", "caption": "a dog barks"},
                           {"video_id": "v1", "caption": "a cat sleeps"}]}
    test = {"videos": [{"video_id": "v2", "split": "test"}]}
    with open(tmp_path / "train.json", "w") as f:
        json.dump(train, f)
    with open(tmp_path / "test.json", "w") as f:
        json.dump(test, f)
    out = parse_msr_vtt(str(tmp_path / "train.json"), str(tmp_path / "test.json"),
                        str(tmp_path / "captions.json"), str(tmp_path / "gts.json"))
    assert out["splits"] == {"train": ["v0"], "valid": ["v1"], "test": ["v2"]}


@pytest.fixture()
def corpus(tmp_path):
    return make_synthetic_corpus(str(tmp_path), n_videos=7, feat_len=8,
                                 feat_dim=16, seed=1)


def test_dataset_fixed_shapes(corpus):
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=12, mode="train", seed=0)
    batches = list(ds.batches(batch_size=2, epoch=0))
    assert len(batches) == ds.steps_per_epoch(2)
    for b in batches:
        assert b.feats.shape == (2, 8, 16)
        assert b.labels.shape == (2, 12)
        assert b.mask.shape == (2, 12)
        assert b.valid.shape == (2,)
    # last batch padding: valid marks real samples
    total_valid = sum(int(b.valid.sum()) for b in batches)
    assert total_valid == len(ds)
    # mask covers label tokens only
    b0 = batches[0]
    assert ((b0.labels != 0) <= (b0.mask > 0)).all()


def test_dataset_deterministic_given_seed_epoch(corpus):
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=12, mode="train", seed=7)
    a = list(ds.batches(2, epoch=3))
    b = list(ds.batches(2, epoch=3))
    c = list(ds.batches(2, epoch=4))
    assert all(x.ids == y.ids for x, y in zip(a, b))
    assert (np.concatenate([x.labels for x in a]) ==
            np.concatenate([y.labels for y in b])).all()
    assert any(x.ids != y.ids for x, y in zip(a, c)), "different epoch reshuffles"


def test_dataset_split_filter_and_specials(corpus):
    ds_train = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                            mode="train")
    ds_valid = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                            mode="valid")
    train_ids = {p.stem for p in ds_train.feat_paths}
    valid_ids = {p.stem for p in ds_valid.feat_paths}
    assert not train_ids & valid_ids
    sp = ds_train.specials
    assert sp["pad_ix"] == 0 and sp["unk_ix"] == 1
    assert ds_train.ix2word[sp["sos_ix"]] == "<sos>"


def test_prefetch_to_device(corpus):
    """prefetch_to_device preserves order/completeness and keeps `depth`
    puts in flight."""
    from s2vt_tpu.data.dataset import VideoDataset, prefetch_to_device
    ds = VideoDataset(corpus["captions_file"], corpus["feat_path"],
                      max_len=8, mode="train", seed=0)
    live = []

    def put(batch):
        live.append(batch.ids)
        return batch.feats  # stand-in for device arrays

    out = list(prefetch_to_device(ds.batches(2, epoch=0), put, depth=2))
    want = list(ds.batches(2, epoch=0))
    assert len(out) == len(want) == len(live)
    for (host, dev), w in zip(out, want):
        assert host.ids == w.ids
        np.testing.assert_array_equal(dev, w.feats)
    # puts were issued in batch order (ahead of consumption)
    assert live == [w.ids for w in want]


def test_ragged_feature_padding(tmp_path):
    """'free'-mode extraction yields ragged lengths; the numpy backend
    pads/truncates to the probed feat_len like the native loader."""
    data = {"word2ix": {"<pad>": 0, "<unk>": 1},
            "ix2word": {"0": "<pad>", "1": "<unk>"},
            "captions": {"a": [[3, 4]], "b": [[3, 4]], "c": [[3, 4]]},
            "splits": {"train": ["a", "b", "c"], "valid": [], "test": []}}
    cap = tmp_path / "captions.json"
    cap.write_text(json.dumps(data))
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    np.save(feat_dir / "a.npy", np.ones((6, 4), np.float32))      # probe len
    np.save(feat_dir / "b.npy", np.ones((3, 4), np.float32) * 2)  # short
    np.save(feat_dir / "c.npy", np.ones((9, 4), np.float32) * 3)  # long
    ds = VideoDataset(str(cap), str(feat_dir), max_len=6, mode="train",
                      backend="numpy")
    batch = next(ds.batches(3, shuffle=False))
    assert batch.feats.shape == (3, 6, 4)
    np.testing.assert_array_equal(batch.feats[1, 3:], 0.0)  # padded tail
    np.testing.assert_array_equal(batch.feats[1, :3], 2.0)
    np.testing.assert_array_equal(batch.feats[2], 3.0)      # truncated


def test_feature_bank_ragged_lengths(tmp_path):
    """'free'-mode extraction produces ragged clip lengths; both the
    streaming path and load_all_features() truncate/zero-pad to the probed
    feat_len identically, so bank and streaming batches stay bit-equal."""
    import numpy as np
    from s2vt_tpu.data.dataset import make_synthetic_corpus, VideoDataset

    meta = make_synthetic_corpus(str(tmp_path), n_videos=6, feat_len=8,
                                 feat_dim=16, seed=5)
    # make two clips ragged: one short, one long
    import pathlib
    paths = sorted(pathlib.Path(meta["feat_path"]).glob("*.npy"))
    np.save(paths[1], np.random.default_rng(0).normal(
        size=(5, 16)).astype(np.float32))
    np.save(paths[2], np.random.default_rng(1).normal(
        size=(12, 16)).astype(np.float32))

    ds = VideoDataset(meta["captions_file"], meta["feat_path"], max_len=8,
                      mode="train", seed=0)
    bank = ds.load_all_features()
    assert bank.shape == (len(ds), ds.feat_len, ds.feat_dim)
    for batch in ds.batches(4, shuffle=False, epoch=0):
        for row in range(4):
            if batch.valid[row] == 0.0:
                continue
            np.testing.assert_array_equal(batch.feats[row],
                                          bank[batch.rows[row]])
