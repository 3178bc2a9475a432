"""Direct-oracle parity for the data/loss/callback layers: the reference's
prepare_captions.py and utils.py imported and run as test oracles."""

import json
import sys

import numpy as np
import pytest
import torch

import jax.numpy as jnp

sys.path.insert(0, "/root/reference")

try:
    import prepare_captions as ref_prep
    import utils as ref_utils
    HAVE_REF = True
except Exception:
    HAVE_REF = False

pytestmark = pytest.mark.skipif(not HAVE_REF,
                                reason="reference checkout unavailable")


def _csv(tmp_path):
    import pandas as pd
    rows = []
    for i in range(6):
        for cap in (f"A cat number {i} jumps (high)!",
                    "the animal runs; fast?"):
            rows.append({"VideoID": f"vid{i}", "Start": i, "End": i + 10,
                         "Language": "English", "Source": "clean",
                         "Description": cap})
    rows.append({"VideoID": "vidF", "Start": 0, "End": 1,
                 "Language": "French", "Source": "clean",
                 "Description": "le chat"})
    p = tmp_path / "video_corpus.csv"
    pd.DataFrame(rows).to_csv(p, index=False)
    return p


def test_parse_csv_vocab_and_captions_match_reference(tmp_path):
    csv = _csv(tmp_path)
    np.random.seed(0)  # the reference shuffles via the global RNG
    ref_prep.parse_csv(str(csv), str(tmp_path / "ref_cap.json"),
                       str(tmp_path / "ref_gts.json"), clean_only=False)
    ref = json.load(open(tmp_path / "ref_cap.json"))
    ref_gts = json.load(open(tmp_path / "ref_gts.json"))

    from s2vt_tpu.data.corpus import parse_csv
    ours = parse_csv(str(csv), str(tmp_path / "our_cap.json"),
                     str(tmp_path / "our_gts.json"), clean_only=False,
                     split_sizes=(1400, 450), seed=None)

    assert ours["word2ix"] == ref["word2ix"]
    assert ours["captions"] == ref["captions"]
    # same gts captions/ids (list order per video)
    for vid, entries in ref_gts["gts"].items():
        got = ours["gts"][vid]
        assert [e["caption"] for e in got] == [e["caption"] for e in entries]
        assert [e["cap_id"] for e in got] == [e["cap_id"] for e in entries]


def test_mask_criterion_bug_reproduced():
    """Our masked_loss=False mode must equal the reference's MaskCriterion
    (whose reduction='mean' makes the mask a no-op, utils.py:11-26)."""
    torch.manual_seed(0)
    B, L, V = 3, 6, 11
    logits = torch.randn(B, L - 1, V)
    target = torch.randint(0, V, (B, L))
    mask = (torch.rand(B, L) > 0.4).float()

    want = ref_utils.MaskCriterion()(logits, target, mask).item()

    from s2vt_tpu.ops.losses import reference_mean_cross_entropy
    got = float(reference_mean_cross_entropy(
        jnp.asarray(logits.numpy()), jnp.asarray(target.numpy()),
        jnp.asarray(mask.numpy())))
    assert abs(got - want) < 1e-5


def test_early_stopping_matches_reference(tmp_path, monkeypatch):
    """Same stop epoch for the same validation-loss trajectory."""
    monkeypatch.chdir(tmp_path)  # the reference saves ./checkpoint/...pth
    (tmp_path / "checkpoint").mkdir()
    # the reference uses np.Inf, removed in numpy 2 — shim for the oracle
    monkeypatch.setattr(np, "Inf", np.inf, raising=False)
    losses = [1.0, 0.9, 0.95, 0.85, 0.86, 0.87, 0.88]
    patience = 2

    ref = ref_utils.EarlyStopping(patience=patience, verbose=False)
    dummy = torch.nn.Linear(2, 2)
    ref_stop = None
    for i, l in enumerate(losses):
        ref(l, dummy)
        if ref.early_stop:
            ref_stop = i
            break

    from s2vt_tpu.training.callbacks import EarlyStopping
    ours = EarlyStopping(patience=patience, save_fn=lambda: None)
    our_stop = None
    for i, l in enumerate(losses):
        if ours(l):
            our_stop = i
            break
    assert our_stop == ref_stop


def test_dataloader_label_mask_match_reference(tmp_path, monkeypatch):
    """Caption padding/mask semantics equal the reference VideoDataset
    (dataloader.py:41-48), with the caption choice pinned."""
    import dataloader as ref_dl

    vid = "vid000"
    cap = [3, 7, 8, 9, 4]
    data = {"word2ix": {"<pad>": 0, "<unk>": 1},
            "ix2word": {"0": "<pad>", "1": "<unk>"},
            "captions": {vid: [cap]},
            "splits": {"train": [vid], "valid": [], "test": []}}
    (tmp_path / "captions.json").write_text(json.dumps(data))
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    feat = np.arange(8 * 4, dtype=np.float32).reshape(8, 4)
    np.save(feat_dir / f"{vid}.npy", feat)

    monkeypatch.setattr(np.random, "choice",
                        lambda seq, *a, **k: [seq[0]], raising=True)
    ref_ds = ref_dl.VideoDataset(str(tmp_path / "captions.json"),
                                 str(feat_dir), max_len=8, mode="train")
    ref_feat, ref_label, ref_id, ref_mask = ref_ds[0]

    from s2vt_tpu.data.dataset import VideoDataset
    ds = VideoDataset(str(tmp_path / "captions.json"), str(feat_dir),
                      max_len=8, mode="train", backend="numpy")
    batch = next(ds.batches(1, shuffle=False))

    np.testing.assert_array_equal(batch.labels[0],
                                  ref_label.cpu().numpy())
    np.testing.assert_array_equal(batch.mask[0], ref_mask.cpu().numpy())
    np.testing.assert_array_equal(batch.feats[0],
                                  ref_feat.detach().cpu().numpy())
    assert batch.ids[0] == ref_id
