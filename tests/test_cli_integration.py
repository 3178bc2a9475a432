"""Full CLI chain in-process: prepare_captions -> train -> eval
(the reference's script-per-task workflow, README.md usage)."""

import json

import numpy as np
import pytest


@pytest.fixture()
def msvd_csv(tmp_path):
    import pandas as pd
    rows = []
    for i in range(10):
        for cap in (f"a cat number {i} jumps", "the animal runs fast"):
            rows.append({"VideoID": f"vid{i}", "Start": 1, "End": 11,
                         "Language": "English", "Source": "clean",
                         "Description": cap})
    path = tmp_path / "video_corpus.csv"
    pd.DataFrame(rows).to_csv(path, index=False)
    return path


def _run(main, argv, monkeypatch):
    import sys
    monkeypatch.setattr(sys, "argv", ["prog"] + argv)
    main()


def test_prepare_train_eval_chain(msvd_csv, tmp_path, monkeypatch, capsys):
    from s2vt_tpu.cli.eval import main as eval_main
    from s2vt_tpu.cli.prepare import main as prepare_main
    from s2vt_tpu.cli.train import main as train_main

    captions = tmp_path / "captions.json"
    gts = tmp_path / "gts.json"
    _run(prepare_main,
         ["msvd", "--csv_file", str(msvd_csv), "--captions_file", str(captions),
          "--gts_file", str(gts), "--n_train", "6", "--n_valid", "2",
          "--seed", "0"], monkeypatch)
    out = capsys.readouterr().out
    assert "vocab size" in out
    data = json.loads(captions.read_text())
    assert len(data["splits"]["train"]) == 6

    # synthetic features matching the corpus (L=8, D=12)
    feat_dir = tmp_path / "feats"
    feat_dir.mkdir()
    rng = np.random.default_rng(0)
    for vid in data["captions"]:
        np.save(feat_dir / f"{vid}.npy",
                rng.normal(size=(8, 12)).astype(np.float32))

    ckpt_dir = tmp_path / "ckpt"
    _run(train_main,
         ["--caption_file", str(captions), "--feats_path", str(feat_dir),
          "--gts_file", str(gts), "--train_length", "8", "--dim_hidden", "16",
          "--dim_embed", "16", "--feat_dim", "12", "--batch_size", "8",
          "--EPOCHS", "2", "--lr", "0.01", "--save_path", str(ckpt_dir),
          "--log_dir", str(tmp_path / "runs")], monkeypatch)
    out = capsys.readouterr().out
    assert "finished after 2 epochs" in out
    finals = [p for p in ckpt_dir.iterdir() if p.name.endswith("final")]
    assert finals, list(ckpt_dir.iterdir())

    preds_file = tmp_path / "preds.json"
    _run(eval_main,
         ["--model_path", str(finals[0]), "--caption_file", str(captions),
          "--feats_path", str(feat_dir), "--gts_file", str(gts),
          "--batch_size", "8", "--dump_predictions", str(preds_file)],
         monkeypatch)
    out = capsys.readouterr().out
    assert "Bleu_1" in out and "CIDEr" in out
    preds = json.loads(preds_file.read_text())
    assert set(preds.keys()) == set(data["splits"]["test"])
