"""Command-line entry points.

Console scripts (pyproject.toml): s2vt-train, s2vt-eval,
s2vt-prepare-captions, s2vt-extract-features. The repo root also carries
reference-style wrappers (``python train.py`` etc., matching the reference's
script-per-task layout, /root/reference/{train,eval,prepare_captions,
extract_features}.py).
"""

from s2vt_tpu.cli.train import main as train_main  # noqa: F401
from s2vt_tpu.cli.eval import main as eval_main  # noqa: F401
from s2vt_tpu.cli.prepare import main as prepare_main  # noqa: F401


def extract_main():
    from s2vt_tpu.cli.extract import main
    return main()


def export_serving_main():
    from s2vt_tpu.cli.export_serving import main
    return main()
