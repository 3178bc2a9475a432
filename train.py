"""Reference-style wrapper: ``python train.py`` (see s2vt_tpu/cli/train.py)."""
from s2vt_tpu.cli.train import main

if __name__ == "__main__":
    main()
