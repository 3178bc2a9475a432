"""Reference-style wrapper: ``python prepare_captions.py`` (see s2vt_tpu/cli/prepare.py)."""
from s2vt_tpu.cli.prepare import main

if __name__ == "__main__":
    main()
