"""Reference-style wrapper: ``python extract_features.py`` (see s2vt_tpu/cli/extract.py)."""
from s2vt_tpu.cli.extract import main

if __name__ == "__main__":
    main()
