"""Reference-style wrapper: ``python eval.py`` (see s2vt_tpu/cli/eval.py)."""
from s2vt_tpu.cli.eval import main

if __name__ == "__main__":
    main()
