"""End-to-end single-clip captioning CLI (see s2vt_tpu/cli/caption.py)."""
from s2vt_tpu.cli.caption import main

if __name__ == "__main__":
    main()
