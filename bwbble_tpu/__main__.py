"""`python -m bwbble_tpu` — the bwbble CLI (see bwbble_tpu.cli)."""

import sys

from bwbble_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
