"""CLI shim (reference: scripts/run_monai_unet.py:1-4)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from segmantic_tpu.commands.unet_cli import main

if __name__ == "__main__":
    main()
