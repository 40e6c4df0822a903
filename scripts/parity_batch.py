"""One-process batch of the parity renders recorded in PARITY.md.

Runs (each needs the TPU; one process amortizes client startup):
  1. ssim_reference   — committed CornellBox.gltf vs Gallery/CornellBox.png
  2. gallery_cornell  — reconstructed gallery scene vs the same PNG

Usage: python scripts/parity_batch.py [size] [spp]
Prints the two SSIM lines; copy them into PARITY.md.
"""

import os
import sys
import runpy

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.dirname(HERE))


def main():
    size = sys.argv[1] if len(sys.argv) > 1 else "256"
    spp = sys.argv[2] if len(sys.argv) > 2 else "256"
    print(f"=== ssim_reference {size} {spp} ===", flush=True)
    sys.argv = ["ssim_reference.py", size, spp]
    runpy.run_path(os.path.join(HERE, "ssim_reference.py"), run_name="__main__")
    print(f"=== gallery_cornell {size} {spp} ===", flush=True)
    sys.argv = ["gallery_cornell.py", size, spp]
    runpy.run_path(os.path.join(HERE, "gallery_cornell.py"), run_name="__main__")


if __name__ == "__main__":
    main()
