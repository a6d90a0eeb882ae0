#!/usr/bin/env python3
"""Entry point: python3 train_ldm.py … (same CLI as the reference train_ldm.py)."""
from ldm_image_generator_tpu.cli.train_ldm import main

if __name__ == "__main__":
    main()
