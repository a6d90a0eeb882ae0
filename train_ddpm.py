#!/usr/bin/env python3
"""Entry point: python3 train_ddpm.py … (same CLI as the reference train_ddpm.py)."""
from ldm_image_generator_tpu.cli.train_ddpm import main

if __name__ == "__main__":
    main()
