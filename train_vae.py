#!/usr/bin/env python3
"""Entry point: python3 train_vae.py … (same CLI as the reference train_vae.py)."""
from ldm_image_generator_tpu.cli.train_vae import main

if __name__ == "__main__":
    main()
