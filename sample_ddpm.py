#!/usr/bin/env python3
"""Entry point: python3 sample_ddpm.py … (same CLI as the reference sample_ddpm.py)."""
from ldm_image_generator_tpu.cli.sample_ddpm import main

if __name__ == "__main__":
    main()
