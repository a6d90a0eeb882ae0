#!/usr/bin/env python3
"""Entry point: python3 sample_ldm.py … (same CLI as the reference sample_ldm.py)."""
from ldm_image_generator_tpu.cli.sample_ldm import main

if __name__ == "__main__":
    main()
