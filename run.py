#!/usr/bin/env python
"""Reference-compatible entry point (reference run.py CLI):

    python run.py --config StyleGAN2_ffhq_d --target "the face of a man with brown eyes"
"""

from clip_glass_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
