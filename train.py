#!/usr/bin/env python
"""CLI: python train.py [config.yaml ...] [key=value ...]

Reference-compatible surface (``train_lightning.py``): defaults mirror
configs/base.yaml; dotted overrides win.
"""

from generativedensification_tpu.train.train import cli

if __name__ == "__main__":
    from generativedensification_tpu.utils.platform import (
        enable_compile_cache,
        honor_jax_platforms_env,
    )

    honor_jax_platforms_env()
    enable_compile_cache()
    cli()
