#!/usr/bin/env python
"""CLI: python evaluation.py [configs/infer.yaml] [key=value ...]

Reference-compatible surface (``evaluation.py:231-239``): infer defaults +
yaml(s) + dotted overrides.
"""

import sys

from generativedensification_tpu.config import load_config
from generativedensification_tpu.eval.evaluation import main

if __name__ == "__main__":
    from generativedensification_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    args = sys.argv[1:]
    yamls = [a for a in args if a.endswith((".yaml", ".yml"))]
    overrides = [a for a in args if "=" in a and not a.endswith((".yaml", ".yml"))]
    cfg = load_config(yamls, overrides, infer=True)
    main(cfg)
