"""CLI: convert a reference torch checkpoint to an orbax-ready params file.

Maps the reference's released Lightning checkpoints (``epoch=49.ckpt``,
``epoch=49_residual.ckpt`` — ``README.md:88-94``) or a raw timm DINO ViT
state_dict onto this framework's parameter tree via
:mod:`generativedensification_tpu.utils.torch_convert`.

Usage:
  python -m generativedensification_tpu.tools.convert_torch_ckpt \
      --ckpt epoch=49.ckpt --out converted_params \
      [--config configs/base.yaml k=v ...] [--vit-only]

``--vit-only`` maps a bare timm ``vit_base_patch16_224.dino`` state_dict
(keys without the ``net.img_encoder.model.`` prefix) onto just the image
encoder — the pretrained-DINO initialization path of the reference
(``lightning/network.py:42-83``).
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", nargs="*", default=[])
    ap.add_argument("--vit-only", action="store_true")
    args, overrides = ap.parse_known_args(argv)

    import jax
    import numpy as np

    from ..config import load_config
    from ..models.network import Network, NetworkConfig
    from ..utils import torch_convert as tc

    cfg = load_config(
        [c for c in args.config if c.endswith((".yaml", ".yml"))],
        [o for o in (args.config + overrides) if "=" in o],
    )
    net_cfg = NetworkConfig.from_config(cfg)
    net = Network(net_cfg)

    # CPU init at a tiny batch — only the parameter tree matters
    from ..data.synthetic import make_probe_batch

    batch = make_probe_batch(
        B=1, V_total=2 * net_cfg.n_views, H=64, W=64, n_views=net_cfg.n_views
    )
    params = net.init({"params": jax.random.PRNGKey(0)}, batch, with_fine=True)

    sd = tc.load_torch_state_dict(args.ckpt)
    if args.vit_only:
        # bare timm state_dict -> prefix it the way the network ckpt does
        sd = {f"net.img_encoder.model.{k}": v for k, v in sd.items()}
    params = tc.convert_state_dict(sd, params)

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(args.out, jax.tree.map(np.asarray, params), force=True)
    print(f"[convert_torch_ckpt] wrote {args.out}")


if __name__ == "__main__":
    main(sys.argv[1:])
