#!/usr/bin/env python
"""Benchmark driver — reference ``eval_all.py`` equivalent.

Loops the released checkpoints over GSO (with depth eval), Gobjaverse, and
the two Co3D categories at n_views=4, writing per-run metric JSONs that
``metric_co3d.py`` pools.  Runs in-process (no subprocess spawning needed:
the model/config are pure functions of the merged config).
"""

from __future__ import annotations

import sys

from generativedensification_tpu.config import from_dotlist, load_config, merge
from generativedensification_tpu.eval.evaluation import main as eval_main

RUNS = [
    # (tag, dataset_name, data_root, extra overrides)
    ("gso", "GSO", "dataset/google_scanned_objects",
     ["infer.eval_depth=[0.005,0.01,0.02]"]),
    ("gobjaverse", "gobjeverse", "dataset/gobjaverse/gobjaverse.h5", []),
    ("co3d_teddybear", "gobjeverse", "dataset/Co3D/co3d_teddybear.hdf5", []),
    ("co3d_hydrant", "gobjeverse", "dataset/Co3D/co3d_hydrant.hdf5", []),
    # BASELINE.json config 4: Co3D with the 2DGS surfel renderer
    # (depth/normal side outputs; reference swaps the renderer import)
    ("co3d_teddybear_2dgs", "gobjeverse", "dataset/Co3D/co3d_teddybear.hdf5",
     ["tpu.renderer=2dgs"]),
    ("co3d_hydrant_2dgs", "gobjeverse", "dataset/Co3D/co3d_hydrant.hdf5",
     ["tpu.renderer=2dgs"]),
]

CKPTS = [
    ("base", "ckpts/epoch=49", []),
    ("residual", "ckpts/epoch=49_residual", ["model.enable_residual_attribute=True"]),
]


def main(argv):
    extra = [a for a in argv if "=" in a]
    for ckpt_tag, ckpt_path, ckpt_over in CKPTS:
        for tag, ds, root, over in RUNS:
            overrides = [
                f"infer.dataset.dataset_name={ds}",
                f"infer.dataset.data_root={root}",
                f"infer.ckpt_path={ckpt_path}",
                "n_views=4",
                f"infer.metric_path=outputs/metrics/{tag}_{ckpt_tag}.json",
                f"infer.save_folder=outputs/eval/{tag}_{ckpt_tag}",
            ] + over + ckpt_over + extra
            cfg = load_config(None, overrides, infer=True)
            print(f"===== eval {tag} / {ckpt_tag} =====")
            try:
                eval_main(cfg)
            except FileNotFoundError as e:
                print(f"[eval_all] skipped {tag}/{ckpt_tag}: {e}")


if __name__ == "__main__":
    from generativedensification_tpu.utils.platform import honor_jax_platforms_env

    honor_jax_platforms_env()
    main(sys.argv[1:])
