"""Training entry point — reference ``train_lightning.py`` equivalent.

Same config surface (base yaml + dotted CLI overrides), same schedule
semantics (epochs, limit_train_batches, val every epoch, checkpoint every
2 epochs keep-all), TPU-native execution: one jitted train step over a
data-parallel mesh, params replicated, batch sharded, orbax checkpoints,
TensorBoard scalars.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ..config import load_config
from ..data import BatchLoader, dataset_dict
from ..data.pipeline import to_device_batch
from ..models.network import Network, NetworkConfig
from ..parallel.mesh import make_mesh, replicate, shard_batch
from .loss import Losses
from .optim import make_optimizer
from .state import TrainState, create_train_state, restore_checkpoint, save_checkpoint
from .step import make_eval_step, make_train_step


def rand_views_at(seed: int, step: int) -> int:
    """Per-step source-view count in {2, 3, 4} (reference
    network.py:777-779).  STATELESS — derived from (seed, step) so a
    checkpoint resume replays the identical sequence from any step (a
    host-side stateful RNG would restart the sequence from scratch on
    resume)."""
    return 2 + int(
        np.random.default_rng((seed + 17) * 1_000_003 + step).integers(0, 3)
    )


def main(cfg):
    t_start = time.time()
    mesh = make_mesh(min(len(cfg.gpu_id), len(jax.devices())))
    n_dev = mesh.devices.size
    print(f"[train] mesh: {n_dev} device(s) on axis 'data'")

    train_ds = dataset_dict[cfg.train_dataset.dataset_name](cfg.train_dataset)
    val_ds = dataset_dict[cfg.test_dataset.dataset_name](cfg.test_dataset)
    global_batch = cfg.train.batch_size * n_dev
    train_loader = BatchLoader(
        train_ds, global_batch, shuffle=True,
        epoch_fraction=cfg.train.limit_train_batches,
    )
    val_loader = BatchLoader(
        val_ds, global_batch, shuffle=False,
        epoch_fraction=cfg.train.limit_val_batches,
    )

    net_cfg = NetworkConfig.from_config(cfg)
    net = Network(net_cfg)
    losses = Losses()

    sample = to_device_batch(next(iter(train_loader)))
    from ..utils.platform import jit_init

    params = jit_init(
        net, sample, rng=jax.random.PRNGKey(cfg.tpu.seed), with_fine=True
    )
    n_params = sum(np.prod(p.shape) for p in jax.tree.leaves(params))
    print(f"[train] {n_params/1e6:.1f}M parameters")

    tx, schedule = make_optimizer(
        params,
        lr=cfg.train.lr,
        beta1=cfg.train.beta1,
        beta2=cfg.train.beta2,
        weight_decay=cfg.train.weight_decay,
        warmup_iters=cfg.train.warmup_iters,
        grad_clip=cfg.train.get("gradient_clip_val", 0.5),
        accumulate=cfg.train.get("accumulate_grad_batches", 1),
    )
    state = create_train_state(params, tx, seed=cfg.tpu.seed)
    state = replicate(state, mesh)

    ckpt_dir = os.path.join(cfg.logger.dir, cfg.exp_name, "ckpts")
    if cfg.model.ckpt_path:
        state = restore_checkpoint(cfg.model.ckpt_path, state)
        print(f"[train] resumed from {cfg.model.ckpt_path} @ step {int(state.step)}")

    from ..utils.debugging import maybe_profile, nan_guard

    # Per-(with_fine, n_source_views) jitted train steps, built lazily:
    #  * start_fine >= 0 switches the fine stage on at step > start_fine
    #    per step (reference lightning/system.py:26), which in JAX means
    #    two traced step variants;
    #  * use_rand_views samples 2-4 source views per step
    #    (reference network.py:777-779) — one traced variant per count.
    start_fine = cfg.train.start_fine
    use_rand_views = bool(cfg.train.get("use_rand_views", False))
    # Overflow-free warmup (the CUDA rasterizer allocates pair lists
    # dynamically, renderer.py:250-259; the TPU build's static budgets are
    # sized for TRAINED voxel-scale primitives and drop pairs at random
    # init — 233k at the flagship probe).  For the first
    # ``tpu.overflow_warmup_steps`` steps the step runs with the measured
    # generous budgets (``tpu.warmup_max_tiles``/``warmup_enum_tiles``/
    # ``warmup_max_per_tile``, pair budget off — overflow == 0 from
    # random init on the flagship probe, BASELINE.md), then switches to
    # the tight config once splats have shrunk to voxel scale.  Two
    # traced variants, like the start_fine switch.
    warmup_steps = int(cfg.tpu.get("overflow_warmup_steps", 0))
    _steps: dict = {}

    def get_train_step(fine: bool, n_views: int, warm: bool = False):
        key = (fine, n_views, warm)
        if key not in _steps:
            over = {}
            if n_views != net_cfg.n_views:
                over["n_views"] = n_views
            if warm:
                # measured overflow==0-from-random-init budgets per
                # renderer (BASELINE.md warmup probes): 2DGS surfels carry
                # larger random-init screen footprints (1.2M dropped pairs
                # at the 3DGS budgets, 0 at 16/25/16384)
                is_2dgs = cfg.tpu.get("renderer", "3dgs") == "2dgs"
                mt, et, mpt = (16, 25, 16384) if is_2dgs else (9, 16, 8192)
                over.update(
                    max_tiles=int(cfg.tpu.get("warmup_max_tiles") or mt),
                    enum_tiles=int(cfg.tpu.get("warmup_enum_tiles") or et),
                    max_per_tile=int(
                        cfg.tpu.get("warmup_max_per_tile") or mpt
                    ),
                    pair_budget=0.0,
                )
            net_v = Network(dataclasses.replace(net_cfg, **over)) if over else net
            fn = make_train_step(net_v, tx, losses, with_fine=fine)
            _steps[key] = nan_guard(fn, enabled=bool(cfg.tpu.nan_check))
        return _steps[key]

    eval_step = make_eval_step(net, losses, with_fine=True)
    profile_dir = cfg.tpu.profile_dir

    # TB or wandb (reference train_lightning.py:52-56 logger switch)
    tb = wandb = None
    if cfg.logger.get("name", "tensorboard") == "wandb":
        try:
            import wandb as _wandb

            _wandb.init(project=cfg.logger.get("project", "gd_tpu"),
                        name=cfg.exp_name, config=dict(cfg))
            wandb = _wandb
        except Exception as e:
            print(f"[train] wandb unavailable ({e}); falling back to TB")
    if wandb is None:
        try:
            from tensorboardX import SummaryWriter

            tb = SummaryWriter(os.path.join(cfg.logger.dir, cfg.exp_name, "tb"))
        except Exception:
            tb = None

    def log_scalars(prefix, scalars, step):
        if wandb:
            wandb.log({f"{prefix}/{k}": v for k, v in scalars.items()}, step=step)
        elif tb:
            for k, v in scalars.items():
                tb.add_scalar(f"{prefix}/{k}", v, step)

    def log_images(batch_np, out, step):
        """gt / coarse / fine panel every image_interval steps
        (reference system.py:42-43 + vis.py)."""
        from ..utils.vis import make_panel

        B, V, H, W, _ = batch_np["tar_rgb"].shape
        gt = batch_np["tar_rgb"][0].transpose(1, 0, 2, 3).reshape(H, V * W, 3)
        panel = make_panel(
            gt,
            np.asarray(out["image"][0]),
            np.asarray(out.get("image_fine", out["image"])[0]),
            depth=np.asarray(out["depth"][0, ..., 0]),
        )
        if wandb:
            wandb.log({"train/panel": wandb.Image(panel)}, step=step)
        elif tb:
            tb.add_image("train/panel", panel.transpose(2, 0, 1), step)

    # The train/eval step functions consume only: tar_rgb, tar_c2w,
    # tar_w2c, tar_ixt, tar_rays_down, fovx, fovy, near_far, bg_color.
    # The loaders also carry full-res ``tar_rays`` (V x H x W x 6 f32,
    # ~50MB/batch at the flagship), masks, normals and depth for the
    # eval-CLI side outputs; shipping those host->device every step
    # dominated the loader-attached wall time (r5 HDF5 probe).
    _DROP_KEYS = ("tar_rays", "tar_msk", "tar_nrm", "tar_dep")

    def _device_batch(batch_np):
        return shard_batch(
            to_device_batch(
                {k: v for k, v in batch_np.items() if k not in _DROP_KEYS}
            ),
            mesh,
        )

    step = int(state.step)
    t_win = time.time()
    for epoch in range(cfg.train.n_epoch):
        for batch_np in train_loader:
            batch = _device_batch(batch_np)
            fine_now = start_fine < 0 or step > start_fine
            v_now = (
                rand_views_at(cfg.tpu.seed, step) if use_rand_views
                else net_cfg.n_views
            )
            train_step = get_train_step(fine_now, v_now, step < warmup_steps)
            with maybe_profile(profile_dir if step == 20 else None):
                state, stats = train_step(state, batch)
            step += 1
            if step % 20 == 0:
                s = {k: float(v) for k, v in stats.items()}
                s["lr"] = float(schedule(jnp.asarray(step)))
                # loader-attached wall throughput over the window (the
                # first window absorbs compiles; later windows are the
                # end-to-end rate incl. host loading + transfer)
                now = time.time()
                s["samples_per_s"] = 20.0 * global_batch / max(now - t_win,
                                                               1e-9)
                t_win = now
                msg = " ".join(f"{k}={v:.4g}" for k, v in sorted(s.items()))
                print(f"[epoch {epoch} step {step}] {msg}", flush=True)
                log_scalars("train", s, step)
                # overflow alarm: dropped (gaussian, tile) pairs silently
                # zero those pairs' gradients — must be 0 in healthy
                # training (train/step.py).  ``tpu.overflow_alarm``:
                # "warn" (default) | "raise" | "off".
                # NB: the CLI override parser is YAML, which coerces the
                # bare word ``off`` to False — treat any falsy value as off
                alarm = cfg.tpu.get("overflow_alarm", "warn")
                if alarm and alarm != "off" and s.get("overflow", 0.0) > 0:
                    msg = (
                        f"[train] OVERFLOW ALARM @ step {step}: "
                        f"{s['overflow']:.0f} live pairs dropped by the "
                        "static budgets (gradients silently zeroed). "
                        + ("Still in warmup budgets — raise "
                           "tpu.warmup_max_tiles/warmup_max_per_tile."
                           if step <= warmup_steps else
                           "Raise tpu.overflow_warmup_steps or the tight "
                           "budgets (tpu.max_tiles/max_per_tile/"
                           "pair_budget).")
                    )
                    if alarm == "raise":
                        raise RuntimeError(msg)
                    print(msg, flush=True)
            if step % int(cfg.logger.get("image_interval", 1000)) == 0 and (
                tb or wandb
            ):
                out, _ = eval_step(state.params, batch)
                log_images(batch_np, jax.device_get(out), step)

        # validation (metric mean across the val slice)
        if (epoch + 1) % cfg.train.check_val_every_n_epoch == 0:
            accum, n = {}, 0
            for batch_np in val_loader:
                batch = _device_batch(batch_np)
                _, stats = eval_step(state.params, batch)
                for k, v in stats.items():
                    accum[k] = accum.get(k, 0.0) + float(v)
                n += 1
            if n:
                means = {k: v / n for k, v in accum.items()}
                print(f"[val epoch {epoch}] " + " ".join(
                    f"{k}={v:.4g}" for k, v in sorted(means.items())
                ), flush=True)
                log_scalars("val", means, step)

        # checkpoint cadence (a full-state save pulls ~1.6GB D2H +
        # serializes; on short epochs this dominated wall time — r5)
        ckpt_every = int(cfg.train.get("ckpt_every_n_epoch", 2))
        if (epoch + 1) % ckpt_every == 0 or epoch == cfg.train.n_epoch - 1:
            save_checkpoint(ckpt_dir, jax.device_get(state), step)
            print(f"[train] checkpoint @ step {step} -> {ckpt_dir}")

    print(f"[train] done in {(time.time() - t_start)/60:.1f} min")
    return state


def maybe_init_distributed():
    """Multi-host bootstrap (env-triggered; must run before the first JAX
    backend touch).

    * ``GD_DIST_INIT=1`` — TPU pod: ``jax.distributed.initialize()`` with
      no arguments auto-discovers the coordinator from the TPU metadata
      server; ``jax.devices()`` then spans every host, ``make_mesh`` lays
      the data axis over all of them, and GSPMD routes the gradient
      all-reduce over ICI within a slice / DCN across slices.
    * ``GD_NUM_PROCESSES>1`` (+ ``GD_COORDINATOR``, ``GD_PROCESS_ID``) —
      explicit multi-process run (the CPU smoke test in
      tests/test_multihost.py drives two processes this way).

    Single-process runs (the default) skip initialization entirely.
    """
    n_proc = int(os.environ.get("GD_NUM_PROCESSES", "0"))
    if os.environ.get("GD_DIST_INIT"):
        jax.distributed.initialize()
    elif n_proc > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ["GD_COORDINATOR"],
            num_processes=n_proc,
            process_id=int(os.environ["GD_PROCESS_ID"]),
        )


def cli():
    maybe_init_distributed()
    args = sys.argv[1:]
    yamls = [a for a in args if a.endswith((".yaml", ".yml"))]
    overrides = [a for a in args if "=" in a and not a.endswith((".yaml", ".yml"))]
    cfg = load_config(yamls, overrides)
    main(cfg)


if __name__ == "__main__":
    cli()
