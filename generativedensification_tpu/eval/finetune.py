"""Per-scene Gaussian fine-tuning (the ``infer.finetuning`` path).

Reference behavior (``renderer.py:128-207`` + ``configs/infer.yaml``
finetuning group): take the feed-forward fine Gaussians (or a fresh
point-cloud init via k-NN scale anchoring), then run a few hundred Adam
steps of render-MSE against the source views with per-attribute learning
rates — xyz / f_dc / f_rest (feature_lr / 20) / opacity / scaling /
rotation, exactly the reference's ``get_params`` grouping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from ..core.activations import inverse_sigmoid
from ..core.knn import mean_knn_sq_dist
from ..splat.rasterizer import rasterize

RGB2SH_C0 = 0.28209479177387814


def init_from_pcd(points: jnp.ndarray, colors: jnp.ndarray, sh_degree: int = 1):
    """Fresh per-scene Gaussian params from a point cloud
    (``create_from_pcd``): DC SH from RGB, k-NN-anchored log scales,
    identity rotations, opacity 0.1."""
    n = points.shape[0]
    n_sh = (sh_degree + 1) ** 2
    d2 = jnp.maximum(mean_knn_sq_dist(points), 1e-7)
    return {
        "xyz": points.astype(jnp.float32),
        "sh_dc": ((colors - 0.5) / RGB2SH_C0)[:, None, :],
        "sh_rest": jnp.zeros((n, n_sh - 1, 3)),
        "opacity": inverse_sigmoid(0.1 * jnp.ones((n, 1))),
        "scaling": jnp.log(jnp.sqrt(d2))[:, None].repeat(3, axis=1),
        "rotation": jnp.zeros((n, 4)).at[:, 0].set(1.0),
    }


def params_from_gaussians(xyz, shs, opacity_raw, scaling_raw, rotation):
    """Wrap feed-forward fine Gaussians as finetunable params."""
    return {
        "xyz": xyz,
        "sh_dc": shs[:, :1],
        "sh_rest": shs[:, 1:],
        "opacity": opacity_raw.reshape(-1, 1),
        "scaling": scaling_raw,
        "rotation": rotation,
    }


def _make_tx(lrs: tuple):
    return optax.multi_transform(
        {k: optax.adam(v) for k, v in lrs}, {k: k for k, _ in lrs}
    )


@functools.partial(
    jax.jit, static_argnames=("sh_degree", "lrs", "raster_items")
)
def _ft_step(p, s, cams, gt_images, bgs, *, sh_degree, lrs, raster_items):
    """One Adam step of render-MSE.  Module-level + static config so the
    compile cache is shared across scenes (a per-scene closure would
    recompile identical-shape programs once per scene)."""
    raster_kw = dict(raster_items)

    def loss_fn(p):
        shs = jnp.concatenate([p["sh_dc"], p["sh_rest"]], axis=1)

        def render_one(cam, bg):
            return rasterize(
                p["xyz"],
                shs,
                jax.nn.sigmoid(p["opacity"][:, 0]),
                jnp.exp(p["scaling"]),
                p["rotation"],
                cam,
                bg,
                sh_degree,
                **raster_kw,
            ).image

        imgs = jax.vmap(render_one)(cams, bgs)
        return jnp.mean((imgs - gt_images) ** 2)

    tx = _make_tx(lrs)
    loss, g = jax.value_and_grad(loss_fn)(p)
    updates, s = tx.update(g, s, p)
    return optax.apply_updates(p, updates), s, loss


def finetune(
    params: dict,
    cams,                    # batched Camera over V source views
    gt_images: jnp.ndarray,  # (V, H, W, 3)
    bgs: jnp.ndarray,        # (V, 3)
    sh_degree: int = 1,
    steps: int = 500,
    position_lr: float = 1.6e-5,
    feature_lr: float = 2.5e-3,
    opacity_lr: float = 0.05,
    scaling_lr: float = 5e-3,
    rotation_lr: float = 1e-3,
    raster_kw: dict | None = None,
):
    raster_kw = raster_kw or {}

    lrs = (
        ("xyz", position_lr),
        ("sh_dc", feature_lr),
        ("sh_rest", feature_lr / 20.0),
        ("opacity", opacity_lr),
        ("scaling", scaling_lr),
        ("rotation", rotation_lr),
    )
    opt_state = _make_tx(lrs).init(params)
    raster_items = tuple(sorted(raster_kw.items()))

    loss = jnp.inf
    for _ in range(steps):
        params, opt_state, loss = _ft_step(
            params, opt_state, cams, gt_images, bgs,
            sh_degree=sh_degree, lrs=lrs, raster_items=raster_items,
        )
    return params, float(loss)
