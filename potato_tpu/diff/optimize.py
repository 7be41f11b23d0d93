"""Inverse rendering: differentiable losses + the texture-optimization loop.

BASELINE.json config 5: optimize texture texels (and optionally other scene
parameters) so the rendered image matches a target, by gradient descent
through the full wavefront path tracer. Checkpoint/resume included — the
subsystem the reference lacks entirely (SURVEY.md §5: tiles are
completed-or-lost there).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from functools import partial
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from potato_tpu.render.renderer import make_intersect_fn, render_chunk
from potato_tpu.scene.tables import CompiledScene, SceneTables

# Differentiable leaves of SceneTables, by field name.
#
# Every field below is differentiable on EVERY accel, including the
# production flash kernel: the kernel detaches only the hit decision
# (t and winning primitive slot, ops/flash.py), while these parameters
# enter the radiance through the shade-table gather, material evaluation
# and texture sampling — all in differentiable XLA. Pinned against finite
# differences on both brute and flash paths in tests/test_gradients.py.
# What is NOT differentiable anywhere here is d(hit decision)/d(geometry)
# (triangle vertex positions moving silhouettes), which none of these
# fields touch.
DIFFERENTIABLE_FIELDS = (
    "atlas",            # image texture texels
    "t_color",          # solid texture colors
    "m_absorb_color",   # material albedos
    "m_emit_color",     # emission colors
    "m_scatter_param",  # metal fuzz / dielectric IOR
    "bg_color",
)


def make_render_loss(scene: CompiledScene, *, width: int, height: int,
                     spp: int, max_bounce: int, seed: int,
                     fields: tuple = ("atlas",)) -> Callable:
    """Returns loss(params, ray_ids, target) -> scalar MSE, where `params`
    is a dict {field_name: array} substituted into the scene tables. The
    whole render is differentiated w.r.t. every param leaf."""
    for f in fields:
        assert f in DIFFERENTIABLE_FIELDS, f
    # Optimizing m_scatter_param includes the dielectric IOR, whose
    # reflect/refract Bernoulli choice is detached in the sampler — enable
    # the score-function surrogate so the choice-probability gradient term
    # is not silently dropped (diff/surrogate.py; forward images unchanged).
    chunk_fn = partial(render_chunk, intersect_fn=make_intersect_fn(scene),
                       width=width, height=height, spp=spp,
                       max_bounce=max_bounce, seed=seed,
                       ior_score="m_scatter_param" in fields)

    def loss(params: Dict[str, jnp.ndarray], ray_ids, target):
        """target is per-PIXEL (N, 3); ray_ids must cover whole pixels in
        order. Colors are spp-averaged before the MSE — comparing single
        rays against pixel means would add an irreducible within-pixel
        variance floor to the loss."""
        tables = scene.tables._replace(**params)
        out = chunk_fn(tables, scene.camera, ray_ids)
        pixel_color = out.color.reshape(-1, spp, 3).mean(axis=1)
        return jnp.mean((pixel_color - target) ** 2)

    return loss


@dataclass
class OptimizeResult:
    params: Dict[str, np.ndarray]
    losses: List[float] = field(default_factory=list)
    steps_done: int = 0


def optimize_textures(scene: CompiledScene, target: np.ndarray, *,
                      width: int, height: int, spp: int = 2,
                      max_bounce: int = 4, seed: int = 0,
                      fields: tuple = ("atlas",),
                      steps: int = 100, learning_rate: float = 0.05,
                      adam: bool = True,
                      checkpoint_path: Optional[str] = None,
                      checkpoint_every: int = 25,
                      log_every: int = 10,
                      init: Optional[Dict[str, np.ndarray]] = None,
                      metrics=None) -> OptimizeResult:
    """Gradient-descend scene parameters to match `target` (H, W, 3).

    Resumes from `checkpoint_path` if it exists (step counter, params and
    optimizer moments all restored — a crash mid-optimization loses at most
    `checkpoint_every` steps).

    metrics: optional utils.metrics.MetricsLogger (or POTATO_METRICS env
    path) — emits structured opt_step / opt_checkpoint JSONL events.
    """
    import time

    from potato_tpu.utils.metrics import from_env_or

    metrics = from_env_or(metrics)
    total = width * height * spp
    ray_ids = jnp.arange(total, dtype=jnp.uint32)
    target_rays = jnp.asarray(np.asarray(target, np.float32).reshape(-1, 3))

    loss_fn = make_render_loss(scene, width=width, height=height, spp=spp,
                               max_bounce=max_bounce, seed=seed, fields=fields)

    params = {f: jnp.asarray(getattr(scene.tables, f)) for f in fields}
    if init:
        params.update({k: jnp.asarray(v) for k, v in init.items()})
    m = {k: jnp.zeros_like(v) for k, v in params.items()}
    v = {k: jnp.zeros_like(p) for k, p in params.items()}
    start_step = 0
    losses: List[float] = []

    if checkpoint_path and os.path.exists(checkpoint_path):
        ckpt = np.load(checkpoint_path, allow_pickle=True)
        start_step = int(ckpt["step"])
        losses = list(ckpt["losses"])
        params = {k: jnp.asarray(ckpt[f"p_{k}"]) for k in fields}
        m = {k: jnp.asarray(ckpt[f"m_{k}"]) for k in fields}
        v = {k: jnp.asarray(ckpt[f"v_{k}"]) for k in fields}

    @jax.jit
    def step_fn(params, m, v, step):
        loss, grads = jax.value_and_grad(loss_fn)(params, ray_ids, target_rays)
        if adam:
            b1, b2, eps = 0.9, 0.999, 1e-8
            new_p, new_m, new_v = {}, {}, {}
            t = step + 1
            for k, g in grads.items():
                new_m[k] = b1 * m[k] + (1 - b1) * g
                new_v[k] = b2 * v[k] + (1 - b2) * g * g
                mhat = new_m[k] / (1 - b1 ** t)
                vhat = new_v[k] / (1 - b2 ** t)
                new_p[k] = params[k] - learning_rate * mhat / (jnp.sqrt(vhat) + eps)
            return new_p, new_m, new_v, loss
        new_p = {k: params[k] - learning_rate * g for k, g in grads.items()}
        return new_p, m, v, loss

    def save(step):
        if not checkpoint_path:
            return
        payload = {"step": step, "losses": np.asarray(losses)}
        payload.update({f"p_{k}": np.asarray(p) for k, p in params.items()})
        payload.update({f"m_{k}": np.asarray(p) for k, p in m.items()})
        payload.update({f"v_{k}": np.asarray(p) for k, p in v.items()})
        tmp = checkpoint_path + ".tmp.npz"
        with open(tmp, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, checkpoint_path)  # atomic: crash loses <= 1 interval

    for step in range(start_step, steps):
        t_s = time.perf_counter()
        params, m, v, loss = step_fn(params, m, v, jnp.float32(step))
        losses.append(float(loss))
        metrics.log("opt_step", step=step, loss=float(loss),
                    seconds=round(time.perf_counter() - t_s, 4))
        if log_every and (step % log_every == 0 or step == steps - 1):
            print(f"step {step}: loss {float(loss):.6f}")
        if checkpoint_path and (step + 1) % checkpoint_every == 0:
            save(step + 1)
            metrics.log("opt_checkpoint", step=step + 1)
    save(steps)

    return OptimizeResult(
        params={k: np.asarray(p) for k, p in params.items()},
        losses=losses, steps_done=steps)
