"""Independent scalar path-tracer oracle.

A deliberately naive, recursive, per-ray numpy implementation mirroring the
reference's control flow (trace_path recursion src/render.rs:94-146, scalar
material dispatch src/material.rs, scalar intersection src/hittable.rs) —
but consuming the SAME counter-based RNG streams as the vectorized TPU
renderer. With matched randomness, the wavefront renderer must reproduce
the oracle image to floating-point tolerance, which pins the entire
vectorized pipeline (camera, intersection, shading, integration) against
an implementation with none of its vectorization tricks.
"""

from __future__ import annotations

import numpy as np

from potato_tpu.core import rng as prng
from potato_tpu.core import noise as pnoise
from potato_tpu.scene import description as d

BIG = 3.0e38
RAY_EPSILON = 1e-3
SMOL = 1e-7


def _uniforms(seed, salt, ray_id):
    import jax.numpy as jnp

    u1, u2 = prng.uniform2(seed, salt, jnp.asarray([ray_id], jnp.uint32))
    return float(u1[0]), float(u2[0])


def _unit_disk(u1, u2):
    r = np.sqrt(u1)
    th = 2 * np.pi * u2
    return np.array([r * np.cos(th), r * np.sin(th)])


def _unit_sphere(u1, u2):
    # mirrors core/sampling.unit_sphere's sqrt-derived sine (the
    # renderer replaced the sine transcendental with
    # sign(u2 < 1/2) * sqrt(1 - cos^2) for VPU cost; same distribution)
    z = 1.0 - 2.0 * u1
    r = np.sqrt(max(0.0, 1.0 - z * z))
    c = np.cos(2 * np.pi * u2)
    s = np.sqrt(max(0.0, 1.0 - c * c))
    if u2 >= 0.5:
        s = -s
    return np.array([r * c, r * s, z])


def _unit_ball(u1, u2, u3):
    return _unit_sphere(u1, u2) * np.cbrt(u3)


def _equirect_uv(v):
    # latitude via arctan2 (scale-invariant), matching core.math.equirect_uv
    u = 0.5 - np.arctan2(v[2], v[0]) / (2 * np.pi)
    w = np.arctan2(v[1], np.sqrt(v[0] * v[0] + v[2] * v[2] + 1e-12)) / np.pi + 0.5
    return np.array([u, w])


class ScalarScene:
    """numpy view of a CompiledScene's tables."""

    def __init__(self, compiled):
        t = compiled.tables
        self.t = {k: np.asarray(v) for k, v in t._asdict().items()}
        self.cam = {k: np.asarray(v) for k, v in compiled.camera._asdict().items()}
        self.ns = compiled.num_spheres
        self.ntr = compiled.num_triangles


def shoot(scene: ScalarScene, width, height, spp, ray_id, seed):
    pixel = ray_id // spp
    i, j = pixel % width, pixel // width
    j1, j2 = _uniforms(seed, prng.STREAM_PIXEL_JITTER, ray_id)
    u = (i + j1) / width
    v = (j + j2) / height
    l1, l2 = _uniforms(seed, prng.STREAM_LENS, ray_id)
    disk = _unit_disk(l1, l2) * scene.cam["lens_radius"]
    origin_local = np.array([disk[0], disk[1], 0.0])
    s = scene.cam["tan_half_fov"] * scene.cam["focal_dist"]
    target = np.array([
        (2 * u - 1) * s * scene.cam["aspect_ratio"],
        (2 * v - 1) * s,
        -scene.cam["focal_dist"],
    ])
    dl = target - origin_local
    dl /= np.linalg.norm(dl)
    o = scene.cam["orientation"]
    return (o @ origin_local + scene.cam["position"], o @ dl)


def hit_scene(scene: ScalarScene, origin, direction, t_min, t_max):
    """Brute-force closest hit; returns dict or None.

    Semantically the reference's `hit_list` (src/hittable.rs:110-120): a
    scan over spheres then triangles with t_max shrinking per accepted hit
    (so a later primitive wins exact-t ties). The per-primitive tests are
    vectorized over the primitive axis in f64 numpy — the arithmetic per
    primitive is unchanged from the scalar loop, only evaluated as arrays;
    the shrinking-scan semantics are reproduced exactly by taking the LAST
    index that attains the minimum accepted t.
    """
    t = scene.t
    o = origin.astype(np.float64)
    d = direction.astype(np.float64)

    # --- spheres (half-b quadratic, two-root select, src/hittable.rs:39-63)
    c = t["s_center"][:scene.ns].astype(np.float64)
    r = t["s_radius"][:scene.ns].astype(np.float64)
    oc = o[None, :] - c
    a = d @ d
    half_b = oc @ d
    cc = np.einsum("ij,ij->i", oc, oc) - r * r
    delta = half_b * half_b - a * cc
    sq = np.sqrt(np.maximum(delta, 0.0))
    tt0 = (-half_b - sq) / a
    tt1 = (-half_b + sq) / a
    in0 = (tt0 >= t_min) & (tt0 <= t_max)
    in1 = (tt1 >= t_min) & (tt1 <= t_max)
    s_t = np.where(in0, tt0, tt1)
    s_ok = (delta > 0.0) & (in0 | in1)
    s_t = np.where(s_ok, s_t, np.inf)

    # --- triangles (Cramer's-rule MT, src/hittable.rs:65-108)
    a3 = t["tri_pa"][:scene.ntr].astype(np.float64)
    b3 = t["tri_pb"][:scene.ntr].astype(np.float64)
    c3 = t["tri_pc"][:scene.ntr].astype(np.float64)
    ba, ca, pa = a3 - b3, a3 - c3, a3 - o[None, :]
    cxd = np.cross(ca, d[None, :])
    det = np.einsum("ij,ij->i", ba, cxd)
    det_ok = np.abs(det) >= SMOL
    inv = 1.0 / np.where(det_ok, det, 1.0)
    tr_t = np.einsum("ij,ij->i", pa, np.cross(ba, ca)) * inv
    u = np.einsum("ij,ij->i", pa, cxd) * inv
    v = np.einsum("ij,ij->i", np.cross(ba, pa), np.broadcast_to(d, ba.shape)) * inv
    w = 1.0 - u - v
    tr_ok = (det_ok & (tr_t >= t_min) & (tr_t <= t_max)
             & (u >= 0) & (v >= 0) & (w >= 0))
    tr_t = np.where(tr_ok, tr_t, np.inf)

    all_t = np.concatenate([s_t, tr_t])
    if not np.isfinite(all_t).any():
        return None
    # last index attaining the min == the shrinking scan's winner
    idx = all_t.shape[0] - 1 - int(np.argmin(all_t[::-1]))
    tt = all_t[idx]
    pos = o + tt * d
    if idx < scene.ns:
        n = (pos - c[idx]) / r[idx]
        return dict(t=tt, position=pos, normal=n, uv=_equirect_uv(n),
                    material=int(t["s_material"][idx]))
    k = idx - scene.ns
    n = w[k] * t["tri_na"][k] + u[k] * t["tri_nb"][k] + v[k] * t["tri_nc"][k]
    uv = w[k] * t["tri_ua"][k] + u[k] * t["tri_ub"][k] + v[k] * t["tri_uc"][k]
    return dict(t=tt, position=pos, normal=n, uv=uv,
                material=int(t["tri_material"][k]))


def sample_texture(scene, tid, position, uv, depth=2):
    t = scene.t
    kind = int(t["t_kind"][tid])
    if kind == d.TEX_SOLID:
        return t["t_color"][tid].astype(np.float64)
    if kind == d.TEX_DEBUG_UVS:
        return np.array([uv[0], uv[1], 0.0])
    if kind == d.TEX_IMAGE:
        off, w, h = t["t_image"][tid]
        i = int(np.clip(uv[0] * w, 0, w - 1))
        j = int(np.clip(uv[1] * h, 0, h - 1))
        return t["atlas"][off + j * w + i].astype(np.float64)
    if kind == d.TEX_CHECKER:
        fsum = np.floor(position[0]) + np.floor(position[1]) + np.floor(position[2])
        odd, even = t["t_children"][tid]
        child = even if fsum % 2.0 == 0.0 else odd
        if depth <= 0:
            return np.zeros(3)
        return sample_texture(scene, int(child), position, uv, depth - 1)
    if kind == d.TEX_NOISE:
        import jax.numpy as jnp
        f = np.floor(position).astype(np.int32)
        x = float(np.asarray(pnoise.noise_real(
            jnp.asarray(f[0]), jnp.asarray(f[1]), jnp.asarray(f[2]),
            jnp.asarray(int(t["t_seed"][tid])))))
        return np.full(3, 0.5 * x + 0.5)
    if kind == d.TEX_PERLIN:
        import jax.numpy as jnp
        x = float(np.asarray(pnoise.perlin(
            jnp.asarray(position, jnp.float32), int(t["t_seed"][tid]))))
        return np.full(3, x)
    return np.zeros(3)


def eval_emit(scene, kind, color, tex, direction, hit):
    if kind == d.EMIT_DEBUG_NORMALS:
        return hit["normal"].astype(np.float64)
    if kind == d.EMIT_COLOR:
        return color.astype(np.float64)
    if kind == d.EMIT_SKY_GRADIENT:
        t = 0.5 * (direction[1] / np.linalg.norm(direction) + 1.0)
        return (1 - t) * np.ones(3) + t * np.array([0.5, 0.7, 1.0])
    if kind == d.EMIT_SKY_SPHERE:
        return sample_texture(scene, int(tex), hit["position"], hit["uv"])
    return np.zeros(3)


def eval_material(scene, mid, direction, hit, ray_id, bounce, seed):
    t = scene.t
    u1, u2 = _uniforms(seed, int(prng.bounce_salt(bounce, prng.STREAM_SCATTER_A)), ray_id)
    # (u3, u4) share one SCATTER_B block — must mirror the integrator's
    # stream layout exactly (render/integrator.py bounce_step)
    u3, u4 = _uniforms(seed, int(prng.bounce_salt(bounce, prng.STREAM_SCATTER_B)), ray_id)

    normal = hit["normal"]
    skind = int(t["m_scatter_kind"][mid])
    param = float(t["m_scatter_param"][mid])
    scatter = None
    if skind == d.SCATTER_LAMBERT:
        if normal @ direction <= 0:
            sd = normal + _unit_sphere(u1, u2)
            scatter = sd / np.linalg.norm(sd)
    elif skind == d.SCATTER_METAL:
        if normal @ direction <= 0:
            refl = direction - 2 * (direction @ normal) * normal
            sd = refl + param * _unit_ball(u1, u2, u3)
            sd = sd / np.linalg.norm(sd)
            if normal @ sd >= 0:
                scatter = sd
    elif skind == d.SCATTER_DIELECTRIC:
        if normal @ direction > 0:
            eta, n = param, -normal
        else:
            eta, n = 1.0 / param, normal
        r0 = ((1 - eta) / (1 + eta)) ** 2
        reflectance = r0 + (1 - r0) * (1 + n @ direction) ** 5
        if u4 < reflectance:
            scatter = direction - 2 * (direction @ n) * n
        else:
            cos = n @ direction
            k = 1 - eta * eta * (1 - cos * cos)
            if k > 0:
                scatter = eta * direction - (eta * cos + np.sqrt(k)) * n
            else:
                scatter = direction - 2 * (direction @ n) * n

    akind = int(t["m_absorb_kind"][mid])
    if akind == d.ABSORB_WHITE_BODY:
        absorb = np.ones(3)
    elif akind == d.ABSORB_ALBEDO:
        absorb = t["m_absorb_color"][mid].astype(np.float64)
    elif akind == d.ABSORB_ALBEDO_MAP:
        absorb = sample_texture(scene, int(t["m_absorb_tex"][mid]),
                                hit["position"], hit["uv"])
    else:
        absorb = np.zeros(3)

    emit = eval_emit(scene, int(t["m_emit_kind"][mid]), t["m_emit_color"][mid],
                     t["m_emit_tex"][mid], direction, hit)
    return scatter, absorb, emit


def background(scene, direction):
    dn = direction / np.linalg.norm(direction)
    hit = dict(position=dn, normal=dn, uv=_equirect_uv(dn))
    return eval_emit(scene, int(scene.t["bg_kind"]), scene.t["bg_color"],
                     scene.t["bg_tex"], direction, hit)


def trace(scene, origin, direction, depth, ray_id, bounce, seed):
    """trace_path_continue semantics (render.rs:125-146) with first-bounce
    AOV handling done by the caller."""
    if depth == 0:
        return np.zeros(3)
    hit = hit_scene(scene, origin, direction, RAY_EPSILON, BIG)
    if hit is None:
        return background(scene, direction)
    scatter, absorb, emit = eval_material(
        scene, hit["material"], direction, hit, ray_id, bounce, seed)
    if scatter is None:
        return emit
    rec = trace(scene, hit["position"], scatter, depth - 1, ray_id, bounce + 1, seed)
    return emit + absorb * rec


def render_oracle(compiled, width, height, spp, max_bounce, seed):
    """Full scalar render -> (H, W, 3) float64."""
    scene = ScalarScene(compiled)
    img = np.zeros((height, width, 3))
    for pixel in range(width * height):
        acc = np.zeros(3)
        for s in range(spp):
            ray_id = pixel * spp + s
            o, dr = shoot(scene, width, height, spp, ray_id, seed)
            acc += trace(scene, o, dr, max_bounce, ray_id, 0, seed)
        img[pixel // width, pixel % width] = acc / spp
    return img
