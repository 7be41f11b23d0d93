"""Primitive intersection: analytic spheres + Möller–Trumbore triangles.

Batched, branchless analogues of the reference's scalar intersectors
(`hit_sphere` src/hittable.rs:39-63, `hit_triangle` src/hittable.rs:65-108,
`hit_list` src/hittable.rs:110-120). Every function broadcasts rays
(..., 3) against primitives and returns mask + hit fields; `Option<Hit>`
becomes a valid mask with safe dummy values in masked lanes.
"""

from __future__ import annotations

import jax.numpy as jnp

from potato_tpu.core import math as pmath
from potato_tpu.core.types import BIG, SMOL, HitBatch, RayBatch


def sphere_hit_t(center, radius, origin, direction, t_min, t_max):
    """Quadratic sphere test (reference src/hittable.rs:39-57): half-b form,
    closer root first, farther root if the closer is out of range.

    All args broadcast; returns (t, valid).
    """
    to_center = origin - center
    a = pmath.norm_squared(direction)
    half_b = pmath.dot(direction, to_center)
    c = pmath.norm_squared(to_center) - radius * radius
    delta = half_b * half_b - a * c
    sphere_ok = delta > 0.0

    # sqrt'(0) = inf: guard the miss lanes or reverse-mode AD turns their
    # zero cotangent into NaN (0 * inf) and poisons the whole batch
    sqrt_delta = jnp.sqrt(jnp.where(sphere_ok, delta, 1.0))
    inv_a = 1.0 / a
    t0 = (-half_b - sqrt_delta) * inv_a
    t1 = (-half_b + sqrt_delta) * inv_a
    t0_ok = (t0 >= t_min) & (t0 <= t_max)
    t1_ok = (t1 >= t_min) & (t1 <= t_max)
    t = jnp.where(t0_ok, t0, t1)
    valid = sphere_ok & (t0_ok | t1_ok)
    return jnp.where(valid, t, BIG), valid


def sphere_hit_fields(center, radius, t, origin, direction):
    """Position/normal/uv of a sphere hit (reference src/hittable.rs:59-62)."""
    position = origin + t[..., None] * direction
    # guard the r=0 degenerate pad sphere: it never wins a hit, but an
    # unguarded 0-division would put NaN in the untaken branch of downstream
    # selects and poison gradients
    safe_r = jnp.where(radius == 0.0, 1.0, radius)
    normal = (position - center) / safe_r[..., None]
    uv = pmath.equirect_uv(normal)
    return position, normal, uv


def triangle_hit_t(pa, pb, pc, origin, direction, t_min, t_max):
    """Cramer's-rule Möller–Trumbore (reference src/hittable.rs:65-101):
    solve [a-b, a-c, d] [u v t]^T = a-o. Degenerate dets (< SMOL) miss.

    Returns (t, u, v, valid); barycentric weight of corner a is w = 1-u-v.
    """
    ba = pa - pb
    ca = pa - pc
    pa_o = pa - origin
    d = direction

    # det = ba . (ca x d)  (triple product, expanded like the reference)
    ca_x_d = jnp.cross(ca, d)
    det = pmath.dot(ba, ca_x_d)
    det_ok = jnp.abs(det) >= SMOL
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)

    # triple-product identities: t = pa.(ba x ca),  u = pa.(ca x d),
    # v = pa.(d x ba) = d.(ba x pa)   (all cyclic permutations, sign kept)
    t = pmath.dot(pa_o, jnp.cross(ba, ca)) * inv_det
    u = pmath.dot(pa_o, ca_x_d) * inv_det
    v = pmath.dot(d, jnp.cross(ba, pa_o)) * inv_det
    w = 1.0 - u - v

    valid = det_ok & (t >= t_min) & (t <= t_max) & (u >= 0.0) & (v >= 0.0) & (w >= 0.0)
    return jnp.where(valid, t, BIG), u, v, valid


def triangle_hit_t_watertight(pa, pb, pc, origin, direction, t_min, t_max):
    """Watertight ray/triangle intersection (Woop, Benthin & Wald 2013) —
    the BASELINE north-star upgrade over the reference's Cramer's-rule form
    (src/hittable.rs:65-101).

    The ray is transformed to a shear frame where it points down +z; the
    three 2D edge functions U, V, W are then exact up to a common rounding,
    and a ray crossing a shared edge/vertex is accepted by at least one of
    the adjacent triangles (edges cannot leak). Boundary hits (some edge
    function exactly 0) are accepted when the remaining signs agree.

    Returns (t, u, v, valid) with the same barycentric convention as
    `triangle_hit_t`: u weights pb, v weights pc, 1-u-v weights pa.
    """
    d = direction

    # shear-frame axes: kz = largest |d| component; kx, ky cyclic, swapped
    # when d[kz] < 0 to preserve winding
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    dz = jnp.take_along_axis(d, kz[..., None], axis=-1)[..., 0]
    swap = dz < 0.0
    kx, ky = jnp.where(swap, ky, kx), jnp.where(swap, kx, ky)

    def sel(vec, k):
        return jnp.take_along_axis(
            jnp.broadcast_to(vec, jnp.broadcast_shapes(vec.shape, d.shape)),
            k[..., None], axis=-1)[..., 0]

    safe_dz = jnp.where(dz == 0.0, 1.0, dz)  # dz != 0 unless d == 0
    sx = sel(d, kx) / safe_dz
    sy = sel(d, ky) / safe_dz
    sz = 1.0 / safe_dz

    a = pa - origin
    b = pb - origin
    c = pc - origin
    az, bz, cz = sel(a, kz), sel(b, kz), sel(c, kz)
    ax = sel(a, kx) - sx * az
    ay = sel(a, ky) - sy * az
    bx = sel(b, kx) - sx * bz
    by = sel(b, ky) - sy * bz
    cx = sel(c, kx) - sx * cz
    cy = sel(c, ky) - sy * cz

    # 2D edge functions: area(O,B,C) weights pa, area(O,C,A) weights pb,
    # area(O,A,B) weights pc — in the symmetrized form
    #   e(P, Q) = 0.5*((Px*Qy - Py*Qx) - (Qx*Py - Qy*Px))
    # whose value under operand swap is the exact floating-point negation
    # even when the compiler contracts the inner subtractions into FMAs.
    # The naive single-difference form loses that antisymmetry under
    # contraction, silently voiding the watertight guarantee (observed as
    # shared-edge leaks; ops/flash.py runs the same form in the kernel).
    def _edge(px, py, qx, qy):
        return 0.5 * ((px * qy - py * qx) - (qx * py - qy * px))

    u_e = _edge(cx, cy, bx, by)
    v_e = _edge(ax, ay, cx, cy)
    w_e = _edge(bx, by, ax, ay)

    det = u_e + v_e + w_e
    same_sign = ((u_e >= 0.0) & (v_e >= 0.0) & (w_e >= 0.0)) | \
                ((u_e <= 0.0) & (v_e <= 0.0) & (w_e <= 0.0))
    det_ok = det != 0.0
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)

    t_scaled = u_e * (sz * az) + v_e * (sz * bz) + w_e * (sz * cz)
    t = t_scaled * inv_det
    u = v_e * inv_det   # pb weight
    v = w_e * inv_det   # pc weight

    valid = det_ok & same_sign & (t >= t_min) & (t <= t_max)
    return jnp.where(valid, t, BIG), u, v, valid


def triangle_hit_fields(t, u, v, na, nb, nc, ua, ub, uc, origin, direction):
    """Barycentric interpolation of normal/uv (reference src/hittable.rs:103-107).
    The interpolated normal is intentionally NOT renormalized (quirk kept)."""
    w = (1.0 - u - v)[..., None]
    position = origin + t[..., None] * direction
    normal = w * na + u[..., None] * nb + v[..., None] * nc
    uv = w[..., :1] * ua + u[..., None] * ub + v[..., None] * uc
    return position, normal, uv


def intersect_brute_force(tables, rays: RayBatch) -> HitBatch:
    """Closest hit over ALL spheres and triangles: dense (B, N) tests.

    This is the reference's `Hittable::List` oracle (src/hittable.rs:110-120)
    — exact, no acceleration — used for small scenes and as the correctness
    oracle for the clustered traversal. Maps to dense VPU ops.
    """
    origin = rays.origin[:, None, :]      # (B,1,3)
    direction = rays.direction[:, None, :]
    t_min = rays.t_min[:, None]
    t_max = rays.t_max[:, None]

    # --- spheres: (B, S) ---
    st, s_valid = sphere_hit_t(
        tables.s_center[None, :, :], tables.s_radius[None, :],
        origin, direction, t_min, t_max)
    s_best = jnp.argmin(jnp.where(s_valid, st, BIG), axis=1)       # (B,)
    s_t = jnp.take_along_axis(st, s_best[:, None], axis=1)[:, 0]
    s_hit = jnp.take_along_axis(s_valid, s_best[:, None], axis=1)[:, 0]

    # --- triangles: (B, T) ---
    tt, tu, tv, t_valid = triangle_hit_t(
        tables.tri_pa[None], tables.tri_pb[None], tables.tri_pc[None],
        origin, direction, t_min, t_max)
    t_best = jnp.argmin(jnp.where(t_valid, tt, BIG), axis=1)
    take = lambda a: jnp.take_along_axis(a, t_best[:, None], axis=1)[:, 0]  # noqa: E731
    tr_t, tr_u, tr_v = take(tt), take(tu), take(tv)
    tr_hit = take(t_valid)

    # --- assemble the winning record per lane ---
    sphere_wins = s_hit & (~tr_hit | (s_t <= tr_t))

    # miss lanes carry t = BIG; computing fields at ~3e38 overflows (x^2 ->
    # inf) and the inf/inf partials of the uv arctan2 NaN the backward pass
    # even under a zero cotangent. Fields only matter for winners, so clamp.
    s_t_safe = jnp.where(s_hit, s_t, 1.0)
    tr_t_safe = jnp.where(tr_hit, tr_t, 1.0)

    sc = tables.s_center[s_best]
    sr = tables.s_radius[s_best]
    s_pos, s_nrm, s_uv = sphere_hit_fields(sc, sr, s_t_safe, rays.origin, rays.direction)
    s_mat = tables.s_material[s_best]

    t_pos, t_nrm, t_uv = triangle_hit_fields(
        tr_t_safe, tr_u, tr_v,
        tables.tri_na[t_best], tables.tri_nb[t_best], tables.tri_nc[t_best],
        tables.tri_ua[t_best], tables.tri_ub[t_best], tables.tri_uc[t_best],
        rays.origin, rays.direction)
    t_mat = tables.tri_material[t_best]

    sw3 = sphere_wins[:, None]
    return HitBatch(
        t=jnp.where(sphere_wins, s_t, tr_t),
        position=jnp.where(sw3, s_pos, t_pos),
        normal=jnp.where(sw3, s_nrm, t_nrm),
        uv=jnp.where(sw3, s_uv, t_uv),
        material=jnp.where(sphere_wins, s_mat, t_mat),
        valid=s_hit | tr_hit,
    )
