"""Bending refinement of SPM first-arrival paths (autodiff Fermat).

The shortest-path method's first arrivals carry a systematic positive
discretisation bias: graph paths are polylines through mesh nodes, so
they overshoot the true ray time (+2.4-5.4 s over 4-95 deg at the
reference driver config - see ACCURACY.md and the reference's own
error.png vs TauP).  The classical cure is ray bending applied to the
recovered SPM path (Moser, van Eck & Nolet, 1992): treat the polyline
vertices as free variables and minimise the continuous travel-time
functional.  The reference never implemented it; here it is ~60 lines
of jax because the functional

    t(P) = sum_segments |P_{i+1} - P_i| * mean_quad(1 / v(r))

is differentiable end to end (jnp.interp of the radial velocity table,
composite midpoint quadrature per segment) and the optimiser is optax
Adam with the two endpoints pinned and an r <= r_max projection (rays
must not leave the Earth).  vmaps over a batch of paths; on TPU a
whole receiver fan refines in one dispatch.

The refined time is a strict upper bound on the true Fermat minimum
that starts below SPM's own estimate (same functional, more freedom
than mesh vertices), and lands within the quadrature error of ray
theory (tests pin ~0.2 s at 60 deg where SPM is +3 to +38 s off
depending on grid).
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..config import R


def resample_path(points: np.ndarray, m: int) -> np.ndarray:
    """Uniform arc-length resampling of a polyline (m output vertices,
    endpoints preserved).  SPM paths have wildly uneven hops (secondary
    nodes, twin jumps); even spacing conditions the bending problem."""
    points = np.asarray(points, np.float64)
    seg = np.linalg.norm(np.diff(points, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    if s[-1] <= 0:
        return np.repeat(points[:1], m, axis=0)
    si = np.linspace(0.0, s[-1], m)
    return np.stack([np.interp(si, s, points[:, d])
                     for d in range(points.shape[1])], axis=1)


_UNIFORM_DR = 1.0  # km: the vendored tables' native sampling


def _uniform_slowness(profile_r, profile_v, dr: float = _UNIFORM_DR):
    """(r0, inv_dr, table) uniform-radius slowness table.

    The bending functional evaluates slowness at every quadrature point
    of every segment on every Adam step; jnp.interp's binary-search
    costs ~13 sequential table gathers per point, which dominates the
    whole optimisation on TPU (measured 484 ms/step for a 592-path
    fan, ~6x faster with direct uniform indexing).  Resampling the
    (piecewise-linear) profile onto a uniform grid first reduces the
    lookup to one fractional index + 2 gathers, exactly; the resampling
    error is the profile's variation within `dr` (< 0.01 km/s for the
    1-km Earth tables, whose sampling this matches)."""
    r = np.asarray(profile_r, np.float64)
    v = np.maximum(np.asarray(profile_v, np.float64), 1e-12)
    r0, r1 = float(r.min()), float(r.max())
    n = max(int(np.ceil((r1 - r0) / dr)) + 1, 2)
    ru = np.linspace(r0, r1, n)
    tab = np.interp(ru, r, 1.0 / v)
    return r0, float((n - 1) / (r1 - r0)), jnp.asarray(tab)


def _make_ttime(r0, inv_dr, tab, quad: int):
    n = tab.shape[0]

    def slowness(r):
        x = jnp.clip((r - r0) * inv_dr, 0.0, n - 1.0)
        i = jnp.clip(x.astype(jnp.int32), 0, n - 2)
        f = x - i
        return tab[i] * (1.0 - f) + tab[i + 1] * f

    # tiny epsilon under each sqrt: d(sqrt)/dx at 0 is NaN, which a
    # degenerate path (source == receiver: every segment zero-length)
    # or a vertex at the exact origin injects into the whole Adam state
    eps = 1e-18

    def ttime(P):
        A, B = P[:-1], P[1:]
        ts = jnp.linspace(0.5 / quad, 1.0 - 0.5 / quad, quad)
        pts = A[:, None, :] + (B - A)[:, None, :] * ts[None, :, None]
        r = jnp.sqrt(jnp.sum(pts * pts, axis=-1) + eps)
        s_q = slowness(r)
        L = jnp.sqrt(jnp.sum((B - A) ** 2, axis=-1) + eps)
        return jnp.sum(L * jnp.mean(s_q, axis=1))
    return ttime


@functools.partial(jax.jit, static_argnames=("iters", "quad", "lr"))
def _bend_scan_jit(carry, prof, lr, r_max, iters: int, quad: int):
    """One chunk of `iters` Adam steps on a bending carry.  The compiled
    program depends only on (shape, iters, quad, lr): long optimisations
    run as several dispatches of the SAME program, keeping each device
    execution short (the tunnel worker kills very long single programs)
    and the carry device-resident between calls.  `prof` is the
    (r0, inv_dr, table) uniform slowness triple from _uniform_slowness."""
    P0, state0, bestP0, bestT0 = carry
    ttime = _make_ttime(*prof, quad)
    free = jnp.ones((P0.shape[-2], 1), P0.dtype).at[0].set(0.0).at[-1].set(0.0)
    opt = optax.adam(lr)

    def step(carry, _):
        P, state, bestP, bestT = carry
        t, g = jax.value_and_grad(ttime)(P)
        # Adam is not monotone (it can and does diverge on long
        # core-grazing paths): keep the best iterate seen, so the
        # result is never worse than the input polyline.  `better` is
        # False for a NaN t, and the where-form (NOT jnp.minimum, which
        # propagates NaN) keeps the tracking NaN-safe
        better = t < bestT
        bestP = jnp.where(better, P, bestP)
        bestT = jnp.where(better, t, bestT)
        upd, state = opt.update(g * free, state)
        P = P + upd * free
        # project back inside the Earth (bent vertices must not surface)
        r = jnp.sqrt(jnp.sum(P * P, axis=-1, keepdims=True))
        P = jnp.where(r > r_max, P * (r_max / r), P)
        return (P, state, bestP, bestT), None

    carry, _ = jax.lax.scan(step, (P0, state0, bestP0, bestT0), None,
                            length=iters)
    return carry


@functools.partial(jax.jit, static_argnames=("quad", "lr"))
def _bend_init_jit(P, prof, lr, quad: int):
    return (P, optax.adam(lr).init(P), P, _make_ttime(*prof, quad)(P))


@functools.partial(jax.jit, static_argnames=("quad",))
def _bend_final_jit(carry, prof, quad: int):
    P, _, bestP, bestT = carry
    tF = _make_ttime(*prof, quad)(P)
    better = tF < bestT   # False for NaN tF: NaN-safe selection
    return jnp.where(better, P, bestP), jnp.where(better, tF, bestT)


# Batched (vmap over paths) variants of the same three programs.  prof
# and r_max broadcast; only the carry is mapped.
_bend_init_vjit = functools.partial(jax.jit, static_argnames=("quad", "lr"))(
    lambda P, prof, lr, quad: jax.vmap(
        lambda p: _bend_init_jit(p, prof, lr, quad))(P))
_bend_scan_vjit = functools.partial(
    jax.jit, static_argnames=("iters", "quad", "lr"))(
    lambda carry, prof, lr, r_max, iters, quad: jax.vmap(
        lambda c: _bend_scan_jit(c, prof, lr, r_max, iters, quad))(carry))
_bend_final_vjit = functools.partial(jax.jit, static_argnames=("quad",))(
    lambda carry, prof, quad: jax.vmap(
        lambda c: _bend_final_jit(c, prof, quad))(carry))

# Per-dispatch iteration chunk: bounds single-program device wall-clock.
# A monolithic scan over 1000+ iterations recompiles per distinct
# `iters` AND can run long enough on the accuracy-grade configs
# (m=384, quad=16) to hit the tunnel worker's per-execution limit,
# which kills the TPU worker process.  Chunking reuses one compiled
# program and keeps the carry device-resident between dispatches.
_BEND_CHUNK = 200


def _chunked_bend(init_fn, scan_fn, final_fn, P, prof, lr, r_max,
                  iters: int, quad: int, chunk: int = _BEND_CHUNK):
    lr = float(lr)
    carry = init_fn(P, prof, lr, quad)
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        carry = scan_fn(carry, prof, lr, r_max, n, quad)
        done += n
    return final_fn(carry, prof, quad)


def _bend_jit(P, prof, lr, r_max, iters: int, quad: int):
    return _chunked_bend(_bend_init_jit, _bend_scan_jit, _bend_final_jit,
                         P, prof, lr, r_max, iters, quad)


def refine_path(points, profile_r, profile_v, iters: int = 800,
                lr: float = 3.0, quad: int = 8, m: int = 0,
                r_max: float = R):
    """Bend one SPM path to the continuous Fermat minimum.

    points: (k, d) cartesian polyline (d = 2 annulus / 3 wedge),
    receiver..source order as returned by `recontruct_path` indexing.
    profile_r/profile_v: the radial velocity table (ascending radii).
    m > 0 resamples to m uniform-arc-length vertices first (default
    keeps ~2x the input vertex count, capped at 256).

    Returns (refined_points, refined_time) - time in seconds under the
    same slowness model SPM used, so refined_time <= the SPM edge-sum
    up to quadrature error."""
    pts = np.asarray(points, np.float64)
    if pts.shape[0] < 3:
        t = _polyline_time(pts, profile_r, profile_v, quad)
        return pts, float(t)
    if m <= 0:
        m = int(min(256, max(32, 2 * pts.shape[0])))
    pts = resample_path(pts, m)
    r0, inv_dr, tab = _uniform_slowness(profile_r, profile_v)
    prof = (jnp.asarray(r0), jnp.asarray(inv_dr), tab)
    P, t = _bend_jit(jnp.asarray(pts), prof, float(lr),
                     jnp.asarray(float(r_max)), iters, quad)
    return np.asarray(P), float(t)


def _polyline_time(pts, profile_r, profile_v, quad: int = 8) -> float:
    """Continuous-quadrature travel time of a fixed polyline."""
    pts = np.asarray(pts, np.float64)
    if pts.shape[0] < 2:
        return 0.0
    A, B = pts[:-1], pts[1:]
    ts = np.linspace(0.5 / quad, 1.0 - 0.5 / quad, quad)
    q = A[:, None, :] + (B - A)[:, None, :] * ts[None, :, None]
    r = np.sqrt(np.sum(q * q, axis=-1))
    slo = np.interp(r, profile_r, 1.0 / np.maximum(profile_v, 1e-12))
    L = np.linalg.norm(B - A, axis=-1)
    return float(np.sum(L * slo.mean(axis=1)))


def refraction_inits(p0, p1, profile_r, profile_v,
                     depths=(35.0, 410.0, 660.0), n_leg: int = 12,
                     n_flat: int = 24):
    """Candidate refraction-branch (headwave-style) initial polylines
    between two 2-D cartesian points.

    Bending is a LOCAL optimiser: from the SPM first-arrival polyline it
    converges to that branch's Fermat minimum, which near branch
    crossovers is not the global first arrival (measured on the 180x63
    production table: +3.2 s at 2 deg, where the true first arrival is
    the Moho headwave Pn, and +0.55 s at 24 deg in the 660 triplication).
    The classical cure is multi-start: also bend a critical-angle
    refraction geometry per candidate interface - straight legs at
    sin(i_c) = v_above/v_below down to just below the interface, a flat
    segment along it - and keep the minimum.  Initialised this way the
    2-deg arrival bends to within 0.01 s of the tau-p anchor.

    Returns a (possibly empty) list of (k, 2) polylines, one per
    geometrically feasible interface."""
    p0 = np.asarray(p0, np.float64)
    p1 = np.asarray(p1, np.float64)
    pr = np.asarray(profile_r, np.float64)
    pv = np.asarray(profile_v, np.float64)
    R_top = float(pr.max())
    r0 = float(np.hypot(*p0))
    r1 = float(np.hypot(*p1))
    th0 = float(np.arctan2(p0[0], p0[1]))
    th1 = float(np.arctan2(p1[0], p1[1]))
    delta = (th1 - th0 + np.pi) % (2 * np.pi) - np.pi
    s = 1.0 if delta >= 0 else -1.0
    adelta = abs(delta)
    out = []
    for depth in depths:
        r_if = R_top - float(depth)
        if min(r0, r1) < r_if + 5.0:      # an endpoint at/below the interface
            continue
        v_above = float(np.interp(r_if + 1.5, pr, pv))
        v_below = float(np.interp(r_if - 1.5, pr, pv))
        if v_below <= v_above:            # no fast side: no head wave
            continue
        ic = np.arcsin(v_above / v_below)
        off0 = (r0 - r_if) * np.tan(ic) / r_if
        off1 = (r1 - r_if) * np.tan(ic) / r_if
        # exact critical-angle legs when they fit; otherwise (deep
        # interfaces at triplication ranges, where tan(i_c) is large)
        # clip each leg to 35% of the separation - the bend polishes
        # the leg shape, the init only has to be on the right branch
        if off0 + off1 >= adelta:
            off0 = min(off0, 0.35 * adelta)
            off1 = min(off1, 0.35 * adelta)
        r_flat = r_if - 1.5               # inside the fast side
        a1 = th0 + s * np.linspace(0.0, off0, n_leg)
        a2 = th0 + s * np.linspace(off0, adelta - off1, n_flat)
        a3 = th0 + s * np.linspace(adelta - off1, adelta, n_leg)
        rr1 = np.linspace(r0, r_flat, n_leg)
        rr3 = np.linspace(r_flat, r1, n_leg)
        ang = np.concatenate([a1, a2[1:], a3[1:]])
        rad = np.concatenate([rr1, np.full(n_flat - 1, r_flat), rr3[1:]])
        out.append(np.stack([rad * np.sin(ang), rad * np.cos(ang)], axis=1))
    return out


def refine_fan(pts_list, profile_r, profile_v, m: int = 128,
               iters: int = 800, lr: float = 3.0, quad: int = 8,
               multistart: bool = True,
               multistart_max_deg: float = 32.0) -> np.ndarray:
    """(n,) refined times for a list of SPM polylines: bend the whole
    fan batched; with `multistart` also bend critical-angle
    refraction-branch candidates (refraction_inits) at lr=1.0 for
    pairs separated by less than `multistart_max_deg` and keep the
    per-path minimum.  Every candidate is an upper bound on the true
    Fermat minimum, so min() only tightens — the cure for branch
    trapping near the Pn crossover and the 410/660 triplications
    (ACCURACY.md 2e)."""
    cand, cand_ix = [], []
    if multistart:
        max_sep = np.deg2rad(multistart_max_deg)
        for i, pts in enumerate(pts_list):
            p0, p1 = np.asarray(pts[0]), np.asarray(pts[-1])
            if p0.shape[0] != 2:
                continue                   # 2-D annulus geometry only
            th0 = np.arctan2(p0[0], p0[1])
            th1 = np.arctan2(p1[0], p1[1])
            sep = abs((th1 - th0 + np.pi) % (2 * np.pi) - np.pi)
            if 1e-9 < sep <= max_sep:
                for q in refraction_inits(p0, p1, profile_r, profile_v):
                    cand.append(q)
                    cand_ix.append(i)
    _, t = refine_paths_batch(pts_list, profile_r, profile_v, m=m,
                              iters=iters, lr=lr, quad=quad)
    t = np.asarray(t).copy()
    if cand:
        _, tc = refine_paths_batch(cand, profile_r, profile_v, m=m,
                                   iters=iters, lr=1.0, quad=quad)
        np.minimum.at(t, np.asarray(cand_ix), np.asarray(tc))
    return t


# Max paths per bending dispatch series: a single (4736, 384, 16)
# scan program faulted the TPU device outright; sub-batches bound both
# the per-dispatch device time and the program's working set, and the
# last sub-batch is padded so ONE compiled program serves every block.
_BEND_MAX_BATCH = 1024


def refine_paths_batch(paths, profile_r, profile_v, m: int = 128,
                       iters: int = 800, lr: float = 3.0, quad: int = 8,
                       r_max: float = R, sub_batch: int = _BEND_MAX_BATCH):
    """Refine a batch of paths in chunked vmapped dispatches over the
    resampled (n_paths, m, d) stack.  Returns (points, times)."""
    stacked = np.stack([resample_path(np.asarray(p, np.float64), m)
                        for p in paths])
    r0, inv_dr, tab = _uniform_slowness(profile_r, profile_v)
    prof = (jnp.asarray(r0), jnp.asarray(inv_dr), tab)
    rmax = jnp.asarray(float(r_max))

    def run(blk):
        return _chunked_bend(_bend_init_vjit, _bend_scan_vjit,
                             _bend_final_vjit, jnp.asarray(blk), prof,
                             float(lr), rmax, iters, quad)

    B = stacked.shape[0]
    if B <= sub_batch:
        P, t = run(stacked)
        return np.asarray(P), np.asarray(t)
    outP, outT = [], []
    for i in range(0, B, sub_batch):
        blk = stacked[i:i + sub_batch]
        pad = sub_batch - blk.shape[0]
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, axis=0)])
        P, t = run(blk)
        n = sub_batch - pad
        outP.append(np.asarray(P)[:n])
        outT.append(np.asarray(t)[:n])
    return np.concatenate(outP), np.concatenate(outT)
