"""Participating media: homogeneous + heterogeneous AABB volumes.

Wavefront port of Volume.slang: analytic exponential sampling for
homogeneous volumes; delta tracking (null collisions) restarted per
32-cubed max-density block for heterogeneous ones
(Volume.slang:291-356), ratio tracking + Russian roulette for
transmittance (Volume.slang:419-517), NanoVDB grid sampling with the
reference's +-1 voxel jitter replaced 1:1 by dense-brick sampling
(Volume.slang:69-117), and blackbody/palette temperature emission
(Volume.slang:230-253).

All stochastic loops are bounded `lax.while_loop`s over the whole ray
wavefront with masked lanes.  The number of volumes is static (python loop
over volumes), matching the reference's uUBO.VolumesCount loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import blackbody_rgb
from vpt_tpu.render import sampling

BLOCK_DIM = 32  # MAX_DENSITY_GRID_DIM (Volume.slang:11)
MAX_DELTA_STEPS = 2048  # reference uses 10000 (Volume.slang:298); delta
# tracking virtually always terminates far earlier
MAX_TRANSMITTANCE_STEPS = 512  # reference: 1000 (Volume.slang:458)


def intersect_aabb(origin, direction, bmin, bmax):
    """Ray-AABB with the reference's conventions (Volume.slang:190-213):
    returns (near, far); both -1 when tmax < 0 or tmin > tmax."""
    inv = 1.0 / jnp.where(jnp.abs(direction) > 1e-20, direction, 1e-20)
    t0 = (bmin - origin) * inv
    t1 = (bmax - origin) * inv
    tn = jnp.max(jnp.minimum(t0, t1), axis=-1)
    tf = jnp.min(jnp.maximum(t0, t1), axis=-1)
    miss = (tf < 0.0) | (tn > tf)
    return jnp.where(miss, -1.0, tn), jnp.where(miss, -1.0, tf)


def _grid_sample(state, grids, grid_idx, grid_max, sharpness, cmin, cmax, x):
    """Dense-brick density fetch with +-1 voxel jitter (Volume.slang:69-117).

    grids: (G, D, H, W); world pos normalized inside [cmin, cmax], Y flipped
    like the NanoVDB path; value / grid_max * sharpness, clamped to [0, 1].
    """
    g, d, h, w = grids.shape
    npos = (x - cmin) / jnp.maximum(cmax - cmin, 1e-20)
    npos = npos.at[..., 1].set(1.0 - npos[..., 1])
    # Grid axes: (D, H, W) <- (z, y, x)
    fx = npos[..., 0] * w
    fy = npos[..., 1] * h
    fz = npos[..., 2] * d
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    iz = fz.astype(jnp.int32)
    state, j = rng.next_uint(state)
    jx = (j % 3).astype(jnp.int32) - 1
    state, j = rng.next_uint(state)
    jy = (j % 3).astype(jnp.int32) - 1
    state, j = rng.next_uint(state)
    jz = (j % 3).astype(jnp.int32) - 1
    ix = jnp.clip(ix + jx, 0, w - 1)
    iy = jnp.clip(iy + jy, 0, h - 1)
    iz = jnp.clip(iz + jz, 0, d - 1)
    val = grids[grid_idx, iz, iy, ix]
    return state, jnp.clip(val / jnp.maximum(grid_max, 1e-20) * sharpness, 0.0, 1.0)


def _effective_density(vol, vi, base, ray_depth):
    approx = vol.approx_cloud_scattering[vi] != 0
    fall = vol.approx_scattering_falloff[vi]
    return jnp.where(approx, base * jnp.power(fall, ray_depth.astype(jnp.float32)), base)


def _effective_anisotropy(vol, vi, ray_depth):
    g = vol.anisotropy[vi]
    approx = vol.approx_cloud_scattering[vi] != 0
    dec = jnp.power(jnp.abs(g), 1.0 + ray_depth.astype(jnp.float32)) * jnp.sign(g)
    return jnp.where(approx, dec, g)


def density_at_point(state, vol, vi, x, ray_depth):
    """GetDensityAtPoint x GetEffectiveDensity."""
    gi = vol.density_grid_index[vi]
    het = gi >= 0
    if vol.density_grids.shape[0] == 0:
        base = vol.density[vi]
    else:
        state, gval = _grid_sample(
            state, vol.density_grids, jnp.maximum(gi, 0), vol.max_density[vi],
            vol.grid_sharpness[vi], vol.corner_min[vi], vol.corner_max[vi], x,
        )
        base = jnp.where(het, gval * vol.density[vi], vol.density[vi])
    return state, _effective_density(vol, vi, base, ray_depth)


def scatter_distance_in_volume(state, vol, vi: int, origin, direction, ray_depth, active):
    """DoesRayScatterInVolume for one volume over the wavefront
    (Volume.slang:256-356).  Returns (state, t) with t = -1 for no scatter."""
    near, far = intersect_aabb(origin, direction, vol.corner_min[vi], vol.corner_max[vi])
    near0 = jnp.maximum(near, 0.0)
    dist_inside = far - near0
    ok = active & (far >= 0.0) & (dist_inside > 0.0)

    gi = vol.density_grid_index[vi]
    heterogeneous = vol.density_grids.shape[0] > 0  # per-lane gi>=0 refines below

    # Homogeneous: analytic exponential distance
    state, d_hom = sampling.sample_scatter_distance(state, jnp.maximum(vol.density[vi], 1e-20))
    t_hom = jnp.where(ok & (d_hom < dist_inside), near0 + d_hom, -1.0)

    if not heterogeneous:
        return state, jnp.where(gi >= 0, -1.0, t_hom)

    # Heterogeneous: block-DDA delta tracking (Volume.slang:291-356)
    cmin = vol.corner_min[vi]
    cmax = vol.corner_max[vi]
    block_size = (cmax - cmin) / BLOCK_DIM
    eps = 1e-4 * jnp.max(cmax - cmin)
    blocks = vol.max_density_blocks[jnp.maximum(gi, 0)].reshape(-1)

    def block_info(pos):
        rel = (pos - cmin) / jnp.maximum(cmax - cmin, 1e-20)
        idx = jnp.clip((rel * BLOCK_DIM).astype(jnp.int32), 0, BLOCK_DIM - 1)
        lin = idx[..., 0] + idx[..., 1] * BLOCK_DIM + idx[..., 2] * BLOCK_DIM * BLOCK_DIM
        bmin = cmin + block_size * idx.astype(jnp.float32)
        return lin, bmin, bmin + block_size

    n = origin.shape[0]
    live0 = ok & (gi >= 0)
    init = dict(
        state=state,
        t=jnp.zeros(n, jnp.float32),
        result=jnp.full(n, -1.0, jnp.float32),
        live=live0,
        i=jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < MAX_DELTA_STEPS, jnp.any(c["live"]))

    def body(c):
        state = c["state"]
        t = c["t"]
        pos = origin + direction * (near0 + t + eps)[:, None]
        lin, bmin, bmax_b = block_info(pos)
        b_near, b_far = intersect_aabb(pos, direction, bmin, bmax_b)
        max_density = _effective_density(
            vol, vi, blocks[lin] * vol.density[vi], ray_depth
        )
        state, sampled = sampling.sample_scatter_distance(state, jnp.maximum(max_density, 1e-20))

        bad_block = b_far <= 0.0
        to_exit = b_far - jnp.maximum(b_near, 0.0)
        advance_block = (~bad_block) & (sampled > to_exit)

        # Candidate position when a real/null collision test happens
        t_new = jnp.where(bad_block, t + eps, jnp.where(advance_block, t + to_exit + eps, t + sampled))
        exited = (near0 + t_new) > far

        test_lanes = c["live"] & ~bad_block & ~advance_block & ~exited
        scatter_pos = origin + direction * (near0 + t_new)[:, None]
        state, dens = density_at_point(state, vol, vi, scatter_pos, ray_depth)
        state, u = rng.next_float(state)
        real_hit = test_lanes & (dens / jnp.maximum(max_density, 1e-20) >= u)

        result = jnp.where(real_hit, near0 + t_new, c["result"])
        live = c["live"] & ~exited & ~real_hit
        return dict(state=state, t=jnp.where(c["live"], t_new, t), result=result, live=live, i=c["i"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    t_het = out["result"]
    return out["state"], jnp.where(gi >= 0, t_het, t_hom)


def _lane_volume_tables(vol, origin, direction, n_volumes: int):
    """Per-lane entry-sorted volume order (RayGen.slang:164-190): returns
    (order (N, V) i32, near (N, V), far (N, V)) with misses pushed last."""
    nears, fars = [], []
    for vi in range(n_volumes):
        nv, fv = intersect_aabb(origin, direction, vol.corner_min[vi], vol.corner_max[vi])
        nears.append(nv)
        fars.append(fv)
    near = jnp.stack(nears, axis=1)  # (N, V)
    far = jnp.stack(fars, axis=1)
    key = jnp.where(far >= 0.0, jnp.maximum(near, 0.0), jnp.inf)
    ids = jnp.broadcast_to(
        jnp.arange(n_volumes, dtype=jnp.int32)[None, :], key.shape
    )
    key_s, order = jax.lax.sort((key, ids), dimension=1, num_keys=1)
    take = lambda a: jnp.take_along_axis(a, order, axis=1)  # noqa: E731
    return order, take(near), take(far), key_s


def scatter_distance_merged(state, vol, n_volumes: int, origin, direction,
                            ray_depth, active):
    """Single merged march over ALL volumes per ray, entry-sorted
    (ScatteredInVolume, RayGen.slang:162-208): each lane delta-tracks its
    CURRENT volume and advances to the next when it exits, bounding later
    volumes by the best scatter found so far — so the while_loop budget is
    shared across volumes (N-volume cost ~ 1-volume cost) instead of one
    full loop per volume.  Returns (state, t, volume_index) with t = -1
    for no scatter; estimator-identical to per-volume marching because
    each volume's tracking is independent and a nearer scatter always
    wins (Volume.slang:256-356 semantics, maxDistance bound included).
    """
    n = origin.shape[0]
    if n_volumes == 0:
        return state, jnp.full(n, -1.0, jnp.float32), jnp.full(n, -1, jnp.int32)
    order, near_s, far_s, entry_s = _lane_volume_tables(vol, origin, direction, n_volumes)
    heterogeneous = vol.density_grids.shape[0] > 0
    if heterogeneous:
        g = vol.density_grids.shape[0]
        blocks_flat = vol.max_density_blocks.reshape(g, -1)

    def vol_at(slot_arr, table):
        vi = jnp.take_along_axis(order, slot_arr[:, None], axis=1)[:, 0]
        return vi, table

    init = dict(
        state=state,
        slot=jnp.zeros(n, jnp.int32),
        t=jnp.zeros(n, jnp.float32),        # param past near0 of current volume
        fresh=jnp.ones(n, bool),             # entering a new slot this step
        result=jnp.full(n, -1.0, jnp.float32),
        result_vol=jnp.full(n, -1, jnp.int32),
        live=active & jnp.isfinite(entry_s[:, 0]),
        i=jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < MAX_DELTA_STEPS, jnp.any(c["live"]))

    def body(c):
        state = c["state"]
        slot = jnp.minimum(c["slot"], n_volumes - 1)
        vi = jnp.take_along_axis(order, slot[:, None], axis=1)[:, 0]
        near = jnp.take_along_axis(near_s, slot[:, None], axis=1)[:, 0]
        far = jnp.take_along_axis(far_s, slot[:, None], axis=1)[:, 0]
        near0 = jnp.maximum(near, 0.0)
        cmin = vol.corner_min[vi]  # (N, 3)
        cmax = vol.corner_max[vi]
        gi = vol.density_grid_index[vi]
        dens0 = vol.density[vi]

        # ---- homogeneous volumes: one analytic event, then advance -------
        state, d_hom = sampling.sample_scatter_distance(state, jnp.maximum(dens0, 1e-20))
        hom = gi < 0
        hom_hit = c["fresh"] & hom & (d_hom < (far - near0))
        hom_t = near0 + d_hom

        # ---- heterogeneous: one block-restarted delta-tracking step ------
        t = c["t"]
        pos = origin + direction * (near0 + t)[:, None]
        if heterogeneous:
            ext = cmax - cmin
            block_size = ext / BLOCK_DIM
            eps = 1e-4 * jnp.max(ext, axis=-1)
            pos_e = origin + direction * (near0 + t + eps)[:, None]
            rel = (pos_e - cmin) / jnp.maximum(ext, 1e-20)
            idx = jnp.clip((rel * BLOCK_DIM).astype(jnp.int32), 0, BLOCK_DIM - 1)
            lin = idx[..., 0] + idx[..., 1] * BLOCK_DIM + idx[..., 2] * BLOCK_DIM * BLOCK_DIM
            bmin = cmin + block_size * idx.astype(jnp.float32)
            b_near, b_far = intersect_aabb(pos_e, direction, bmin, bmin + block_size)
            max_density = _effective_density(
                vol, vi, blocks_flat[jnp.maximum(gi, 0), lin] * dens0, ray_depth
            )
            state, sampled = sampling.sample_scatter_distance(
                state, jnp.maximum(max_density, 1e-20)
            )
            bad_block = b_far <= 0.0
            to_exit = b_far - jnp.maximum(b_near, 0.0)
            advance_block = (~bad_block) & (sampled > to_exit)
            t_new = jnp.where(
                bad_block, t + eps, jnp.where(advance_block, t + to_exit + eps, t + sampled)
            )
            exited = (near0 + t_new) > far
            # Stop marching past an already-found nearer scatter (the
            # reference's maxDistance argument)
            bounded = (c["result"] >= 0.0) & ((near0 + t_new) > c["result"])
            test_lanes = c["live"] & ~hom & ~bad_block & ~advance_block & ~exited & ~bounded
            spos = origin + direction * (near0 + t_new)[:, None]
            state, dens = density_at_point(state, vol, vi, spos, ray_depth)
            state, u = rng.next_float(state)
            real_hit = test_lanes & (dens / jnp.maximum(max_density, 1e-20) >= u)
            het_done = (~hom) & (exited | bounded | real_hit)
        else:
            t_new = t
            real_hit = jnp.zeros(n, bool)
            het_done = ~hom  # no grids: nothing to march
            state, _ = rng.next_float(state)

        hit_now = hom_hit | real_hit
        hit_t = jnp.where(hom, hom_t, near0 + t_new)
        better = c["live"] & hit_now & ((hit_t < c["result"]) | (c["result"] < 0.0))
        result = jnp.where(better, hit_t, c["result"])
        result_vol = jnp.where(better, vi, c["result_vol"])

        # Advance to the next slot when this volume is finished
        finished = c["live"] & (hom | het_done)
        slot2 = c["slot"] + jnp.where(finished, 1, 0)
        t2 = jnp.where(finished, 0.0, jnp.where(c["live"] & ~hom, t_new, t))
        fresh2 = finished
        # A lane dies when it runs out of volumes or the next entry lies
        # beyond the best scatter already found
        next_entry = jnp.take_along_axis(
            entry_s, jnp.minimum(slot2, n_volumes - 1)[:, None], axis=1
        )[:, 0]
        dead = (slot2 >= n_volumes) | ~jnp.isfinite(next_entry) | (
            (result >= 0.0) & (next_entry > result) & finished
        )
        live = c["live"] & ~dead
        return dict(
            state=state, slot=jnp.where(c["live"], slot2, c["slot"]),
            t=jnp.where(c["live"], t2, c["t"]), fresh=fresh2,
            result=result, result_vol=result_vol, live=live, i=c["i"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["state"], out["result"], out["result_vol"]


def volumes_transmittance(state, vol, n_volumes: int, origin, direction, ray_depth, active):
    """CalculateVolumesTransmittance over all volumes (Volume.slang:419-446).

    Returns (state, transmittance (N,)) — scalar per ray like the reference
    (it multiplies into RGB at the call sites).
    """
    n = origin.shape[0]
    trans = jnp.ones(n, jnp.float32)
    for vi in range(n_volumes):
        near, far = intersect_aabb(origin, direction, vol.corner_min[vi], vol.corner_max[vi])
        near0 = jnp.maximum(near, 0.0)
        gi = vol.density_grid_index[vi]

        # Homogeneous: analytic Beer
        length = far - near0
        hom = jnp.where(
            (far >= 0.0) & (length > 0.0), jnp.exp(-vol.density[vi] * length), 1.0
        )

        if vol.density_grids.shape[0] == 0:
            trans = trans * jnp.where(active, hom, 1.0)
            continue

        # Heterogeneous: ratio tracking + RR (Volume.slang:449-517)
        cmin = vol.corner_min[vi]
        cmax = vol.corner_max[vi]
        block_size = (cmax - cmin) / BLOCK_DIM
        eps = 1e-4 * jnp.max(cmax - cmin)
        blocks = vol.max_density_blocks[jnp.maximum(gi, 0)].reshape(-1)

        live0 = active & (gi >= 0) & (far >= 0.0)
        init = dict(
            state=state,
            t=jnp.zeros(n, jnp.float32),
            tr=jnp.ones(n, jnp.float32),
            live=live0,
            i=jnp.int32(0),
        )

        def cond(c):
            return jnp.logical_and(c["i"] < MAX_TRANSMITTANCE_STEPS, jnp.any(c["live"]))

        def body(c, vi=vi, cmin=cmin, cmax=cmax, block_size=block_size, eps=eps,
                 blocks=blocks, near0=near0, far=far):
            state = c["state"]
            t = c["t"]
            pos = origin + direction * (near0 + t + eps)[:, None]
            rel = (pos - cmin) / jnp.maximum(cmax - cmin, 1e-20)
            idx = jnp.clip((rel * BLOCK_DIM).astype(jnp.int32), 0, BLOCK_DIM - 1)
            lin = idx[..., 0] + idx[..., 1] * BLOCK_DIM + idx[..., 2] * BLOCK_DIM * BLOCK_DIM
            bmin = cmin + block_size * idx.astype(jnp.float32)
            b_near, b_far = intersect_aabb(pos, direction, bmin, bmin + block_size)
            max_density = _effective_density(vol, vi, blocks[lin] * vol.density[vi], ray_depth)
            state, sampled = sampling.sample_scatter_distance(state, jnp.maximum(max_density, 1e-20))

            bad_block = b_far <= 0.0
            to_exit = b_far - jnp.maximum(b_near, 0.0)
            advance_block = (~bad_block) & (sampled > to_exit)
            t_new = jnp.where(
                bad_block, t + eps, jnp.where(advance_block, t + to_exit + eps, t + sampled)
            )
            exited = (near0 + t_new) > far

            test_lanes = c["live"] & ~bad_block & ~advance_block & ~exited
            ipos = origin + direction * (near0 + t_new)[:, None]
            state, dens = density_at_point(state, vol, vi, ipos, ray_depth)
            ratio = 1.0 - dens / jnp.maximum(max_density, 1e-20)
            tr = jnp.where(test_lanes, c["tr"] * ratio, c["tr"])
            # Russian roulette with p = tr (Volume.slang:506-513): absorbed
            # lanes drop to 0, surviving tested lanes carry tr/p = 1.
            state, u = rng.next_float(state)
            absorbed = test_lanes & (u > tr)
            tr = jnp.where(absorbed, 0.0, jnp.where(test_lanes, 1.0, tr))
            live = c["live"] & ~exited & ~absorbed
            return dict(state=state, t=jnp.where(c["live"], t_new, t), tr=tr, live=live, i=c["i"] + 1)

        out = jax.lax.while_loop(cond, body, init)
        state = out["state"]
        het = jnp.where(live0, out["tr"], 1.0)
        trans = trans * jnp.where(gi >= 0, het, jnp.where(active, hom, 1.0))
        if n_volumes:
            trans = jnp.clip(trans, 0.0, 1.0)
    return state, jnp.clip(trans, 0.0, 1.0)


def volumes_transmittance_merged(state, vol, n_volumes: int, origin, direction,
                                 ray_depth, active):
    """Merged ratio-tracking transmittance across ALL volumes per ray
    (CalculateVolumesTransmittance, Volume.slang:419-517) with ONE shared
    while_loop: each lane marches its entry-sorted volume sequence,
    multiplying per-volume transmittance — homogeneous volumes resolve
    analytically in a single step.  Returns (state, transmittance (N,))."""
    n = origin.shape[0]
    if n_volumes == 0:
        return state, jnp.ones(n, jnp.float32)
    order, near_s, far_s, entry_s = _lane_volume_tables(vol, origin, direction, n_volumes)
    heterogeneous = vol.density_grids.shape[0] > 0
    if heterogeneous:
        g = vol.density_grids.shape[0]
        blocks_flat = vol.max_density_blocks.reshape(g, -1)

    init = dict(
        state=state,
        slot=jnp.zeros(n, jnp.int32),
        t=jnp.zeros(n, jnp.float32),
        tr=jnp.ones(n, jnp.float32),
        live=active & jnp.isfinite(entry_s[:, 0]),
        i=jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < MAX_TRANSMITTANCE_STEPS, jnp.any(c["live"]))

    def body(c):
        state = c["state"]
        slot = jnp.minimum(c["slot"], n_volumes - 1)
        vi = jnp.take_along_axis(order, slot[:, None], axis=1)[:, 0]
        near = jnp.take_along_axis(near_s, slot[:, None], axis=1)[:, 0]
        far = jnp.take_along_axis(far_s, slot[:, None], axis=1)[:, 0]
        near0 = jnp.maximum(near, 0.0)
        cmin = vol.corner_min[vi]
        cmax = vol.corner_max[vi]
        gi = vol.density_grid_index[vi]
        dens0 = vol.density[vi]
        hom = gi < 0
        hom_tr = jnp.exp(-dens0 * jnp.maximum(far - near0, 0.0))

        t = c["t"]
        absorbed = jnp.zeros(n, bool)
        if heterogeneous:
            ext = cmax - cmin
            block_size = ext / BLOCK_DIM
            eps = 1e-4 * jnp.max(ext, axis=-1)
            pos_e = origin + direction * (near0 + t + eps)[:, None]
            rel = (pos_e - cmin) / jnp.maximum(ext, 1e-20)
            idx = jnp.clip((rel * BLOCK_DIM).astype(jnp.int32), 0, BLOCK_DIM - 1)
            lin = idx[..., 0] + idx[..., 1] * BLOCK_DIM + idx[..., 2] * BLOCK_DIM * BLOCK_DIM
            bmin = cmin + block_size * idx.astype(jnp.float32)
            b_near, b_far = intersect_aabb(pos_e, direction, bmin, bmin + block_size)
            max_density = _effective_density(
                vol, vi, blocks_flat[jnp.maximum(gi, 0), lin] * dens0, ray_depth
            )
            state, sampled = sampling.sample_scatter_distance(
                state, jnp.maximum(max_density, 1e-20)
            )
            bad_block = b_far <= 0.0
            to_exit = b_far - jnp.maximum(b_near, 0.0)
            advance_block = (~bad_block) & (sampled > to_exit)
            t_new = jnp.where(
                bad_block, t + eps, jnp.where(advance_block, t + to_exit + eps, t + sampled)
            )
            exited = (near0 + t_new) > far
            test_lanes = c["live"] & ~hom & ~bad_block & ~advance_block & ~exited
            ipos = origin + direction * (near0 + t_new)[:, None]
            state, dens = density_at_point(state, vol, vi, ipos, ray_depth)
            ratio = 1.0 - dens / jnp.maximum(max_density, 1e-20)
            tr = jnp.where(test_lanes, c["tr"] * ratio, c["tr"])
            # Russian roulette with p = tr (Volume.slang:506-513)
            state, u = rng.next_float(state)
            absorbed = test_lanes & (u > tr)
            tr = jnp.where(absorbed, 0.0, jnp.where(test_lanes, 1.0, tr))
            het_done = (~hom) & exited
        else:
            t_new = t
            tr = c["tr"]
            het_done = ~hom
            state, _ = rng.next_float(state)

        tr = jnp.where(c["live"] & hom, tr * hom_tr, tr)
        finished = c["live"] & (hom | het_done)
        slot2 = c["slot"] + jnp.where(finished, 1, 0)
        t2 = jnp.where(finished, 0.0, jnp.where(c["live"] & ~hom, t_new, t))
        next_entry = jnp.take_along_axis(
            entry_s, jnp.minimum(slot2, n_volumes - 1)[:, None], axis=1
        )[:, 0]
        dead = absorbed | (slot2 >= n_volumes) | (finished & ~jnp.isfinite(next_entry))
        live = c["live"] & ~dead
        return dict(
            state=state, slot=jnp.where(c["live"], slot2, c["slot"]),
            t=jnp.where(c["live"], t2, c["t"]),
            tr=jnp.where(c["live"], jnp.clip(tr, 0.0, 1.0), c["tr"]),
            live=live, i=c["i"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["state"], jnp.clip(out["tr"], 0.0, 1.0)


def temperature_emission(state, vol, vi, x):
    """GetEmissionFromTemperatureAtPoint (Volume.slang:230-253)."""
    if vol.temperature_grids.shape[0] == 0:
        return state, jnp.zeros(x.shape[:-1] + (3,), jnp.float32)
    gi = vol.density_grid_index[vi]
    state, tnorm = _grid_sample(
        state, vol.temperature_grids, jnp.maximum(gi, 0), vol.max_density[vi] * 0 + 1.0,
        vol.grid_sharpness[vi], vol.corner_min[vi], vol.corner_max[vi], x,
    )
    kelvin = tnorm * (vol.kelvin_max[vi] - vol.kelvin_min[vi]) + vol.kelvin_min[vi]
    bb = blackbody_rgb(kelvin)
    use_bb = (vol.use_blackbody[vi] != 0)[..., None]
    color = jnp.where(use_bb, bb, vol.temperature_color[vi])
    intensity = jnp.power(tnorm, vol.temperature_gamma[vi]) * vol.temperature_scale[vi]
    out = intensity[..., None] * jnp.power(
        jnp.maximum(color, 0.0), vol.emissive_color_gamma[vi][..., None]
    )
    has = (vol.has_temperature[vi] != 0)[..., None]
    return state, jnp.where(has, out, 0.0)


def phase_sample(state, vol, vi, incident, ray_depth, phase_function: str):
    """GetScatteringDirection (Volume.slang:358-375)."""
    if phase_function == "hg":
        g = _effective_anisotropy(vol, vi, ray_depth)
        return sampling.sample_henyey_greenstein(state, incident, g)
    if phase_function == "draine":
        g = _effective_anisotropy(vol, vi, ray_depth)
        return sampling.sample_draine(state, incident, g, vol.alpha[vi])
    return sampling.sample_hg_plus_draine(state, incident, vol.droplet_size[vi], ray_depth)


def phase_eval(vol, vi, v, l, ray_depth, phase_function: str):
    """EvaluatePhaseFunction (Volume.slang:377-407)."""
    if phase_function == "hg":
        g = _effective_anisotropy(vol, vi, ray_depth)
        return sampling.phase_henyey_greenstein(v, l, g)
    if phase_function == "draine":
        g = _effective_anisotropy(vol, vi, ray_depth)
        return sampling.phase_draine(v, l, g, vol.alpha[vi])
    d = vol.droplet_size[vi]
    g_hg, g_d, alpha_d, w_d = sampling.hg_plus_draine_params(d)
    hg = sampling.phase_henyey_greenstein(v, l, g_hg)
    dr = sampling.phase_draine(v, l, g_d, alpha_d)
    return hg + (dr - hg) * w_d  # lerp(HG, D, W_D) (Volume.slang:396-407)
