"""The wavefront path integrator.

TPU-native re-design of the reference's RT megakernel (RayGen.slang:9-160 +
ClosestHit.slang + Miss.slang): instead of one GPU thread per pixel running a
divergent loop, the whole pixel wavefront advances one path event per
`while_loop` iteration with masked lanes.  Each iteration:

  1. traces the wavefront against the BVH (replaces TraceRay),
  2. shades misses with env radiance × MIS weight (Miss.slang),
  3. walks nested-dielectric interiors (ClosestHit.slang:80-116),
  4. runs NEE for sky + emissive meshes with a *batched* 2N shadow-ray
     traversal (ClosestHit.slang:125-184),
  5. samples the BSDF, applies MIS weights for emissive hits, firefly
     clamping and Russian roulette (RayGen.slang:92-113).

Everything is under one jit; no data-dependent Python control flow.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

from vpt_tpu.envguard import guard_ablations

guard_ablations()
# Experiment knob: nearest-cluster ray regrouping before each trace.
_SORT_RAYS = os.environ.get("VPT_SORT_RAYS", "1") == "1"

from vpt_tpu.core import rng
from vpt_tpu.core.camera import generate_primary_rays
from vpt_tpu.core.vecmath import dot, luminance, normalize, power_heuristic
from vpt_tpu.render import bsdf as bsdf_mod
from vpt_tpu.render import lights, sampling
from vpt_tpu.render import surface as surface_mod
from vpt_tpu.accel import traverse
from vpt_tpu.render.params import RenderFlags, RenderParams


_TRACE_MODE = os.environ.get("VPT_TRACE", "stream")  # stream | packet


def trace(scene, meta, origin, direction, active, t_min=traverse.T_MIN,
          t_max=traverse.T_MAX, any_hit: bool = False, sort_rays: bool = True,
          anyhit_mask=None):
    """Dispatch to fused brute-force (small scenes) or a wavefront
    intersector (cluster-major stream kernel by default; the packet-major
    visit kernel behind VPT_TRACE=packet) for large ones.

    `t_max` may be per-ray; with `any_hit` (whole-call) or `anyhit_mask`
    (per-ray) a ray may stop at its first hit (shadow queries report
    blocked iff t >= 0).  Closest-hit results are a valid superset of
    any-hit results, so fallback paths may ignore the flags."""
    if meta.use_brute_force:
        n_real = meta.n_tris  # exclude padding
        hit = traverse.intersect_brute(
            origin, direction, scene.tri_p0[:n_real], scene.tri_e1[:n_real], scene.tri_e2[:n_real],
            t_min, t_max,
        )
        return traverse.Hit(
            t=jnp.where(active, hit.t, -1.0),
            tri=jnp.where(active, hit.tri, -1),
            u=hit.u,
            v=hit.v,
        )
    n = origin.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    use_pallas = jax.default_backend() not in ("cpu",)
    if use_pallas and _TRACE_MODE == "stream":
        if anyhit_mask is None and any_hit:
            anyhit_mask = jnp.ones(n, bool)
        from vpt_tpu.accel.stream import intersect_stream

        return intersect_stream(
            origin, direction, scene.clusters, t_min, tmax_arr,
            active=active, anyhit=anyhit_mask,
        )
    from vpt_tpu.accel.cluster import intersect_clusters

    # With sort_rays the intersector regroups the wavefront by each ray's
    # nearest entered cluster ids (see intersect_clusters): rays that need
    # triangle tests against the same cluster share packets regardless of
    # origin/direction coherence, which a morton/octant key cannot give for
    # diffuse bounces.
    return intersect_clusters(
        origin, direction, scene.clusters, t_min, tmax_arr,
        active=active, any_hit=any_hit and anyhit_mask is None,
        sort_rays=sort_rays,
    )


def occlude(scene, meta, origin, direction, active, t_min=traverse.T_MIN,
            t_max=traverse.T_MAX, exclude_tri=None):
    """Shadow query: blocked iff any triangle with virtual id !=
    exclude_tri intersects in (t_min, t_max).

    Sky-NEE passes exclude_tri=-1 (any hit blocks — RTCommon.slang:47-84 /
    MissShadow.slang:4-9); light-NEE passes the sampled triangle id with
    t_max just short of the sample, equivalent to the reference's
    closest==target compare (ClosestHit.slang:169-176) except for
    occluders at exactly the target's distance.

    On TPU this runs the dedicated any-hit occlusion kernel
    (accel/occlude.py) — no best-t refinement, early exit when blocked.
    CPU/brute-force fallbacks use a closest-hit trace and compare ids
    (identical semantics)."""
    n = origin.shape[0]
    if exclude_tri is None:
        exclude_tri = jnp.full(n, -1, jnp.int32)
    use_pallas = jax.default_backend() not in ("cpu",)
    if (not meta.use_brute_force) and use_pallas and _TRACE_MODE == "stream":
        from vpt_tpu.accel.occlude import occlude_stream

        tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
        return occlude_stream(
            origin, direction, scene.clusters, t_min, tmax_arr,
            active=active, exclude_tri=exclude_tri,
        )
    hit = trace(scene, meta, origin, direction, active, t_min=t_min,
                t_max=t_max, sort_rays=_SORT_RAYS)
    return (hit.t >= 0.0) & (hit.tri != exclude_tri)


def path_trace_sample(
    scene,
    meta,
    flags: RenderFlags,
    params: RenderParams,
    pixel_xy: jnp.ndarray,  # (N, 2) float
    pixel_index: jnp.ndarray,  # (N,) linear index for RNG seeding
    resolution,  # (width, height) static
    sample_seed: jnp.ndarray,  # scalar uint32 frame seed
    n_samples: int = 1,
    sample_offset=0,  # first sample index (spp-sharded renders offset this)
):
    """Trace `n_samples` paths per pixel with wavefront regeneration: the
    moment a lane's path terminates, it starts that pixel's next sample
    instead of idling until the whole wavefront drains (the classic
    path-regeneration trick — keeps SIMD lanes near 100% occupied, which a
    GPU gets from its hardware scheduler and a TPU must do in software).

    Returns ((N, 3) summed radiance over samples, segment count)."""
    n = pixel_xy.shape[0]
    sample_offset = jnp.asarray(sample_offset, jnp.uint32)
    # Geometric epsilons are PER-RAY proportional: offsets scale with the
    # local position / light distance plus a small scene-size floor, so
    # renders are invariant under uniform scaling (SceneMeta.scene_scale)
    # without over-shooting small features in large scenes (a fixed
    # diag-relative epsilon would tunnel through a thin drape 30 m from the
    # origin).  Constants normalized to reproduce the round-1 absolute
    # values at Cornell scale.
    eps_scale = float(getattr(meta, "scene_scale", 1.0))
    s_floor = 0.0346 * eps_scale  # = 1% of the world AABB diagonal
    t_min_s = traverse.T_MIN * eps_scale

    # Primary rays are deterministic per (pixel, sample index), so generate
    # every sample's rays ONCE up front; regeneration inside the loop then
    # just selects the next sample's precomputed ray instead of re-running
    # the camera math every iteration (~70 ms/dispatch of scalar-broadcast
    # fusions at 512x512).  Gated on sample count to bound the (S, N, 3)
    # buffers.
    precompute = n_samples <= 8
    pre = []
    for s in range(n_samples if precompute else 1):
        rs = rng.seed(pixel_index, jnp.uint32(s) + sample_offset, sample_seed)
        rs, o_s, d_s = generate_primary_rays(
            params.view_inverse, params.proj_inverse, pixel_xy, resolution, rs,
            params.focus_distance, params.dof_strength,
        )
        pre.append((rs, o_s, d_s))
    state, origin, direction = pre[0]

    carry = dict(
        state=state,
        origin=origin,
        direction=direction,
        throughput=jnp.ones((n, 3), jnp.float32),
        radiance=jnp.zeros((n, 3), jnp.float32),  # current path accumulator
        lane_acc=jnp.zeros((n, 3), jnp.float32),  # folded finished paths
        sample_idx=jnp.zeros(n, jnp.int32),
        prev_pdf=jnp.ones(n, jnp.float32),
        depth=jnp.zeros(n, jnp.int32),
        alive=jnp.ones(n, bool),
        in_medium=jnp.zeros(n, bool),
        med_color=jnp.ones((n, 3), jnp.float32),
        med_density=jnp.zeros(n, jnp.float32),
        med_aniso=jnp.zeros(n, jnp.float32),
        channel=jnp.full(n, -1, jnp.int32),  # spectral split (RTCommon.slang:26-29)
        vol_depth=jnp.zeros(n, jnp.int32),  # volume scatter count
        segments=jnp.zeros((), jnp.float32),  # traced rays (main + shadow)
        iter=jnp.int32(0),
    )

    max_iters = n_samples * (flags.max_depth + flags.max_medium_events)

    def _fold_mask(path_rad, ch):
        """Channel mask + NaN/Inf rejection for a finished path
        (RayGen.slang:116-128)."""
        if flags.enable_atmosphere:
            chan_mask = jnp.where(
                (ch < 0)[:, None],
                jnp.ones((n, 3), jnp.float32),
                (jnp.arange(3)[None, :] == ch[:, None]).astype(jnp.float32),
            )
            path_rad = path_rad * chan_mask
        finite = jnp.all(jnp.isfinite(path_rad), axis=-1)
        return jnp.where(finite[:, None], path_rad, 0.0)

    def cond(c):
        return jnp.logical_and(c["iter"] < max_iters, jnp.any(c["alive"]))

    def body(c):
        state = c["state"]
        origin = c["origin"]
        direction = c["direction"]
        alive = c["alive"]
        depth = c["depth"]

        if flags.enable_atmosphere:
            # Below the planet surface -> terminate (RayGen.slang:76-84)
            from vpt_tpu.render import atmosphere as atmo

            below = atmo.atmosphere_height(params, origin) < 0.0
            alive = alive & ~below

        hit = trace(scene, meta, origin, direction, alive, t_min=t_min_s,
                    sort_rays=_SORT_RAYS)
        hit_found = hit.t >= 0.0

        # ------------------------------------------------------------------
        # Volume / atmosphere scattering (ScatteredInVolume, RayGen.slang:162-263)
        use_volumes = meta.n_volumes > 0
        any_media = use_volumes or flags.enable_atmosphere
        channel = c["channel"]
        vol_depth = c["vol_depth"]
        scatter_t = jnp.full(n, -1.0, jnp.float32)
        scatter_vol = jnp.full(n, -1, jnp.int32)
        atmo_comp = jnp.full(n, -1, jnp.int32)
        if use_volumes:
            from vpt_tpu.render import volumes as vol_mod

            if meta.n_volumes > 1:
                # Entry-sorted single march over all volumes: the
                # while_loop budget is shared (RayGen.slang:164-190
                # semantics) instead of one full delta-tracking loop per
                # volume per bounce.
                state, scatter_t, scatter_vol = vol_mod.scatter_distance_merged(
                    state, scene.volumes, meta.n_volumes, origin, direction,
                    vol_depth, alive,
                )
            else:
                state, t_vi = vol_mod.scatter_distance_in_volume(
                    state, scene.volumes, 0, origin, direction, vol_depth, alive
                )
                closer = t_vi >= 0.0
                scatter_vol = jnp.where(closer, 0, scatter_vol)
                scatter_t = jnp.where(closer, t_vi, scatter_t)
        if flags.enable_atmosphere:
            # Channel pick for unsplit rays (RayGen.slang:214-224).  The
            # reference draws it uniformly; we STRATIFY over (pixel, sample)
            # — each pixel cycles through all three channels every three
            # samples, which cuts the spectral-split chroma noise ~sqrt(3)x
            # with the same 1/3 marginal frequency (equal in expectation).
            cand = (
                (pixel_index.astype(jnp.uint32)
                 + c["sample_idx"].astype(jnp.uint32)
                 + sample_seed) % jnp.uint32(3)
            ).astype(jnp.int32)
            channel_eff = jnp.where(channel < 0, cand, channel)
            state, at_t, at_comp = atmo.sample_scatter_distance(
                state, params, origin, direction, channel_eff, alive
            )
            closer = (at_t >= 0.0) & ((at_t < scatter_t) | (scatter_t < 0.0))
            scatter_vol = jnp.where(closer, -2, scatter_vol)
            scatter_t = jnp.where(closer, at_t, scatter_t)
            atmo_comp = jnp.where(closer, at_comp, -1)
        if any_media:
            dist_geo = jnp.where(hit_found, hit.t, -1.0)
            vol_scatter = (
                alive
                & (scatter_t >= 0.0)
                & ((dist_geo < 0.0) | (scatter_t < dist_geo))
            )
            atmo_scatter = vol_scatter & (scatter_vol == -2)
            media_scatter = vol_scatter & (scatter_vol >= 0)
            vol_pos = origin + direction * jnp.maximum(scatter_t, 0.0)[:, None]
            missed = alive & ~hit_found & ~vol_scatter
            surf_lanes = alive & hit_found & ~vol_scatter
        else:
            vol_scatter = jnp.zeros(n, bool)
            atmo_scatter = vol_scatter
            media_scatter = vol_scatter
            vol_pos = origin
            missed = alive & ~hit_found
            surf_lanes = alive & hit_found

        emitted = jnp.zeros((n, 3), jnp.float32)

        # ------------------------------------------------------------------
        # Miss shading (Miss.slang:8-77).  With the atmosphere enabled the
        # miss shader contributes nothing (Miss.slang:11-14).
        if not flags.enable_atmosphere:
            env_rgba = lights.env_radiance(
                scene.env, direction, params.sky_rotation_azimuth, params.sky_rotation_altitude
            )
            env_rgb = env_rgba[:, :3] * params.environment_intensity
            if not flags.show_env_map_directly:
                env_rgb = jnp.where((depth == 0)[:, None], 0.0, env_rgb)
            if flags.furnace_test_mode:
                env_rgb = jnp.ones_like(env_rgb)
            if flags.enable_sky_mis:
                mis_w = jnp.where(depth > 0, power_heuristic(c["prev_pdf"], env_rgba[:, 3]), 1.0)
                env_rgb = env_rgb * mis_w[:, None]
            emitted = jnp.where(missed[:, None], env_rgb, emitted)

        # ------------------------------------------------------------------
        # In-medium walk (ClosestHit.slang:80-116)
        geom_dist = jnp.where(hit_found, hit.t, traverse.T_MAX)
        state, scat_d = sampling.sample_scatter_distance(
            state, jnp.maximum(c["med_density"], 1e-20)
        )
        walk_lanes = surf_lanes & c["in_medium"]
        med_scatter = walk_lanes & (c["med_aniso"] != 1.0) & (scat_d < geom_dist)
        state, med_dir = sampling.sample_henyey_greenstein(state, direction, c["med_aniso"])
        # Beer's-law shortcut when anisotropy == 1 (straight path through the
        # medium); applied multiplicatively at the exit surface.
        beer = jnp.exp(
            -(1.0 - c["med_color"]) * (c["med_density"] * geom_dist)[:, None]
        )
        beer_lanes = walk_lanes & (c["med_aniso"] == 1.0)

        shade = surf_lanes & ~med_scatter

        # ------------------------------------------------------------------
        # Surface + material (Surface.slang / Material.slang)
        safe_hit = traverse.Hit(
            t=hit.t,
            tri=jnp.clip(hit.tri, 0, scene.tri_p0.shape[0] - 1),
            u=hit.u,
            v=hit.v,
        )
        surf = surface_mod.make_surface(
            scene, safe_hit, direction, flags.use_only_geometry_normals,
            has_textures=meta.has_textures,
        )
        props = bsdf_mod.make_material(
            scene, surf.mat_row, surf.uv, surf.hit_from_inside, flags.furnace_test_mode,
            has_textures=meta.has_textures,
        )
        surf = surface_mod.rotate_tangents(surf, props.anisotropy_rotation)
        is_light = jnp.any(props.emissive_color > 0.0, axis=-1)

        v_world = -direction
        v_tan = surface_mod.world_to_tangent(surf, v_world)
        # Energy-compensation terms depend only on (v, material): compute
        # once and share across the sample + two NEE evaluations.
        ec_comp = bsdf_mod.energy_comp_terms(
            props, scene, v_tan[..., 2], flags.use_energy_compensation
        )

        # ------------------------------------------------------------------
        # NEE sampling (sky + emissive mesh), one batched shadow traversal
        if flags.enable_sky_mis:
            if flags.enable_atmosphere:
                state, to_sky, sky_rgb, sky_pdf = lights.sample_sun_disk(
                    state, params.sun_color, params.environment_intensity,
                    params.sky_rotation_azimuth, params.sky_rotation_altitude, (n,),
                )
            else:
                state, to_sky, sky_rgba = lights.importance_sample_env(
                    state, scene.env, params.sky_rotation_azimuth,
                    params.sky_rotation_altitude, (n,),
                )
                sky_rgb = sky_rgba[:, :3] * params.environment_intensity
                sky_pdf = sky_rgba[:, 3]
            # ClosestHit.slang:133 multiplies intensity again on top of the
            # sampler's own multiply — reproduced for parity.
            sky_rgb = sky_rgb * params.environment_intensity
        else:
            to_sky = jnp.zeros((n, 3), jnp.float32)
            sky_rgb = jnp.zeros((n, 3), jnp.float32)
            sky_pdf = jnp.zeros(n, jnp.float32)

        nee_pos = (
            jnp.where(vol_scatter[:, None], vol_pos, surf.world_pos)
            if any_media else surf.world_pos
        )
        use_mesh_nee = flags.enable_mesh_mis and meta.n_emissive > 0
        if use_mesh_nee:
            (state, to_light, light_rgb, light_pdf, light_tri, light_inst, light_dist) = (
                lights.sample_emissive_triangle(
                    state, scene, nee_pos, meta.n_emissive, has_textures=meta.has_textures
                )
            )
        else:
            to_light = jnp.zeros((n, 3), jnp.float32)
            light_rgb = jnp.zeros((n, 3), jnp.float32)
            light_pdf = jnp.zeros(n, jnp.float32)
            light_tri = jnp.full(n, -1, jnp.int32)
            light_inst = jnp.full(n, -1, jnp.int32)
            light_dist = jnp.zeros(n, jnp.float32)

        # Epsilons track the float32 ulp of the ACTUAL geometry coordinates:
        # distance from the scene AABB center plus a scene-size floor (a
        # |p|-relative heuristic breaks for small scenes modeled far from
        # the world origin — ADVICE r2).
        center = jnp.asarray(getattr(meta, "scene_center", (0.0, 0.0, 0.0)),
                             jnp.float32)
        p_mag = jnp.linalg.norm(surf.world_pos - center, axis=-1) + s_floor  # (N,)
        sky_eps = (5.8e-6 * p_mag)[:, None]
        light_eps = (5e-3 * (light_dist + s_floor))[:, None]
        if any_media:
            need_sky = (shade | media_scatter | atmo_scatter) & jnp.bool_(flags.enable_sky_mis)
            need_light = (
                (shade & ~is_light) | media_scatter
            ) & jnp.bool_(use_mesh_nee) & (light_pdf > 0.0)
            sky_org = jnp.where(
                vol_scatter[:, None], vol_pos, surf.world_pos + surf.normal * sky_eps
            )
            light_org = jnp.where(
                vol_scatter[:, None], vol_pos, surf.world_pos + to_light * light_eps
            )
        else:
            need_sky = shade & jnp.bool_(flags.enable_sky_mis)
            need_light = shade & ~is_light & jnp.bool_(use_mesh_nee) & (light_pdf > 0.0)
            sky_org = surf.world_pos + surf.normal * sky_eps
            light_org = surf.world_pos + to_light * light_eps
        # Shadow queries, one batched ANY-HIT occlusion pass: the SKY half
        # blocks on any hit (DoesRayIntersectWithAS, RTCommon.slang:47-84);
        # the LIGHT half excludes the sampled triangle id and runs to the
        # sample's exact parametric distance from the OFFSET origin
        # (light_dist - light_eps; the sampled triangle itself is filtered
        # by id, so no relative shortening is needed) — equivalent to the
        # reference's closest==target compare (ClosestHit.slang:169-176)
        # with no distance-proportional blind zone (ADVICE r4: a 0.999x
        # factor let occluders within 0.1% of the light leak, growing with
        # scene scale).  Only the NEE halves that are statically enabled
        # are traced — a disabled half would be N dead lanes still paying
        # cull+dispatch.
        sky_half = bool(flags.enable_sky_mis)
        light_half = bool(use_mesh_nee)
        parts = []
        if sky_half:
            parts.append((sky_org, to_sky, need_sky,
                          jnp.full(n, traverse.T_MAX, jnp.float32),
                          jnp.full(n, -1, jnp.int32)))
        if light_half:
            parts.append((light_org, to_light, need_light,
                          jnp.maximum(light_dist - light_eps[:, 0], t_min_s),
                          light_tri))
        if parts:
            shadow_org = jnp.concatenate([p[0] for p in parts])
            shadow_dir = jnp.concatenate([p[1] for p in parts])
            shadow_active = jnp.concatenate([p[2] for p in parts])
            shadow_tmax = jnp.concatenate([p[3] for p in parts])
            shadow_extri = jnp.concatenate([p[4] for p in parts])
            shadow_blocked = occlude(
                scene, meta, shadow_org, shadow_dir, shadow_active,
                t_min=t_min_s, t_max=shadow_tmax, exclude_tri=shadow_extri,
            )
        else:
            shadow_active = jnp.zeros(0, bool)
        sky_blocked = shadow_blocked[:n] if sky_half else jnp.zeros(n, bool)
        light_visible = (
            ~shadow_blocked[n if sky_half else 0:]
            if light_half else jnp.zeros(n, bool)
        )
        can_hit_sky = need_sky & ~sky_blocked
        can_hit_light = need_light & light_visible

        # ------------------------------------------------------------------
        # BSDF sampling (ClosestHit.slang:191-238)
        state, h_tan = sampling.sample_ggx_vndf(state, v_tan, props.ax, props.ay)
        state, l_tan, bxdf_s, pdf_s, _comp = bsdf_mod.sample_bsdf(
            state, props, scene, v_tan, h_tan, flags.use_energy_compensation,
            comp=ec_comp,
        )
        was_refracted = l_tan[:, 2] < 0.0
        scatter_world = surface_mod.tangent_to_world(surf, l_tan)
        leak = ~was_refracted & (dot(scatter_world, surf.geom_normal) < 0.0)
        pdf_s = jnp.where(leak, 0.0, pdf_s)
        bxdf_s = jnp.where(leak[:, None], 0.0, bxdf_s)

        # Medium enter/exit on refraction (ClosestHit.slang:227-238)
        entering = shade & was_refracted & ~surf.hit_from_inside
        exiting = shade & was_refracted & surf.hit_from_inside
        in_medium = jnp.where(entering, True, jnp.where(exiting, False, c["in_medium"]))
        med_color = jnp.where(entering[:, None], props.medium_color, c["med_color"])
        med_density = jnp.where(entering, props.medium_density, c["med_density"])
        med_aniso = jnp.where(entering, props.medium_anisotropy, c["med_aniso"])

        # ------------------------------------------------------------------
        # NEE transmittance through volumes/atmosphere (shadow attenuation)
        def nee_transmittance(state, org, dirs, ray_depth, lanes, use_atmo: bool):
            tr = jnp.ones((n, 3), jnp.float32)
            if use_volumes:
                from vpt_tpu.render import volumes as vol_mod

                if meta.n_volumes > 1:
                    state, tv = vol_mod.volumes_transmittance_merged(
                        state, scene.volumes, meta.n_volumes, org, dirs, ray_depth, lanes
                    )
                else:
                    state, tv = vol_mod.volumes_transmittance(
                        state, scene.volumes, meta.n_volumes, org, dirs, ray_depth, lanes
                    )
                tr = tr * tv[:, None]
            if use_atmo and flags.enable_atmosphere:
                # Unsplit rays: per-channel transmittance; split: one channel
                # (ClosestHit.slang:335-350)
                for ch in range(3):
                    ch_arr = jnp.where(channel < 0, ch, channel)
                    run = lanes & ((channel < 0) | (channel == ch))
                    state, ta = atmo.transmittance(state, params, org, dirs, ch_arr, run)
                    tr = tr.at[:, ch].set(jnp.where(run, tr[:, ch] * ta, tr[:, ch]))
            return state, tr

        # ------------------------------------------------------------------
        # NEE evaluation (ClosestHit.slang:240-256, 326-372 + volume events
        # RayGen.slang:265-380)
        if flags.enable_sky_mis:
            sky_tan = surface_mod.world_to_tangent(surf, to_sky)
            sky_bxdf, sky_eval_pdf = bsdf_mod.evaluate_bsdf(
                props, scene, v_tan, sky_tan, flags.use_energy_compensation,
                comp=ec_comp,
            )
            if any_media:
                state, sky_trans = nee_transmittance(
                    state, sky_org, to_sky, jnp.zeros(n, jnp.int32), can_hit_sky, True
                )
            else:
                sky_trans = 1.0
            sky_ok = can_hit_sky & shade & (sky_pdf > 0.0) & (sky_eval_pdf > 0.0)
            sky_contrib = (
                sky_bxdf * sky_trans * sky_rgb / jnp.maximum(sky_pdf, 1e-20)[:, None]
                * power_heuristic(sky_pdf, sky_eval_pdf)[:, None]
            )
            emitted = emitted + jnp.where(sky_ok[:, None], sky_contrib, 0.0)

        if use_mesh_nee:
            light_tan = surface_mod.world_to_tangent(surf, to_light)
            l_bxdf, l_eval_pdf = bsdf_mod.evaluate_bsdf(
                props, scene, v_tan, light_tan, flags.use_energy_compensation,
                comp=ec_comp,
            )
            if any_media:
                state, l_trans = nee_transmittance(
                    state, light_org, to_light, jnp.zeros(n, jnp.int32), can_hit_light, False
                )
            else:
                l_trans = 1.0
            l_ok = can_hit_light & shade & (light_pdf > 0.0) & (l_eval_pdf > 0.0) & ~is_light
            l_contrib = (
                l_bxdf * l_trans * light_rgb / jnp.maximum(light_pdf, 1e-20)[:, None]
                * power_heuristic(light_pdf, l_eval_pdf)[:, None]
            )
            emitted = emitted + jnp.where(l_ok[:, None], l_contrib, 0.0)

        # ------------------------------------------------------------------
        # Volume scattering events (EvaluateVolumeScatteringEvent,
        # RayGen.slang:265-380)
        vol_dir = direction
        vol_bxdf = jnp.zeros((n, 3), jnp.float32)
        vol_pdf = jnp.ones(n, jnp.float32)
        if use_volumes:
            from vpt_tpu.render import volumes as vol_mod

            vt = scene.volumes
            vidx = jnp.clip(scatter_vol, 0, max(meta.n_volumes - 1, 0))
            # Emission (volume color + temperature; RayGen.slang:268)
            state, temp_emit = vol_mod.temperature_emission(state, vt, vidx, vol_pos)
            vol_emit = vt.emissive_color[vidx] + temp_emit
            emitted = emitted + jnp.where(media_scatter[:, None], vol_emit, 0.0)

            # Phase sample for the new direction
            state, sampled_dir = vol_mod.phase_sample(
                state, vt, vidx, direction, vol_depth, flags.phase_function
            )
            phase_new = vol_mod.phase_eval(
                vt, vidx, direction, sampled_dir, vol_depth, flags.phase_function
            )
            vol_dir = jnp.where(media_scatter[:, None], sampled_dir, vol_dir)
            vol_bxdf = jnp.where(
                media_scatter[:, None], vt.color[vidx] * phase_new[:, None], vol_bxdf
            )
            vol_pdf = jnp.where(media_scatter, phase_new, vol_pdf)

            # Sky MIS at the scatter point (RayGen.slang:319-352)
            if flags.enable_sky_mis:
                phase_sky = vol_mod.phase_eval(
                    vt, vidx, direction, to_sky, vol_depth, flags.phase_function
                )
                state, v_sky_tr = nee_transmittance(
                    state, vol_pos, to_sky, vol_depth, can_hit_sky & media_scatter, True
                )
                ok = media_scatter & can_hit_sky & (sky_pdf > 0.0) & (phase_sky > 0.0)
                contrib = (
                    v_sky_tr * (vt.color[vidx] * phase_sky[:, None])
                    * sky_rgb / jnp.maximum(sky_pdf, 1e-20)[:, None]
                    * power_heuristic(sky_pdf, phase_sky)[:, None]
                )
                emitted = emitted + jnp.where(ok[:, None], contrib, 0.0)

            # Mesh MIS at the scatter point (RayGen.slang:355-372)
            if use_mesh_nee:
                phase_l = vol_mod.phase_eval(
                    vt, vidx, direction, to_light, vol_depth, flags.phase_function
                )
                state, v_l_tr = nee_transmittance(
                    state, vol_pos, to_light, vol_depth + 1, can_hit_light & media_scatter, False
                )
                okl = media_scatter & can_hit_light & (light_pdf > 0.0) & (phase_l > 0.0)
                contribl = (
                    v_l_tr * (vt.color[vidx] * phase_l[:, None])
                    * light_rgb / jnp.maximum(light_pdf, 1e-20)[:, None]
                    * power_heuristic(light_pdf, phase_l)[:, None]
                )
                emitted = emitted + jnp.where(okl[:, None], contribl, 0.0)

        # ------------------------------------------------------------------
        # Atmosphere scattering events (EvaluateAtmosphereScatteringEvent,
        # RayGen.slang:382-471)
        if flags.enable_atmosphere:
            channel = jnp.where(atmo_scatter, channel_eff, channel)
            state, dir_ray = sampling.sample_rayleigh(state, direction)
            state, dir_mie = sampling.sample_henyey_greenstein(state, direction, 0.85)
            a_dir = jnp.where(
                (atmo_comp == atmo.COMPONENT_RAYLEIGH)[:, None], dir_ray,
                jnp.where((atmo_comp == atmo.COMPONENT_MIE)[:, None], dir_mie, direction),
            )
            ph_ray = sampling.phase_rayleigh(direction, a_dir)
            ph_mie = sampling.phase_henyey_greenstein(direction, a_dir, 0.85)
            mie_atten = atmo.C_MIE_ABSORPTION / atmo.C_MIE  # (3,)
            if flags.enable_sky_mis:
                # MIS variant (RayGen.slang:425-452): HG BxDF, single-scatter
                # albedo as (1 - absorption/extinction).
                mie_bxdf = ph_mie[:, None] * (1.0 - mie_atten)[None, :]
            else:
                # Non-MIS variant (RayGen.slang:455-465): PhaseMie BxDF over
                # the HG sampling PDF (the quirky *attenuation factor is the
                # reference's own).
                mie_bxdf = (
                    sampling.phase_mie_approx(direction, a_dir)[:, None]
                    * mie_atten[None, :]
                )
            a_bxdf = jnp.where(
                (atmo_comp == atmo.COMPONENT_RAYLEIGH)[:, None],
                ph_ray[:, None] * jnp.ones((1, 3)),
                jnp.where(
                    (atmo_comp == atmo.COMPONENT_MIE)[:, None],
                    mie_bxdf,
                    jnp.zeros((n, 3)),
                ),
            )
            a_pdf = jnp.where(
                atmo_comp == atmo.COMPONENT_RAYLEIGH, ph_ray,
                jnp.where(atmo_comp == atmo.COMPONENT_MIE, ph_mie, 1.0),
            )
            vol_dir = jnp.where(atmo_scatter[:, None], a_dir, vol_dir)
            vol_bxdf = jnp.where(atmo_scatter[:, None], a_bxdf, vol_bxdf)
            vol_pdf = jnp.where(atmo_scatter, a_pdf, vol_pdf)

            if flags.enable_sky_mis:
                # Sun NEE at the scatter point, no MIS weight (RayGen.slang:404-452)
                ph_sky = jnp.where(
                    atmo_comp == atmo.COMPONENT_RAYLEIGH,
                    sampling.phase_rayleigh(direction, to_sky),
                    jnp.where(
                        atmo_comp == atmo.COMPONENT_MIE,
                        sampling.phase_henyey_greenstein(direction, to_sky, 0.85),
                        0.0,
                    ),
                )
                state, a_tr = nee_transmittance(
                    state, vol_pos, to_sky, vol_depth, atmo_scatter & can_hit_sky, True
                )
                oka = atmo_scatter & can_hit_sky & (sky_pdf > 0.0)
                contrib_a = ph_sky[:, None] * a_tr * sky_rgb / jnp.maximum(sky_pdf, 1e-20)[:, None]
                emitted = emitted + jnp.where(oka[:, None], contrib_a, 0.0)

        # ------------------------------------------------------------------
        # Emissive surface hit (direct + MIS; ClosestHit.slang:265-317)
        if flags.enable_mesh_mis:
            direct = shade & (depth == 0) & is_light
            emitted = emitted + jnp.where(direct[:, None], props.emissive_color, 0.0)

            bsdf_hit_light = shade & (depth > 0) & is_light
            dist_sq = dot(surf.world_pos - origin, surf.world_pos - origin)
            cos_t = jnp.abs(dot(surf.normal, normalize(origin - surf.world_pos)))
            # Per-triangle emissive count baked into tri_attr (col 27) — no
            # inst_to_entry / tri_count gather chain.
            tcount = jnp.maximum(surf.em_tcount, 1.0)
            em_total = jnp.float32(max(meta.n_emissive, 1))
            light_sampling_pdf = (
                (1.0 / em_total)
                * (1.0 / tcount)
                * (1.0 / jnp.maximum(surf.area, 1e-20))
                * (dist_sq / jnp.maximum(cos_t, 1e-20))
            )
            light_sampling_pdf = jnp.maximum(light_sampling_pdf, params.emissive_pdf_bias)
            mis_emit = props.emissive_color * power_heuristic(c["prev_pdf"], light_sampling_pdf)[:, None]
            emitted = emitted + jnp.where(bsdf_hit_light[:, None], mis_emit, 0.0)
        else:
            emitted = emitted + jnp.where(shade[:, None], props.emissive_color, 0.0)

        # ------------------------------------------------------------------
        # Contribution + firefly clamp (RayGen.slang:92-102)
        contribution = emitted * c["throughput"]
        # depth becomes 1 after any hit/scatter event at depth 0 -> unclamped
        no_clamp = (depth == 0) & ((surf_lanes | vol_scatter) if any_media else surf_lanes)
        lum = luminance(contribution)
        scale = params.max_luminance / jnp.maximum(lum, params.max_luminance)
        contribution = jnp.where(no_clamp[:, None], contribution, contribution * scale[:, None])
        radiance = c["radiance"] + jnp.where(alive[:, None], contribution, 0.0)

        # ------------------------------------------------------------------
        # Throughput update (RayGen.slang:103) + event bookkeeping
        invalid = shade & (pdf_s <= 0.0)
        factor = jnp.ones((n, 3), jnp.float32)
        factor = jnp.where(
            shade[:, None], bxdf_s / jnp.maximum(pdf_s, 1e-20)[:, None], factor
        )
        factor = jnp.where(beer_lanes[:, None], factor * beer, factor)
        factor = jnp.where(med_scatter[:, None], c["med_color"], factor)
        if any_media:
            factor = jnp.where(
                vol_scatter[:, None], vol_bxdf / jnp.maximum(vol_pdf, 1e-20)[:, None], factor
            )
        throughput = c["throughput"] * jnp.where(alive[:, None], factor, 1.0)

        bounce_eps = (5.8e-4 * p_mag)[:, None]
        new_origin = jnp.where(
            shade[:, None],
            surf.world_pos
            + surf.normal * jnp.where(was_refracted[:, None], -bounce_eps, bounce_eps),
            origin,
        )
        new_origin = jnp.where(
            med_scatter[:, None], origin + direction * scat_d[:, None], new_origin
        )
        new_direction = jnp.where(shade[:, None], scatter_world, direction)
        new_direction = jnp.where(med_scatter[:, None], med_dir, new_direction)
        if any_media:
            new_origin = jnp.where(vol_scatter[:, None], vol_pos, new_origin)
            new_direction = jnp.where(vol_scatter[:, None], vol_dir, new_direction)
            prev_pdf = jnp.where(
                shade, pdf_s,
                jnp.where(med_scatter | vol_scatter, jnp.where(vol_scatter, vol_pdf, 1.0), c["prev_pdf"]),
            )
            depth = depth + jnp.where(shade | vol_scatter, 1, 0)
            vol_depth = vol_depth + jnp.where(media_scatter, 1, 0)
        else:
            prev_pdf = jnp.where(shade, pdf_s, jnp.where(med_scatter, 1.0, c["prev_pdf"]))
            # Medium events don't age the path; surface hits do.
            depth = depth + jnp.where(shade, 1, 0)
        alive = alive & ~missed & ~invalid & (depth < flags.max_depth)

        # ------------------------------------------------------------------
        # Russian roulette (RayGen.slang:105-113)
        p = jnp.minimum(jnp.max(throughput, axis=-1), 1.0)
        state, u_rr = rng.next_float(state)
        rr_kill = alive & (p < u_rr)
        alive = alive & ~rr_kill
        throughput = jnp.where(
            alive[:, None], throughput / jnp.maximum(p, 1e-20)[:, None], throughput
        )

        segments = (
            c["segments"]
            + jnp.sum(c["alive"].astype(jnp.float32))
            + jnp.sum(shadow_active.astype(jnp.float32))
        )

        # ------------------------------------------------------------------
        # Path regeneration: fold finished paths into the lane accumulator
        # and immediately start the pixel's next sample in the freed lane.
        path_end = c["alive"] & ~alive
        lane_acc = c["lane_acc"] + jnp.where(
            path_end[:, None], _fold_mask(radiance, channel), 0.0
        )
        sample_idx = c["sample_idx"]
        regen = path_end & (sample_idx + 1 < n_samples)
        new_sample = jnp.where(regen, sample_idx + 1, sample_idx)
        if precompute:
            rs, o_new, d_new = pre[min(1, n_samples - 1)]
            for s in range(2, n_samples):
                pick = new_sample == s
                rs = jnp.where(pick, pre[s][0], rs)
                o_new = jnp.where(pick[:, None], pre[s][1], o_new)
                d_new = jnp.where(pick[:, None], pre[s][2], d_new)
        else:
            rs = rng.seed(
                pixel_index, new_sample.astype(jnp.uint32) + sample_offset, sample_seed
            )
            rs, o_new, d_new = generate_primary_rays(
                params.view_inverse, params.proj_inverse, pixel_xy, resolution, rs,
                params.focus_distance, params.dof_strength,
            )
        r2 = regen[:, None]
        new_origin = jnp.where(r2, o_new, new_origin)
        new_direction = jnp.where(r2, d_new, new_direction)
        state = jnp.where(regen, rs, state)
        alive = alive | regen
        radiance = jnp.where(path_end[:, None], 0.0, radiance)
        throughput = jnp.where(r2, 1.0, throughput)
        prev_pdf = jnp.where(regen, 1.0, prev_pdf)
        depth = jnp.where(regen, 0, depth)
        in_medium = in_medium & ~regen
        med_color = jnp.where(r2, 1.0, med_color)
        med_density = jnp.where(regen, 0.0, med_density)
        med_aniso = jnp.where(regen, 0.0, med_aniso)
        channel = jnp.where(regen, -1, channel)
        vol_depth = jnp.where(regen, 0, vol_depth)

        return dict(
            state=state,
            origin=new_origin,
            direction=normalize(new_direction),
            throughput=throughput,
            radiance=radiance,
            lane_acc=lane_acc,
            sample_idx=new_sample,
            prev_pdf=prev_pdf,
            depth=depth,
            alive=alive,
            in_medium=in_medium,
            med_color=med_color,
            med_density=med_density,
            med_aniso=med_aniso,
            channel=channel,
            vol_depth=vol_depth,
            segments=segments,
            iter=c["iter"] + 1,
        )

    out = jax.lax.while_loop(cond, body, carry)
    # Paths truncated by the iteration cap fold here with what they have.
    lane_acc = out["lane_acc"] + jnp.where(
        out["alive"][:, None], _fold_mask(out["radiance"], out["channel"]), 0.0
    )
    return lane_acc, out["segments"]


def render_samples(
    scene, meta, flags: RenderFlags, params: RenderParams,
    pixel_xy, pixel_index, resolution, frame_seed, n_samples: int,
    sample_offset=0,
):
    """Average `n_samples` paths per pixel (RayGen.slang:33-130), using
    wavefront path regeneration to keep lanes occupied."""
    acc, segs = path_trace_sample(
        scene, meta, flags, params, pixel_xy, pixel_index, resolution,
        jnp.uint32(frame_seed), n_samples=n_samples, sample_offset=sample_offset,
    )
    return acc / n_samples, segs


def accumulate_ewma(prev_color, new_color, frame_count):
    """Progressive accumulation color = lerp(prev, new, 1/(n+1))
    (RayGen.slang:132-141)."""
    a = 1.0 / (jnp.asarray(frame_count, jnp.float32) + 1.0)
    return prev_color + (new_color - prev_color) * a
