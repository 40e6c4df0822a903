"""Path-traced atmosphere: Rayleigh / Mie / ozone with null collisions.

Wavefront port of Atmosphere.slang: Earth coefficient constants, exponential
Rayleigh/Mie density and tent ozone profile (Atmosphere.slang:18-31),
single-channel transmittance via ratio tracking with planet shadowing
(:33-106), and scatter-distance sampling with null collisions + stochastic
component pick (:116-202).  The renderer splits rays spectrally — after the
first atmosphere event only one color channel is tracked
(RayGen.slang:212-234).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vpt_tpu.core import rng
from vpt_tpu.core.vecmath import intersect_sphere

# Sea-level scattering coefficients (1/m), Atmosphere.slang:7-11
C_RAYLEIGH = jnp.array([5.802, 13.558, 33.100], jnp.float32) * 1e-6
C_MIE_SCATTERING = jnp.array([3.996] * 3, jnp.float32) * 1e-6
C_MIE_ABSORPTION = jnp.array([4.40] * 3, jnp.float32) * 1e-6
C_MIE = C_MIE_SCATTERING + C_MIE_ABSORPTION
C_OZONE = jnp.array([0.650, 1.881, 0.085], jnp.float32) * 1e-6

MAX_STEPS = 1000  # Atmosphere.slang:71,149

COMPONENT_NONE = -1
COMPONENT_RAYLEIGH = 0
COMPONENT_MIE = 1
COMPONENT_OZONE = 2


def atmosphere_height(params, position):
    return (
        jnp.linalg.norm(position - params.planet_position, axis=-1) - params.planet_radius
    )


def rayleigh_density(params, height):
    return jnp.exp(-height / params.rayleigh_density_falloff)


def mie_density(params, height):
    return jnp.exp(-height / params.mie_density_falloff)


def ozone_density(params, height):
    return jnp.exp(-(jnp.abs(height - params.ozone_peak) / params.ozone_density_falloff))


def _channel_coeffs(params, channel):
    """Per-ray scattering coefficients for the tracked channel (N,)."""
    cr = C_RAYLEIGH[channel] * params.rayleigh_scattering_multiplier[channel]
    cm = C_MIE[channel] * params.mie_scattering_multiplier[channel]
    co = C_OZONE[channel] * params.ozone_absorption_multiplier[channel]
    return cr, cm, co


def transmittance(state, params, origin, direction, channel, active):
    """CalculateTransmittanceThroughAtmosphere for one channel
    (Atmosphere.slang:33-106).  Returns (state, (N,) channel transmittance)."""
    n = origin.shape[0]
    p_near, p_far = intersect_sphere(origin, direction, params.planet_position, params.planet_radius)
    occluded = p_far > 0.0

    a_near, a_far = intersect_sphere(
        origin, direction, params.planet_position, params.planet_radius + params.atmosphere_height
    )
    t_lo = jnp.maximum(a_near, 0.0)
    outside = a_far < 0.0

    cr, cm, co = _channel_coeffs(params, channel)
    majorant = (
        rayleigh_density(params, 0.0) * cr
        + mie_density(params, 0.0) * cm
        + ozone_density(params, params.ozone_peak) * co
    )
    no_atmo = majorant <= 0.0

    live0 = active & ~occluded & ~outside & ~no_atmo
    init = dict(
        state=state,
        t=jnp.zeros(n, jnp.float32),
        tr=jnp.ones(n, jnp.float32),
        live=live0,
        i=jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < MAX_STEPS, jnp.any(c["live"]))

    def body(c):
        state = c["state"]
        state, u = rng.next_float(state)
        dt = -jnp.log(jnp.maximum(1.0 - u, 1e-37)) / jnp.maximum(majorant, 1e-37)
        t = c["t"] + dt
        exited = t >= (a_far - t_lo)
        pos = origin + direction * (t + t_lo)[:, None]
        h = atmosphere_height(params, pos)
        below = h < 0.0
        dr = rayleigh_density(params, h) * cr
        dm = mie_density(params, h) * cm
        do = ozone_density(params, h) * co
        ratio = 1.0 - (dr + dm + do) / jnp.maximum(majorant, 1e-37)
        test = c["live"] & ~exited & ~below
        tr = jnp.where(test, c["tr"] * ratio, c["tr"])
        state, u2 = rng.next_float(state)
        absorbed = test & (u2 > tr)
        tr = jnp.where(absorbed, 0.0, jnp.where(test, 1.0, tr))
        live = c["live"] & ~exited & ~below & ~absorbed
        return dict(state=state, t=jnp.where(c["live"], t, c["t"]), tr=tr, live=live, i=c["i"] + 1)

    out = jax.lax.while_loop(cond, body, init)
    tr = jnp.where(occluded, 0.0, jnp.where(outside | no_atmo, 1.0, out["tr"]))
    return out["state"], tr


def sample_scatter_distance(state, params, origin, direction, channel, active):
    """SampleAtmosphereScatterDistance (Atmosphere.slang:116-202).

    Returns (state, t (N,) with -1 for none, component (N,) int32)."""
    n = origin.shape[0]
    a_near, a_far = intersect_sphere(
        origin, direction, params.planet_position, params.planet_radius + params.atmosphere_height
    )
    p_near, p_far = intersect_sphere(origin, direction, params.planet_position, params.planet_radius)
    t0 = jnp.maximum(a_near, 0.0)
    no_hit = a_far < 0.0

    cr, cm, co = _channel_coeffs(params, channel)
    majorant = (
        rayleigh_density(params, 0.0) * cr
        + mie_density(params, 0.0) * cm
        + ozone_density(params, params.ozone_peak) * co
    )
    no_atmo = majorant <= 0.0

    live0 = active & ~no_hit & ~no_atmo
    init = dict(
        state=state,
        t=t0,
        result=jnp.full(n, -1.0, jnp.float32),
        comp=jnp.full(n, COMPONENT_NONE, jnp.int32),
        live=live0,
        i=jnp.int32(0),
    )

    def cond(c):
        return jnp.logical_and(c["i"] < MAX_STEPS, jnp.any(c["live"]))

    def body(c):
        state = c["state"]
        state, u = rng.next_float(state)
        dt = -jnp.log(jnp.maximum(1.0 - u, 1e-37)) / jnp.maximum(majorant, 1e-37)
        t = c["t"] + dt
        exited = (t >= a_far) | ((p_near > 0.0) & (t >= p_near))
        pos = origin + direction * t[:, None]
        h = atmosphere_height(params, pos)
        dr = rayleigh_density(params, h) * cr
        dm = mie_density(params, h) * cm
        do = ozone_density(params, h) * co
        density = dr + dm + do
        state, u2 = rng.next_float(state)
        null = density / jnp.maximum(majorant, 1e-37) < u2
        real = c["live"] & ~exited & ~null

        state, x = rng.next_float(state)
        p_r = dr / jnp.maximum(density, 1e-37)
        p_m = dm / jnp.maximum(density, 1e-37)
        comp_pick = jnp.where(
            x <= p_r,
            COMPONENT_RAYLEIGH,
            jnp.where(x <= p_r + p_m, COMPONENT_MIE, COMPONENT_OZONE),
        ).astype(jnp.int32)

        result = jnp.where(real, t, c["result"])
        comp = jnp.where(real, comp_pick, c["comp"])
        live = c["live"] & ~exited & ~real
        return dict(
            state=state, t=jnp.where(c["live"], t, c["t"]), result=result,
            comp=comp, live=live, i=c["i"] + 1,
        )

    out = jax.lax.while_loop(cond, body, init)
    return out["state"], out["result"], out["comp"]
