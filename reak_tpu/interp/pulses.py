"""Sustained velocity / acceleration pulse (SVP / SAP) rate-limited profiles.

(ref: ctrl/interpolation/sustained_velocity_pulse.hpp:176,
sustained_velocity_pulse_Ndof.hpp + detail TUs,
sustained_acceleration_pulse.hpp:220 — closed-form min-time profiles under
per-joint velocity/acceleration limits, synchronized across joints)

SVP: trapezoidal velocity profile (bang-coast-bang in velocity, rest-to-rest);
SAP: S-curve with bounded acceleration.  All closed-form, branch-free via
``jnp.where`` — evaluates in batch over joints AND query times.
"""
from __future__ import annotations

import jax.numpy as jnp


def svp_min_time(p0, p1, v_max):
    """Minimum time to move p0 → p1 (rest-to-rest) at |v| ≤ v_max with unit-
    normalized triangular ramp: the reference's rate-limited space makes this
    |Δp|/v_max (ref: sustained_velocity_pulse_Ndof.hpp svp_compute_interpolated…).
    Synchronized across joints: the max over the last axis."""
    t = jnp.abs(p1 - p0) / v_max
    return jnp.max(t, axis=-1)


def svp_eval(p0, p1, v_max, T, t):
    """Evaluate the synchronized trapezoidal (here: saturated-velocity) profile
    at time t ∈ [0, T]: each joint moves at constant velocity Δp/T (all joints
    finish together; per-joint |v| ≤ v_max whenever T ≥ svp_min_time).
    Returns (pos, vel)."""
    t = jnp.asarray(t)
    tau = jnp.clip(t / T, 0.0, 1.0)
    tt = tau[..., None] if jnp.ndim(tau) else tau
    pos = p0 + (p1 - p0) * tt
    vel = jnp.where((t >= 0) & (t <= T), 1.0, 0.0)
    vel = (p1 - p0) / T * (vel[..., None] if jnp.ndim(vel) else vel)
    return pos, vel


def sap_min_time(p0, p1, v_max, a_max):
    """Min time rest-to-rest under |v| ≤ v_max, |a| ≤ a_max (trapezoidal/
    triangular velocity profile; ref: sustained_acceleration_pulse.hpp:220).
    Per joint:  if Δ ≥ v²/a: T = Δ/v + v/a  (trapezoid)
                else:        T = 2·√(Δ/a)   (triangle)
    Synchronized: max over last axis."""
    d = jnp.abs(p1 - p0)
    trap = d / v_max + v_max / a_max
    tri = 2.0 * jnp.sqrt(d / a_max)
    T = jnp.where(d >= v_max * v_max / a_max, trap, tri)
    return jnp.max(T, axis=-1)


def sap_eval(p0, p1, v_max, a_max, T, t):
    """Evaluate a synchronized trapezoidal-velocity profile at time t.

    Each joint gets a scaled trapezoid that completes |Δ| in exactly T while
    respecting its own a_max: ramp time t_r solves Δ = a t_r (T − t_r), using
    the smaller root (most gradual ramp); peak velocity v_pk = a·t_r.
    Returns (pos, vel, acc)."""
    d = p1 - p0
    sgn = jnp.sign(d)
    ad = jnp.abs(d)
    # Δ = a t_r (T − t_r) → t_r = (T − √(T² − 4Δ/a))/2 (gradual root)
    disc = jnp.maximum(T * T - 4.0 * ad / a_max, 0.0)
    t_r = 0.5 * (T - jnp.sqrt(disc))
    a_eff = jnp.where(ad > 0, ad / jnp.maximum(t_r * (T - t_r), 1e-30), 0.0)
    v_pk = a_eff * t_r

    t = jnp.asarray(t)
    tt = t[..., None] if jnp.ndim(t) else t
    tc = jnp.clip(tt, 0.0, T)
    # piecewise: ramp-up [0,t_r), coast [t_r, T−t_r), ramp-down [T−t_r, T]
    in_up = tc < t_r
    in_down = tc > (T - t_r)
    t_down = tc - (T - t_r)
    pos_up = 0.5 * a_eff * tc * tc
    pos_coast = 0.5 * a_eff * t_r * t_r + v_pk * (tc - t_r)
    pos_down = ad - 0.5 * a_eff * (t_r - t_down) ** 2 - v_pk * 0.0
    pos_down = ad - 0.5 * a_eff * (t_r - t_down) * (t_r - t_down)
    mag = jnp.where(in_up, pos_up, jnp.where(in_down, pos_down, pos_coast))
    vel_mag = jnp.where(
        in_up, a_eff * tc, jnp.where(in_down, a_eff * (t_r - t_down), v_pk)
    )
    acc_mag = jnp.where(in_up, a_eff, jnp.where(in_down, -a_eff, 0.0))
    inside = (tt >= 0) & (tt <= T)
    pos = p0 + sgn * jnp.where(inside, mag, jnp.where(tt > T, ad, 0.0))
    vel = sgn * jnp.where(inside, vel_mag, 0.0)
    acc = sgn * jnp.where(inside, acc_mag, 0.0)
    return pos, vel, acc
