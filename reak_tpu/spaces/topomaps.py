"""Kinematics topological maps: joint space ↔ end-effector SE(3) space.

(ref: ctrl/topologies/direct_kinematics_topomap.hpp manip_direct_kin_map /
manip_DK_map applying doDirectMotion to lift a joint-space point into the
end-effector's SE(3) topology, inverse_kinematics_topomap.hpp
manip_inverse_kin_map / manip_IK_map running the model's doInverseMotion,
and the rate-limited variants in direct_kinematics_topomap_detail.hpp)

These close the loop between the planning topologies (`spaces/`) and the KTE
models (`kte/`): a planner works in the Ndof joint space while goals, queries,
and recorded results live in the workspace SE(3) topology.  Both maps are pure
jittable functions over batched points — the reference's per-point
`map_to_space` calls become one fused FK / IK wave on device.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from reak_tpu.kte import dynamics, ik
from reak_tpu.spaces.se3 import SE3Point, SE3Point1


def _batched(fn, q):
    """Apply ``fn`` over any leading batch axes of ``q (..., n)``."""
    extra = q.ndim - 1
    for _ in range(extra):
        fn = jax.vmap(fn)
    return fn(q)


class DirectKinTopoMap:
    """Joint point → end-effector SE(3) pose (ref:
    direct_kinematics_topomap.hpp manip_direct_kin_map::map_to_space)."""

    def __init__(self, spec):
        self.spec = spec

    def __call__(self, q) -> SE3Point:
        q = jnp.asarray(q)
        p, quat = _batched(lambda qi: ik.ee_pose(self.spec, qi), q)
        return SE3Point(p, quat)

    def lift(self, q, qd) -> SE3Point1:
        """1st-order lift: (q, q̇) → pose + body twist through the geometric
        Jacobian (ref: direct_kinematics_topomap_detail.hpp — the rate-limited
        1st-order map writes frame velocities from the joint rates)."""
        q, qd = jnp.asarray(q), jnp.asarray(qd)

        def one(qi, qdi):
            fk_res = dynamics.fk(self.spec, qi)
            J = ik.ee_jacobian(self.spec, qi, fk_res)
            tw = J @ qdi
            return fk_res.body_pos[-1], fk_res.body_quat[-1], tw[:3], tw[3:]

        fn = one
        for _ in range(q.ndim - 1):
            fn = jax.vmap(fn)
        p, quat, vel, omega = fn(q, qd)
        return SE3Point1(p, quat, vel, omega)


class InverseKinTopoMap:
    """End-effector SE(3) pose → joint point (ref:
    inverse_kinematics_topomap.hpp manip_inverse_kin_map::map_to_space).

    ``solver`` is any closed-form solver from `kte/ik.py`
    (``ik_3r3r``/``ik_p3r3r``/``ik_scara``/``ik_ssrms``/``ik_era``) taking
    ``(spec, p, quat, **branches)``; when None, damped CLIK from ``q0`` is
    used (≙ the reference falling back to manip_clik_calculator)."""

    def __init__(self, spec, solver=None, **branches):
        self.spec = spec
        self.solver = solver
        self.branches = branches

    def __call__(self, pose: SE3Point, q0=None):
        p, quat = jnp.asarray(pose.pos), jnp.asarray(pose.quat)
        if self.solver is not None:
            fn = lambda pi, qi: self.solver(self.spec, pi, qi, **self.branches)
            for _ in range(p.ndim - 1):
                fn = jax.vmap(fn)
            return fn(p, quat)
        if q0 is None:
            raise ValueError("CLIK-backed inverse map needs a seed q0")
        q0 = jnp.asarray(q0)
        if p.ndim > 1:
            return ik.clik_batched(self.spec, p, quat, q0, **self.branches).q
        return ik.clik(self.spec, p, quat, q0, **self.branches).q
