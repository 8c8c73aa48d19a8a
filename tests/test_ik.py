"""Inverse kinematics: closed-form round-trips vs FK (the reference's own
strategy — closed-form IK verified against KTE forward kinematics,
SURVEY.md §4 / test_CRS_IK.cpp), plus CLIK convergence and batching."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from reak_tpu.kte import models, ik


def _pose_close(spec, qa, qb, atol=1e-9):
    pa, qta = ik.ee_pose(spec, qa)
    pb, qtb = ik.ee_pose(spec, qb)
    assert float(jnp.linalg.norm(pa - pb)) < atol
    qd = min(float(jnp.linalg.norm(qta - qtb)), float(jnp.linalg.norm(qta + qtb)))
    assert qd < atol


class TestClosedForm3R3R:
    def test_roundtrip_all_branches(self, rng):
        spec = models.manip_3r3r()
        for _ in range(10):
            q = jnp.asarray(rng.uniform(-1.2, 1.2, 6))
            p, quat = ik.ee_pose(spec, q)
            best = np.inf
            for sh in (1.0, -1.0):
                for el in (1.0, -1.0):
                    for wr in (1.0, -1.0):
                        qs = ik.ik_3r3r(spec, p, quat, sh, el, wr)
                        p2, quat2 = ik.ee_pose(spec, qs)
                        e = float(jnp.linalg.norm(p2 - p))
                        best = min(best, e)
            assert best < 1e-9

    def test_primary_branch_recovers_q(self, rng):
        """Near the home posture the (+,+,+) branch returns the original q."""
        spec = models.manip_3r3r()
        q = jnp.asarray([0.3, -0.5, 0.8, 0.2, 0.6, -0.4])
        p, quat = ik.ee_pose(spec, q)
        errs = []
        for sh in (1.0, -1.0):
            for el in (1.0, -1.0):
                for wr in (1.0, -1.0):
                    qs = ik.ik_3r3r(spec, p, quat, sh, el, wr)
                    errs.append(float(jnp.linalg.norm(qs - q)))
        assert min(errs) < 1e-9

    def test_branches_vmappable(self):
        spec = models.manip_3r3r()
        q = jnp.asarray([0.3, -0.5, 0.8, 0.2, 0.6, -0.4])
        p, quat = ik.ee_pose(spec, q)
        sh = jnp.array([1.0, 1, 1, 1, -1, -1, -1, -1])
        el = jnp.array([1.0, 1, -1, -1, 1, 1, -1, -1])
        wr = jnp.array([1.0, -1, 1, -1, 1, -1, 1, -1])
        qs = jax.vmap(lambda s, e, w: ik.ik_3r3r(spec, p, quat, s, e, w))(sh, el, wr)
        assert qs.shape == (8, 6)
        for i in range(8):
            _pose_close(spec, qs[i], q)


class TestClosedFormOthers:
    def test_p3r3r_roundtrip(self, rng):
        spec = models.manip_p3r3r()
        q = jnp.asarray(np.concatenate([[0.7], rng.uniform(-1.0, 1.0, 6)]))
        p, quat = ik.ee_pose(spec, q)
        qs = ik.ik_p3r3r(spec, p, quat, track_pos=q[0])
        _pose_close(spec, qs, q)

    def test_scara_roundtrip(self):
        spec = models.manip_scara()
        q = jnp.asarray([0.5, -0.7, 0.1])
        p, _ = ik.ee_pose(spec, q)
        for el in (1.0, -1.0):
            qs = ik.ik_scara(spec, p, elbow=el)
            p2, _ = ik.ee_pose(spec, qs)
            assert float(jnp.linalg.norm(p2 - p)) < 1e-9


class TestCLIK:
    def test_converges_to_reachable_pose(self):
        spec = models.manip_3r3r()
        q_true = jnp.asarray([0.4, -0.6, 0.9, 0.3, 0.5, -0.2])
        p, quat = ik.ee_pose(spec, q_true)
        res = ik.clik(spec, p, quat, jnp.zeros(6) + 0.05, iters=80)
        assert bool(res.converged)
        _pose_close(spec, res.q, q_true, atol=1e-6)

    def test_respects_joint_limits(self):
        spec = models.manip_3r3r()
        q_true = jnp.asarray([0.4, -0.6, 0.9, 0.3, 0.5, -0.2])
        p, quat = ik.ee_pose(spec, q_true)
        lo, hi = -jnp.ones(6) * 2.0, jnp.ones(6) * 2.0
        res = ik.clik(spec, p, quat, jnp.zeros(6) + 0.05, iters=80,
                      q_min=lo, q_max=hi)
        assert bool(jnp.all(res.q >= lo)) and bool(jnp.all(res.q <= hi))
        assert float(res.err) < 1e-6

    @pytest.mark.slow  # compile-heavy on XLA-CPU; covered by cheaper siblings in the default run
    def test_posture_cost_uses_redundancy(self):
        """On the redundant 7-DoF P3R3R, the nullspace posture term pulls the
        track coordinate toward q_rest without disturbing the task
        (ref: clik posture objective, manip_clik_calculator.hpp:4-8)."""
        spec = models.manip_p3r3r()
        q_rest = jnp.asarray([0.5, 0.3, -0.4, 0.7, 0.1, 0.4, 0.0])
        p, quat = ik.ee_pose(spec, q_rest)
        q0 = q_rest.at[0].add(0.3)  # start with the track displaced
        res_post = ik.clik(spec, p, quat, q0, iters=120, posture_weight=5e-2,
                           q_rest=q_rest)
        res_none = ik.clik(spec, p, quat, q0, iters=120, posture_weight=0.0,
                           q_rest=q_rest)
        assert float(res_post.err) < 1e-6
        d_post = abs(float(res_post.q[0]) - 0.5)
        d_none = abs(float(res_none.q[0]) - 0.5)
        assert d_post < d_none  # posture term exploited the redundancy

    def test_batched_jit(self, rng):
        spec = models.manip_3r3r()
        qs = jnp.asarray(rng.uniform(-0.8, 0.8, (16, 6)))
        ps, quats = jax.vmap(lambda q: ik.ee_pose(spec, q))(qs)
        f = jax.jit(lambda p, qt, q0: ik.clik_batched(spec, p, qt, q0, iters=60))
        res = f(ps, quats, qs + 0.1 * jnp.asarray(rng.standard_normal((16, 6))))
        assert res.q.shape == (16, 6)
        assert float(jnp.max(res.err)) < 1e-6


class TestIK7DoF:
    """Closed-form SSRMS/ERA IK (ref: manip_SSRMS_arm.cpp:300,
    manip_ERA_arm.cpp doInverseMotion) — FK round trips at machine precision,
    like the 3R3R solver above."""

    @staticmethod
    def _phi_of(spec, q):
        """Redundancy angle of a configuration: project the middle pitch axis
        onto the solver's self-motion circle basis."""
        from reak_tpu.kte import dynamics
        from reak_tpu.math import rotations as rot

        r = dynamics.fk(spec, q)
        w = r.joint_axis[3]
        p, quat = ik.ee_pose(spec, q)
        offs = np.asarray(spec.offsets_pos)
        p1 = jnp.array([0.0, 0.0, float(offs[1][2])])
        Ree = rot.q_to_matrix(quat)
        v = (p - float(offs[6][2]) * Ree[:, 2]) - p1
        vu = v / jnp.linalg.norm(v)
        ref = jnp.where(jnp.abs(vu[2]) < 0.9, jnp.array([0.0, 0, 1.0]),
                        jnp.array([1.0, 0, 0.0]))
        e1 = jnp.cross(vu, ref)
        e1 = e1 / jnp.linalg.norm(e1)
        e2 = jnp.cross(vu, e1)
        return jnp.arctan2(jnp.dot(w, e2), jnp.dot(w, e1))

    def _roundtrip(self, make, solver, rng):
        from reak_tpu.math import rotations as rot

        spec = make()
        for _ in range(12):
            q = jnp.asarray(rng.uniform(-1.2, 1.2, 7))
            p, quat = ik.ee_pose(spec, q)
            phi = self._phi_of(spec, q)
            elbow = 1.0 if float(q[3]) >= 0 else -1.0
            qik = solver(spec, p, quat, phi=phi, elbow=elbow)
            p2, quat2 = ik.ee_pose(spec, qik)
            np.testing.assert_allclose(np.asarray(p2), np.asarray(p), atol=1e-9)
            ang = jnp.linalg.norm(rot.q_log(rot.qmul(rot.qconj(quat), quat2)))
            assert float(ang) < 1e-9

    def test_ssrms_roundtrip(self, rng):
        self._roundtrip(models.manip_ssrms, ik.ik_ssrms, rng)

    def test_era_roundtrip(self, rng):
        self._roundtrip(models.manip_era, ik.ik_era, rng)

    def test_redundancy_sweep_all_reach_pose(self, rng):
        """Every phi on the self-motion circle reproduces the same EE pose —
        the capability the reference's single-branch heuristic picks one
        point of (manip_SSRMS_arm.cpp:327-415)."""
        from reak_tpu.math import rotations as rot

        spec = models.manip_ssrms()
        q = jnp.asarray([0.3, 0.4, 0.5, -0.8, 0.3, 0.5, 0.2])
        p, quat = ik.ee_pose(spec, q)
        phis = jnp.linspace(-np.pi, np.pi, 33)
        qik = jax.vmap(lambda f: ik.ik_ssrms(spec, p, quat, phi=f))(phis)
        ps, quats = jax.vmap(lambda qq: ik.ee_pose(spec, qq))(qik)
        perr = jnp.linalg.norm(ps - p[None], axis=-1)
        angs = jax.vmap(
            lambda qt: jnp.linalg.norm(rot.q_log(rot.qmul(rot.qconj(quat), qt)))
        )(quats)
        # not every phi is feasible (the planar sub-chain's reach varies with
        # the plane choice); the feasible arc must be wide and every feasible
        # solution must reproduce the pose exactly
        feas = np.asarray((perr < 1e-8) & (angs < 1e-8))
        assert feas.sum() >= 8, f"only {feas.sum()} feasible phis"
        # and the feasible solutions genuinely differ (a real self-motion arc)
        assert float(np.std(np.asarray(qik)[feas, 0])) > 0.1
