"""Kinematics topomaps (joint ↔ EE SE(3) space) and SE(2) mobile-robot
planning over the bitmap world.

(ref: ctrl/topologies/direct_kinematics_topomap.hpp,
inverse_kinematics_topomap.hpp, se2_topologies.hpp:145,
ptrobot2D_test_world.hpp — the reference lifts joint points into the EE
topology with doDirectMotion and plans point robots in the 2D test world.)
"""
import jax
import jax.numpy as jnp
import numpy as np

import reak_tpu.planning as pl
import reak_tpu.spaces as sp
from reak_tpu.kte import models, ik


class TestDirectKinTopoMap:
    def test_matches_ee_pose_batched(self, rng):
        spec = models.manip_3r3r()
        dk = sp.DirectKinTopoMap(spec)
        qs = jnp.asarray(rng.uniform(-1.0, 1.0, (5, 6)))
        pose = dk(qs)
        assert pose.pos.shape == (5, 3) and pose.quat.shape == (5, 4)
        for i in range(5):
            p, quat = ik.ee_pose(spec, qs[i])
            np.testing.assert_allclose(pose.pos[i], p, atol=1e-9)
            np.testing.assert_allclose(pose.quat[i], quat, atol=1e-9)

    def test_first_order_lift_matches_fd(self):
        """The Jacobian lift's linear velocity equals d/dt of the FK position."""
        spec = models.manip_3r3r()
        dk = sp.DirectKinTopoMap(spec)
        q = jnp.asarray([0.3, -0.5, 0.8, 0.2, 0.6, -0.4])
        qd = jnp.asarray([0.1, -0.2, 0.3, 0.05, -0.1, 0.2])
        lifted = dk.lift(q, qd)
        eps = 1e-6
        p0, _ = ik.ee_pose(spec, q - 0.5 * eps * qd)
        p1, _ = ik.ee_pose(spec, q + 0.5 * eps * qd)
        np.testing.assert_allclose(lifted.vel, (p1 - p0) / eps, atol=1e-5)
        # batched lift
        lb = dk.lift(jnp.stack([q, q]), jnp.stack([qd, 2 * qd]))
        np.testing.assert_allclose(lb.vel[1], 2 * lifted.vel, atol=1e-9)


class TestInverseKinTopoMap:
    def test_closed_form_roundtrip(self):
        spec = models.manip_3r3r()
        dk = sp.DirectKinTopoMap(spec)
        ikm = sp.InverseKinTopoMap(spec, solver=ik.ik_3r3r,
                                   shoulder=1.0, elbow=1.0, wrist=1.0)
        q = jnp.asarray([0.3, -0.5, 0.8, 0.2, 0.6, -0.4])
        pose = dk(q)
        # IK on a fixed branch reproduces the POSE (it may pick a different
        # joint solution than q — branch selection is the caller's choice)
        back1 = dk(ikm(pose))
        np.testing.assert_allclose(back1.pos, pose.pos, atol=1e-8)
        # batched: DK(IK(pose)) reproduces the poses
        qs = jnp.stack([q, q + 0.1])
        poses = dk(qs)
        q_b = ikm(poses)
        back = dk(q_b)
        np.testing.assert_allclose(back.pos, poses.pos, atol=1e-8)

    def test_clik_fallback(self):
        spec = models.manip_3r3r()
        dk = sp.DirectKinTopoMap(spec)
        ikm = sp.InverseKinTopoMap(spec)  # CLIK-backed
        q = jnp.asarray([0.3, -0.5, 0.8, 0.2, 0.6, -0.4])
        pose = dk(q)
        q_ik = ikm(pose, q0=q + 0.05)
        back = dk(q_ik)
        assert float(jnp.linalg.norm(back.pos - pose.pos)) < 1e-6


class TestFlatSE2Planning:
    """RRT over SE(2) poses in the bitmap world: the heading coordinate rides
    along (wrap-aware metric/steer) while collisions check position only."""

    def _world(self):
        grid = np.ones((64, 64), bool)
        grid[30:34, :] = False          # wall across x ≈ 0.5 ...
        grid[30:34, 24:40] = True       # ... with a gap around y ≈ 0.5
        space = sp.FlatSE2Space(jnp.full(2, 0.0), jnp.full(2, 1.0),
                                rot_weight=0.1)
        return pl.bitmap_workspace(space, grid, jnp.zeros(2), jnp.ones(2))

    def test_rrt_plans_through_gap_with_heading(self):
        ws = self._world()
        q = pl.PlanningQuery(
            start=jnp.asarray([0.1, 0.5, 3.0]),
            goal=jnp.asarray([0.9, 0.5, -3.0]),
            goal_tolerance=0.08,
        )
        res = pl.rrt_plan(ws, q, max_iters=150, step_size=0.12, seed=0)
        assert res.success
        path = np.asarray(res.path)
        assert path.shape[-1] == 3
        # every waypoint collision-free (positions pass through the gap)
        free = np.asarray(ws.is_free_batch(jnp.asarray(path)))
        assert free.all()
        # headings stay wrapped
        assert np.all(np.abs(path[:, 2]) <= np.pi + 1e-6)
        # the wrap metric makes 3.0 → -3.0 cheap: total heading cost small
        dth = np.abs(((path[1:, 2] - path[:-1, 2]) + np.pi) % (2 * np.pi) - np.pi)
        assert dth.sum() < 2.0  # short way round (~0.28), not ~6 rad

    def test_flat_matches_structured_metric(self):
        flat = sp.FlatSE2Space(jnp.zeros(2), jnp.ones(2), rot_weight=0.5)
        st = sp.SE2Space(jnp.zeros(2), jnp.ones(2), rot_weight=0.5)
        a = jnp.asarray([0.2, 0.3, 3.0])
        b = jnp.asarray([0.7, 0.9, -3.0])
        da = float(flat.distance(a, b))
        db = float(st.distance(sp.se2.SE2Point(a[:2], a[2]),
                               sp.se2.SE2Point(b[:2], b[2])))
        np.testing.assert_allclose(da, db, atol=1e-9)
