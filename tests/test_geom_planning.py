"""Geometry proximity + planner tests (parity model: ref test_planners.cpp 2D
worlds, unit-style checks on prox_* kernels)."""
import jax
import jax.numpy as jnp
import numpy as np

import reak_tpu.geom as gm
import reak_tpu.planning as pl
import reak_tpu.spaces as sp
from reak_tpu.planning.queries import PlanningQuery


# ---------------------------------------------------------------------------
# proximity kernels
# ---------------------------------------------------------------------------


def test_sphere_sphere():
    s1 = gm.Sphere(jnp.array([0.0, 0.0, 0.0]), jnp.asarray(1.0))
    s2 = gm.Sphere(jnp.array([3.0, 0.0, 0.0]), jnp.asarray(1.0))
    np.testing.assert_allclose(gm.dist_sphere_sphere(s1, s2), 1.0, atol=1e-12)
    s3 = gm.Sphere(jnp.array([1.5, 0.0, 0.0]), jnp.asarray(1.0))
    assert float(gm.dist_sphere_sphere(s1, s3)) < 0  # penetration


def test_sphere_box():
    b = gm.Box(jnp.zeros(3), jnp.array([1.0, 0, 0, 0]), jnp.array([1.0, 1.0, 1.0]))
    s = gm.Sphere(jnp.array([3.0, 0.0, 0.0]), jnp.asarray(0.5))
    np.testing.assert_allclose(gm.dist_sphere_box(s, b), 1.5, atol=1e-9)
    s_in = gm.Sphere(jnp.zeros(3), jnp.asarray(0.5))
    assert float(gm.dist_sphere_box(s_in, b)) < 0


def test_rotated_box():
    from reak_tpu.math import rotations as rot

    q = rot.q_from_axis_angle(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(np.pi / 4))
    b = gm.Box(jnp.zeros(3), q, jnp.array([1.0, 1.0, 1.0]))
    # along the rotated x-axis the corner is at distance √2
    s = gm.Sphere(jnp.array([2.0, 0.0, 0.0]), jnp.asarray(0.0))
    np.testing.assert_allclose(gm.dist_sphere_box(s, b), 2 - np.sqrt(2), atol=1e-6)


def test_capsule_capsule():
    c1 = gm.Capsule(jnp.array([0.0, 0, 0]), jnp.array([1.0, 0, 0]), jnp.asarray(0.2))
    c2 = gm.Capsule(jnp.array([0.0, 1, 0]), jnp.array([1.0, 1, 0]), jnp.asarray(0.3))
    np.testing.assert_allclose(gm.dist_capsule_capsule(c1, c2), 0.5, atol=1e-9)
    # crossing segments
    c3 = gm.Capsule(jnp.array([0.5, -1, 0.1]), jnp.array([0.5, 1, 0.1]), jnp.asarray(0.0))
    np.testing.assert_allclose(gm.dist_capsule_capsule(c1, c3), 0.1 - 0.2, atol=1e-9)


def test_plane_kernels():
    p = gm.Plane(jnp.array([0.0, 0.0, 1.0]), jnp.asarray(0.0))
    s = gm.Sphere(jnp.array([0.0, 0.0, 2.0]), jnp.asarray(0.5))
    np.testing.assert_allclose(gm.dist_sphere_plane(s, p), 1.5, atol=1e-12)
    b = gm.Box(jnp.array([0.0, 0.0, 2.0]), jnp.array([1.0, 0, 0, 0]), jnp.array([0.5, 0.5, 0.5]))
    np.testing.assert_allclose(gm.dist_box_plane(b, p), 1.5, atol=1e-9)
    c = gm.Capsule(jnp.array([0.0, 0.0, 1.0]), jnp.array([0.0, 0.0, 3.0]), jnp.asarray(0.25))
    np.testing.assert_allclose(gm.dist_capsule_plane(c, p), 0.75, atol=1e-12)


def test_proxy_query():
    robot = gm.ProxyModel(
        spheres=gm.Sphere(jnp.array([[0.0, 0, 0], [1.0, 0, 0]]), jnp.array([0.2, 0.2]))
    )
    env = gm.ProxyModel(
        spheres=gm.Sphere(jnp.array([[3.0, 0, 0]]), jnp.array([0.5])),
        planes=gm.Plane(jnp.array([[0.0, 0, 1.0]]), jnp.array([-1.0])),
    )
    d = gm.proxy_query(robot, env)
    # closest pair: either sphere to the z=-1 floor plane: 1 - 0.2 = 0.8
    np.testing.assert_allclose(d, 0.8, atol=1e-9)


# ---------------------------------------------------------------------------
# planners on a 2D world with a wall + gap
# ---------------------------------------------------------------------------


def _gap_world():
    """10x10 world, vertical wall at x≈5 with a gap at y ∈ [4.5, 5.5]."""
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))

    def is_free(pts):
        x, y = pts[:, 0], pts[:, 1]
        wall = (jnp.abs(x - 5.0) < 0.3) & ((y < 4.5) | (y > 5.5))
        return ~wall

    ws = pl.Workspace(space, is_free, n_checks=24)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]), goal_tolerance=0.3)
    return ws, q


def _valid_path(ws, path):
    a = jnp.asarray(path[:-1])
    b = jnp.asarray(path[1:])
    return bool(jnp.all(ws.edge_free_batch(a, b)))


def test_rrt_gap_world():
    ws, q = _gap_world()
    res = pl.rrt_plan(ws, q, max_iters=150, step_size=0.8, seed=3)
    assert res.success, res
    assert _valid_path(ws, res.path)
    # path must cross the gap region
    xs = res.path[:, 0]
    assert xs.min() < 5 < xs.max()


def test_rrt_no_obstacle():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))
    ws = pl.NoObstacleWorkspace(space)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]), goal_tolerance=0.5)
    res = pl.rrt_plan(ws, q, max_iters=100, step_size=1.5)
    assert res.success
    assert res.cost < 20.0


def test_prm_gap_world():
    ws, q = _gap_world()
    res = pl.prm_plan(ws, q, n_samples=400, k_neighbors=10, seed=1)
    assert res.success, res
    assert _valid_path(ws, res.path)


def test_rrt_star_improves_cost():
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))
    ws = pl.NoObstacleWorkspace(space)
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 1.0]), goal_tolerance=0.4)
    res = pl.rrt_star_plan(ws, q, max_iters=40, step_size=1.2, capacity=2048, seed=0)
    assert res.success
    # straight-line distance is 8; RRT* should be within 15%
    assert res.cost < 8.0 * 1.15, res.cost


def test_sbastar_gap_world():
    ws, q = _gap_world()
    res = pl.sbastar_plan(ws, q, max_iters=80, step_size=1.0, seed=2)
    assert res.success, res
    assert _valid_path(ws, res.path)


def test_bitmap_workspace():
    grid = np.ones((50, 50), bool)
    grid[:, 24:27] = False  # wall along one axis
    grid[22:28, 24:27] = True  # gap
    from reak_tpu.planning.workspace import bitmap_workspace

    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))
    ws = bitmap_workspace(space, grid, jnp.zeros(2), jnp.full(2, 10.0))
    q = PlanningQuery(np.array([1.0, 1.0]), np.array([9.0, 9.0]), goal_tolerance=0.4)
    res = pl.rrt_plan(ws, q, max_iters=200, step_size=0.8, seed=5)
    assert res.success


def test_monte_carlo_engine():
    ws, q = _gap_world()
    stats = pl.monte_carlo_engine(pl.rrt_plan, ws, q, n_runs=3,
                                  max_iters=120, step_size=0.8)
    assert stats["n_runs"] == 3
    assert 0.0 <= stats["success_rate"] <= 1.0
    assert len(stats["rows"]) == 3


def test_chain_workspace_collision():
    """2-link arm with a sphere obstacle: elbow-up pose free, stretched pose
    colliding (ref: manip_quasi_static_env behavior)."""
    from reak_tpu.kte import models
    from reak_tpu.geom.shapes import ShapeSet, Capsule, Sphere
    from reak_tpu.geom.proximity import ProxyModel

    spec = models.planar_2link(l1=0.4, l2=0.3)
    # robot: capsules along each link (local coords: x-axis of each body)
    robot = ShapeSet(
        capsules=Capsule(
            a=jnp.zeros((2, 3)),
            b=jnp.array([[0.4, 0.0, 0.0], [0.3, 0.0, 0.0]]),
            radius=jnp.array([0.05, 0.05]),
        ),
        capsule_body=jnp.array([0, 1]),
    )
    env = ProxyModel(spheres=Sphere(jnp.array([[0.55, 0.0, 0.0]]), jnp.array([0.1])))
    space = sp.HyperboxSpace(jnp.full(2, -np.pi), jnp.full(2, np.pi))
    ws = pl.ChainWorkspace(space, spec, robot, env, margin=0.0)
    q_straight = jnp.array([[0.0, 0.0]])  # arm along +x → hits the sphere
    q_up = jnp.array([[np.pi / 2, 0.0]])  # arm along +y → clear
    free = np.asarray(ws.is_free_batch(jnp.concatenate([q_straight, q_up])))
    assert not free[0]
    assert free[1]


def test_chain_workspace_penetrating_pose_negative_clearance():
    """A chain pose driving a link capsule THROUGH an obstacle box reports
    clearance < 0 through the full ChainWorkspace stack — penetration depth
    survives the aggregate min (ref: findProximityByGJKEPA depth,
    prox_fundamentals_3D.hpp:57-264; VERDICT r2 item 4)."""
    from reak_tpu.kte import models
    from reak_tpu.geom.shapes import ShapeSet, Capsule, Box
    from reak_tpu.geom.proximity import ProxyModel

    spec = models.planar_2link(l1=0.4, l2=0.3)
    robot = ShapeSet(
        capsules=Capsule(
            a=jnp.zeros((2, 3)),
            b=jnp.array([[0.4, 0.0, 0.0], [0.3, 0.0, 0.0]]),
            radius=jnp.array([0.05, 0.05]),
        ),
        capsule_body=jnp.array([0, 1]),
    )
    env = ProxyModel(boxes=Box(jnp.array([[0.55, 0.0, 0.0]]),
                               jnp.array([[1.0, 0.0, 0.0, 0.0]]),
                               jnp.array([[0.1, 0.1, 0.1]])))
    space = sp.HyperboxSpace(jnp.full(2, -np.pi), jnp.full(2, np.pi))
    ws = pl.ChainWorkspace(space, spec, robot, env, margin=0.0)
    qs = jnp.array([[0.0, 0.0],          # arm along +x: capsule axis through box
                    [np.pi / 2, 0.0]])   # arm along +y: clear
    d = np.asarray(ws.min_distance_batch(qs))
    assert d[0] < -0.05, f"expected penetration depth, got {d[0]}"
    assert d[1] > 0.1


# ---------------------------------------------------------------------------
# bidirectional RRT (ref: rr_tree.hpp:256 generate_bidirectional_rrt)
# ---------------------------------------------------------------------------


def _bug_trap_world():
    """Goal inside a C-shaped trap whose mouth faces AWAY from the start:
    a start-rooted tree rarely threads the mouth, while a goal-rooted tree
    walks straight out — the canonical bi-RRT workload."""
    space = sp.HyperboxSpace(jnp.zeros(2), jnp.full(2, 10.0))
    cx, cy = 7.0, 5.0  # trap center (goal)

    def is_free(pts):
        x, y = pts[:, 0], pts[:, 1]
        lx, ly = x - cx, y - cy
        inside_ring = (jnp.maximum(jnp.abs(lx), jnp.abs(ly)) > 1.2) & (
            jnp.maximum(jnp.abs(lx), jnp.abs(ly)) < 1.6
        )
        # mouth: narrow slot on the +x side (away from the start at x=1)
        mouth = (lx > 1.0) & (jnp.abs(ly) < 0.25)
        return ~(inside_ring & ~mouth)

    ws = pl.Workspace(space, is_free, n_checks=24)
    q = PlanningQuery(np.array([1.0, 5.0]), np.array([cx, cy]),
                      goal_tolerance=0.3)
    return ws, q


def test_birrt_beats_unidirectional_in_bug_trap():
    ws, q = _bug_trap_world()
    budget = 40
    uni = pl.rrt_plan(ws, q, max_iters=budget, step_size=0.6, seed=0)
    bi = pl.birrt_plan(ws, q, max_iters=budget, step_size=0.6, seed=0)
    assert bi.success, "bi-RRT should thread the trap via the goal tree"
    assert not uni.success, "unidirectional RRT should fail at this budget"
    assert _valid_path(ws, bi.path)
    # the spliced path must enter through the mouth (x > trap center)
    assert bi.path[:, 0].max() > 8.0


def test_birrt_alternation_connects_both_halves():
    ws, q = _gap_world()
    res = pl.birrt_plan(ws, q, max_iters=80, step_size=0.8, seed=5)
    assert res.success
    assert _valid_path(ws, res.path)
    # endpoints are the query endpoints exactly (splice keeps both roots)
    np.testing.assert_allclose(res.path[0], q.start, atol=1e-9)
    np.testing.assert_allclose(res.path[-1], q.goal, atol=1e-9)
