"""UAV kinematics model + navigation scenario bundles round-trip
(ref: kte_models/uav_kinematics.hpp, navigation_model_data.hpp:65,
chaser_target_model_data.hpp:65)."""
import os

import jax.numpy as jnp
import numpy as np

from reak_tpu.kte import models, dynamics as dyn, scenarios
from reak_tpu.io import serialization as ser


def test_uav_kinematics_chain():
    spec = models.uav_kinematics()
    assert spec.nq == 7 and spec.nv == 6  # one FREE joint, FIXED sensor
    q = jnp.asarray(spec.neutral_q())
    res = dyn.fk(spec, q)
    np.testing.assert_allclose(np.asarray(res.body_pos[1]),
                               [0.1, 0.0, -0.05], atol=1e-9)
    # free-base dynamics run (gravity acts on the airframe mass)
    x = jnp.concatenate([q, jnp.zeros(spec.nv)])
    xdot = dyn.state_rate(spec, x)
    assert bool(jnp.all(jnp.isfinite(xdot)))
    np.testing.assert_allclose(float(xdot[-4]), -9.81, atol=1e-6)  # z accel


def test_navigation_scenario_roundtrip(tmp_path):
    sc = scenarios.uav_corridor_scenario()
    for ext in (".json", ".rkb"):
        p = os.path.join(tmp_path, f"scene{ext}")
        ser.save_scene(p, sc)
        sc2 = ser.load_scene(p)
        assert isinstance(sc2, scenarios.NavigationScenario)
        assert sc2.name == sc.name
        np.testing.assert_allclose(np.asarray(sc2.start), np.asarray(sc.start))
        np.testing.assert_allclose(np.asarray(sc2.env.spheres.center),
                                   np.asarray(sc.env.spheres.center))
        assert list(sc2.robot.joint_types) == list(sc.robot.joint_types)


def test_chaser_target_scenario_roundtrip(tmp_path):
    from reak_tpu.geom.shapes import ShapeSet, Sphere
    from reak_tpu.geom.proximity import ProxyModel

    chaser = models.manip_3r3r()
    target = models.free_floating_3d()
    shapes = ShapeSet(spheres=Sphere(jnp.zeros((1, 3)), jnp.array([0.2])),
                      sphere_body=jnp.array([0]))
    sc = scenarios.ChaserTargetScenario(
        name="grapple", chaser=chaser, chaser_shapes=shapes,
        target=target, target_shapes=shapes,
        env=ProxyModel(spheres=Sphere(jnp.array([[1.0, 0, 0]]),
                                      jnp.array([0.3]))),
        start=np.zeros(6), target_state=np.zeros(13))
    p = os.path.join(tmp_path, "ct.rkb")
    ser.save_scene(p, sc)
    sc2 = ser.load_scene(p)
    assert sc2.name == "grapple"
    assert list(sc2.target.joint_types) == list(target.joint_types)
