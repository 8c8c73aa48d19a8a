"""Named scenario bundles: robot + environment + query, serialized as one
scene file.

(ref: ctrl/kte_models/navigation_model_data.hpp:65 navigation_scenario and
 chaser_target_model_data.hpp:65 chaser_target_data — the reference persists
 these aggregates through its archive system and example apps reload them;
 here they are NamedTuple pytrees registered with io.serialization, so they
 round-trip through both the typed-JSON and compact binary ``.rkb`` archives.)
"""
from __future__ import annotations

from typing import NamedTuple

import numpy as np

from reak_tpu.geom.proximity import ProxyModel
from reak_tpu.geom.shapes import ShapeSet, Sphere, Plane
from reak_tpu.kte.spec import ChainSpec
from reak_tpu.io.serialization import register_type


class NavigationScenario(NamedTuple):
    """A navigation planning bundle (ref: navigation_model_data.hpp:65 —
    robot model + environment geometry + space bounds + start/goal)."""

    name: str
    robot: ChainSpec              # e.g. models.uav_kinematics()
    robot_shapes: ShapeSet        # chain-anchored collision geometry
    env: ProxyModel               # static obstacle set
    bounds_lower: np.ndarray      # (3,) workspace position bounds
    bounds_upper: np.ndarray
    start: np.ndarray             # start configuration (robot.nq,)
    goal: np.ndarray              # goal configuration


class ChaserTargetScenario(NamedTuple):
    """Chaser robot + target model + shared environment
    (ref: chaser_target_model_data.hpp:65 chaser_target_data)."""

    name: str
    chaser: ChainSpec
    chaser_shapes: ShapeSet
    target: ChainSpec
    target_shapes: ShapeSet
    env: ProxyModel
    start: np.ndarray
    target_state: np.ndarray


register_type("reak.NavigationScenario", NavigationScenario)
register_type("reak.ChaserTargetScenario", ChaserTargetScenario)


def uav_corridor_scenario(name: str = "uav_corridor") -> NavigationScenario:
    """A ready-made UAV navigation scene: quadrotor airframe sphere flying a
    corridor with two pillar obstacles and a floor (the ref ships its
    scenarios as data files built by builder apps, build_MD148_lab.cpp-style;
    this factory is the equivalent builder)."""
    from reak_tpu.kte import models
    import jax.numpy as jnp

    robot = models.uav_kinematics()
    shapes = ShapeSet(
        spheres=Sphere(jnp.array([[0.0, 0.0, 0.0]]), jnp.array([0.25])),
        sphere_body=jnp.array([0]),
    )
    env = ProxyModel(
        spheres=Sphere(jnp.array([[3.0, 0.6, 1.0], [6.0, -0.6, 1.0]]),
                       jnp.array([0.9, 0.9])),
        planes=Plane(jnp.array([[0.0, 0.0, 1.0]]), jnp.array([0.0])),
    )
    start = np.asarray(robot.neutral_q(), np.float64)
    start[0:3] = [0.0, 0.0, 1.0]
    goal = np.asarray(robot.neutral_q(), np.float64)
    goal[0:3] = [9.0, 0.0, 1.0]
    return NavigationScenario(
        name=name, robot=robot, robot_shapes=shapes, env=env,
        bounds_lower=np.array([-1.0, -3.0, 0.2]),
        bounds_upper=np.array([10.0, 3.0, 3.0]),
        start=start, goal=goal,
    )
