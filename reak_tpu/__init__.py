"""reak_tpu — a TPU-native multibody dynamics / control / estimation / planning framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ReaK platform
(multibody KTE dynamics, state estimation, optimal control / MPC, and probabilistic
path planning).  Everything is built around pure functions over explicit pytree
state, batched with ``vmap``, scaled over device meshes with ``shard_map``/``pjit``,
and with Pallas kernels on the hot paths.

Layer map (mirrors the capability layers of the reference, SURVEY.md §1):

- ``reak_tpu.math``        rotations / quaternions / frames / dense numerics  (ref: core/lin_alg, core/kinetostatics)
- ``reak_tpu.kte``         chain-spec multibody dynamics                      (ref: ctrl/mbd_kte, ctrl/kte_models)
- ``reak_tpu.integrators`` ODE steppers as scans                              (ref: core/integrators)
- ``reak_tpu.ctrl``        state-space systems, filters, LQR/MPC              (ref: ctrl/ctrl_sys)
- ``reak_tpu.models``      concrete vehicle models                            (ref: ctrl/ss_systems)
- ``reak_tpu.spaces``      metric spaces / topologies                         (ref: ctrl/topologies)
- ``reak_tpu.interp``      interpolators & trajectories                       (ref: ctrl/interpolation)
- ``reak_tpu.planning``    sampling-based planners w/ batched device eval     (ref: ctrl/graph_alg, ctrl/path_planning)
- ``reak_tpu.geom``        shapes & batched proximity kernels                 (ref: geometry/*)
- ``reak_tpu.opt``         optimizers (line search, QP, NLLSQ, NLP)           (ref: core/optimization, core/root_finders)
- ``reak_tpu.io``          recorders, serialization, config                   (ref: core/recorders, core/serialization)
- ``reak_tpu.ops``         Pallas TPU kernels for hot paths
- ``reak_tpu.parallel``    device mesh / collectives helpers
- ``reak_tpu.errors``      failure detection: status flags + host exceptions  (ref: exception surface, SURVEY §5.3)
"""

__version__ = "0.1.0"
