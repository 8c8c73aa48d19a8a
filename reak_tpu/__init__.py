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
- ``reak_tpu.ctrl``        state-space systems, filters, LQR/MPC, vehicles    (ref: ctrl/ctrl_sys, ctrl/ss_systems)
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

import os as _os

import jax as _jax


def enable_full_precision() -> None:
    """Set the process-wide default matmul precision to full f32.

    The reference framework is double-precision scalar C++ throughout; its
    capabilities (filter consistency, QP duality gaps, proximity signs) assume
    true-precision contractions.  JAX's default TPU matmul precision rounds
    f32 operands to bf16 on the MXU (~3 decimal digits), which silently
    injects ~1e-3 relative error into every jnp.einsum/@ in the dynamics and
    solver paths.  The framework's hot kernels are lanes-layout VPU code
    (unaffected), so full f32 for the remaining contractions costs ~nothing
    and is required for the documented parity bars (BASELINE.md: ≤1e-4 vs
    oracle).

    Explicit opt-in (never run at import time — a library import must not
    change numerics of unrelated co-resident JAX code): call this from your
    driver, as bench.py and the examples/ CLIs do.  No-ops if the user has
    already chosen a precision, and under REAK_TPU_FAST_MATMUL=1 (bf16
    throughput experiments).
    """
    if _os.environ.get("REAK_TPU_FAST_MATMUL", "") != "1" and \
            _jax.config.jax_default_matmul_precision is None:
        _jax.config.update("jax_default_matmul_precision", "highest")
